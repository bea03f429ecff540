"""Signal-space diffusion training (pure DM, no autoencoder).

Parity target: reference ``src/train_pure_ldm.py:89-167`` +
``src/training/training_diffusion.py:18-231``: the same UNet family runs
directly on (B, 3072, 1) windows; optional Jukebox spectral loss between
predicted and true noise with weight 1e-6
(train_pure_ldm.py:158, training_diffusion.py:148-152).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sleepgen.config import Config
from sleepgen.data.dataset import WindowDataset
from sleepgen.train.evals import masked_epoch_mean
from sleepgen.losses import jukebox_loss
from sleepgen.parallel import (make_mesh, prefetch_to_device,
                               replicate, shard_batch)
from sleepgen.train.train_ldm import (
    DiffusionState,
    DiffusionTrainResult,
    build_unet,
    make_schedule,
)
from sleepgen.utils import CheckpointManager, MetricsLogger, jit_init, setup_run_dir

DM_SPECTRAL_WEIGHT = 1e-6  # train_pure_ldm.py:158


def make_dm_eval_step(unet, sched, conditional: bool = False):
    """Validation loss (eval_diffusion parity, training_diffusion.py:166-231).

    ``conditional``: batch is ``(x, y)`` and y feeds the UNet's label
    embedding (beyond-parity class-conditional path, config.unet.num_classes).
    """

    @jax.jit
    def eval_step(params, batch, rng):
        x, y = batch if conditional else (batch, None)
        k_t, k_noise = jax.random.split(rng)
        x = x.astype(jnp.float32)
        t = jax.random.randint(k_t, (x.shape[0],), 0, sched.num_timesteps)
        noise = jax.random.normal(k_noise, x.shape, jnp.float32)
        noisy = sched.add_noise(x, noise, t)
        target = sched.velocity(x, noise, t) if sched.prediction_type == "v_prediction" else noise
        pred = unet.apply({"params": params}, noisy, t, y).astype(jnp.float32)
        # per-sample MSE so padded loader rows can be trimmed host-side
        return jnp.mean((pred - target) ** 2, axis=tuple(range(1, x.ndim)))

    return eval_step


def make_dm_train_step(unet, sched, opt, spectral: bool,
                       conditional: bool = False,
                       cond_dropout_prob: float = 0.0):
    def train_step(state: DiffusionState, batch, rng: jax.Array):
        x, y = batch if conditional else (batch, None)
        step_rng = jax.random.fold_in(rng, state.step)
        k_t, k_noise, k_drop = jax.random.split(step_rng, 3)
        if conditional and cond_dropout_prob > 0:
            # CFG label dropout: the null label (-1) zeroes the embedding
            # contribution inside the UNet, training the unconditional
            # score with the same parameters
            drop = jax.random.bernoulli(k_drop, cond_dropout_prob, y.shape)
            y = jnp.where(drop, -1, y)
        x = x.astype(jnp.float32)
        t = jax.random.randint(k_t, (x.shape[0],), 0, sched.num_timesteps)
        noise = jax.random.normal(k_noise, x.shape, jnp.float32)
        noisy = sched.add_noise(x, noise, t)
        target = sched.velocity(x, noise, t) if sched.prediction_type == "v_prediction" else noise

        def loss_fn(params):
            pred = unet.apply({"params": params}, noisy, t, y).astype(jnp.float32)
            mse = jnp.mean((pred - target) ** 2)
            # spectral term on pred vs TARGET: identical to the reference's
            # pred-vs-noise (training_diffusion.py:148-152) for its
            # epsilon parameterization, and the only consistent choice for
            # v_prediction (pred-vs-noise would pull the velocity output
            # toward eps, a different optimum than the MSE term's)
            spec = jukebox_loss(pred, target, axis=-2, reduction="sum")
            loss = mse + (DM_SPECTRAL_WEIGHT * spec if spectral else 0.0)
            return loss, {"mse": mse, "spec_loss": spec}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = opt.update(grads, state.opt, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params, opt=new_opt)
        return new_state, {"loss": loss, **aux}

    return jax.jit(train_step, donate_argnums=(0,))


def train_dm(
    cfg: Config,
    train_ds: WindowDataset,
    valid_ds: WindowDataset,
    run_name: Optional[str] = None,
    mesh=None,
) -> DiffusionTrainResult:
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    mesh = mesh or make_mesh()
    run_name = run_name or (
        f"dm_eeg_{'spectral' if cfg.spectral else 'no-spectral'}_{cfg.dataset}")
    run_dir, resume = setup_run_dir(cfg.train.output_dir, run_name)
    cfg.to_yaml(run_dir / "config.yaml")
    logger_t = MetricsLogger(run_dir, "train")
    logger_v = MetricsLogger(run_dir, "val")
    ckpt = CheckpointManager(run_dir)

    rng = jax.random.PRNGKey(cfg.train.seed)
    sched = make_schedule(cfg)
    unet = build_unet(cfg, 1, 1, dtype)
    if cfg.fast_train_math and dtype == jnp.bfloat16:
        # see config.fast_train_math (+17% LDM step on v5e, same param tree)
        unet = unet.clone(fast_math=True)

    conditional = cfg.unet.num_classes > 0
    window = train_ds.padded_window
    params = jit_init(unet, rng, jnp.zeros((2, window, 1), jnp.float32),
                      jnp.zeros((2,), jnp.int32),
                      jnp.zeros((2,), jnp.int32) if conditional else None,
                      )["params"]
    opt = optax.adam(cfg.train.base_lr)
    state = DiffusionState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt=opt.init(params),
        best_loss=jnp.asarray(jnp.inf, jnp.float32),
        scale_factor=jnp.asarray(1.0, jnp.float32),
    )
    if resume:
        restored = ckpt.restore_latest(jax.device_get(state))
        if restored is not None:
            state = restored
    state = replicate(mesh, state)

    train_step = make_dm_train_step(unet, sched, opt, cfg.spectral,
                                    conditional=conditional,
                                    cond_dropout_prob=cfg.train.cond_dropout_prob)
    eval_step = make_dm_eval_step(unet, sched, conditional=conditional)

    from sleepgen.data.transforms import to_bcl
    from sleepgen.sample.samplers import ddpm_sample_loop

    @jax.jit  # hoisted out of the epoch loop: one compile for the whole run
    def _draw(params, key):
        # conditional: one in-training sample per class; unconditional: one
        n = cfg.unet.num_classes if conditional else 1
        y = jnp.arange(n, dtype=jnp.int32) if conditional else None
        x_T = jax.random.normal(key, (n, window, 1))
        return ddpm_sample_loop(
            lambda x, t: unet.apply({"params": params}, x, t, y),
            sched, x_T, key, clip_sample=True)

    np_rng = np.random.default_rng(cfg.train.seed)
    n_dev = mesh.devices.size
    best_loss = float(jax.device_get(state.best_loss))
    stopped_on_nan = False
    steps_per_epoch = max(1, (len(train_ds) + cfg.train.batch_size - 1)
                          // cfg.train.batch_size)
    start_epoch = int(jax.device_get(state.step)) // steps_per_epoch
    last_epoch = start_epoch

    for epoch in range(start_epoch, cfg.train.n_epochs):
        last_epoch = epoch
        epoch_losses = []
        for dev_batch in prefetch_to_device(
            train_ds.epoch_batches(cfg.train.batch_size, np_rng,
                                   pad_multiple=n_dev),
            mesh, dtype=dtype,
        ):
            state, metrics = train_step(state, dev_batch, rng)
            epoch_losses.append(metrics["loss"])
        mean_loss = float(np.mean([jax.device_get(l) for l in epoch_losses]))
        logger_t.log(epoch, {"loss": mean_loss})
        if not np.isfinite(mean_loss):
            stopped_on_nan = True
            break

        if (epoch + 1) % cfg.train.val_interval == 0:
            if (epoch + 1) % (cfg.train.val_interval * 2) == 0:
                # in-training signal-space sample (util.py:261-285)
                samp = _draw(state.params, jax.random.fold_in(rng, epoch))
                tag = "conditional" if conditional else "unconditioned"
                np.save(run_dir / f"sample_{tag}_{epoch}.npy",
                        to_bcl(np.asarray(jax.device_get(samp))))

            eval_rng = jax.random.fold_in(rng, epoch)

            def _losses(bi, batch):
                if conditional:
                    dev_batch = (shard_batch(mesh, jnp.asarray(batch[0], dtype)),
                                 shard_batch(mesh, jnp.asarray(batch[1])))
                else:
                    dev_batch = shard_batch(mesh, jnp.asarray(batch, dtype))
                return eval_step(state.params, dev_batch,
                                 jax.random.fold_in(eval_rng, bi))

            val_loss = masked_epoch_mean(
                len(valid_ds),
                valid_ds.epoch_batches(cfg.train.batch_size, np_rng,
                                       shuffle=True, pad_multiple=n_dev),
                _losses, batch_size=cfg.train.batch_size)
            logger_v.log(epoch, {"loss": val_loss})
            # update best_loss in the state BEFORE the periodic save so a
            # resume can't restore a stale best and overwrite the true
            # best_model checkpoint with a worse one
            improved = val_loss <= best_loss
            if improved:
                best_loss = val_loss
                state = state.replace(
                    best_loss=jnp.asarray(best_loss, jnp.float32))
            host_state = jax.device_get(state)
            ckpt.save(int(host_state.step), host_state)
            if improved:
                ckpt.save_best({"params": host_state.params})

    host_state = jax.device_get(state)
    if stopped_on_nan:
        # final_model must never carry non-finite params ("last model
        # before the loss exploded", README.md:18)
        host_state = ckpt.restore_latest(host_state)
    else:
        ckpt.save(int(host_state.step), host_state)
    if host_state is not None:
        ckpt.save_best({"params": host_state.params}, name="final_model")
    ckpt.close()
    logger_t.close()
    logger_v.close()
    return DiffusionTrainResult(str(run_dir), best_loss, last_epoch, 1.0, stopped_on_nan)
