"""Stage-2 latent diffusion training.

Parity target: reference ``src/train_ldm.py:107-238`` +
``src/training/training.py:317-513``:
  * frozen stage-1 encode (+ reparam sample) per batch
    (Stage1Wrapper, training.py:15-26)
  * ``scale_factor = 1/std(z)`` from the first train batch
    (train_ldm.py:203-204)
  * t ~ U[0, 1000); z_t = add_noise(z*sf, eps, t); MSE(model(z_t, t), eps)
    (training.py:420-437; epsilon parameterization — the DDPMScheduler
    default; velocity targets supported via cfg.diffusion.prediction_type)
  * Adam 1e-4 (train_ldm.py:208), eval-first then eval every eval_freq.

TPU re-design (SURVEY.md §3.2): encoder forward + noising + UNet fwd/bwd
fused into one jitted step; frozen encoder runs under stop_gradient in the
same XLA program so the latents never round-trip to HBM-host.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from sleepgen.config import Config
from sleepgen.data.dataset import WindowDataset
from sleepgen.train.evals import masked_epoch_mean
from sleepgen.diffusion import NoiseSchedule
from sleepgen.nn import AutoencoderKL, UNet1d
from sleepgen.parallel import (make_mesh, prefetch_to_device,
                               replicate, shard_batch)
from sleepgen.utils import CheckpointManager, MetricsLogger, jit_init, setup_run_dir


@struct.dataclass
class DiffusionState:
    step: jnp.ndarray
    params: Any
    opt: Any
    best_loss: jnp.ndarray
    scale_factor: jnp.ndarray
    # EMA of params when cfg.diffusion.ema_decay > 0 (sampling-quality
    # improvement beyond the reference, which keeps raw params only)
    ema_params: Any = None


def build_unet(cfg: Config, in_channels: int, out_channels: int, dtype) -> UNet1d:
    u = cfg.unet
    return UNet1d(
        in_channels=in_channels,
        out_channels=out_channels,
        model_channels=u.model_channels,
        channel_mult=tuple(u.channel_mult),
        num_res_blocks=u.num_res_blocks,
        attention_resolutions=tuple(u.attention_resolutions),
        num_heads=u.num_heads,
        use_scale_shift_norm=u.use_scale_shift_norm,
        resblock_updown=u.resblock_updown,
        conv_resample=u.conv_resample,
        num_groups=u.norm_num_groups,
        dropout=u.dropout,
        dtype=dtype,
        use_pallas_norm=cfg.use_pallas_norm,
        kv_block_size=u.kv_block_size,
        num_classes=u.num_classes,
    )


def init_unet_template(cfg: Config, unet: UNet1d, sample_shape,
                       with_scale_factor: bool = False) -> dict:
    """Host-side checkpoint-restore template for a UNet run dir.

    Initializes the UNet with the conditional-aware argument tuple (a
    trailing (B,) int32 label batch when ``cfg.unet.num_classes>0``) so the
    template's param tree matches conditional checkpoints. Shared by every
    restore surface (sample/impute/serve/warm-cache CLIs) so a conditioning
    change lands in exactly one place."""
    rng = jax.random.PRNGKey(0)
    init_args = (rng, jnp.zeros((2, *sample_shape), jnp.float32),
                 jnp.zeros((2,), jnp.int32))
    if cfg.unet.num_classes > 0:
        init_args += (jnp.zeros((2,), jnp.int32),)
    tpl = {"params": jax.device_get(jit_init(unet, *init_args)["params"])}
    if with_scale_factor:
        tpl["scale_factor"] = np.zeros((), np.float32)
    return tpl


def restore_unet_run(cfg: Config, run_dir, in_channels: int,
                     out_channels: int, dtype=jnp.float32,
                     sample_shape=None, with_scale_factor: bool = False,
                     name: str = "best_model"):
    """Load a trained diffusion run dir -> (unet_module, checkpoint dict).

    The one canonical stage-2 restore recipe (conditional-aware template
    via init_unet_template), shared by the sample/impute CLIs,
    SamplerService, and demo drivers. ``sample_shape`` defaults to the
    latent operating point (cfg.unet.image_size, in_channels); DM-space
    callers pass their signal shape. LDM checkpoints carry scale_factor
    (with_scale_factor=True); DM final models don't (name='final_model')."""
    from sleepgen.utils import CheckpointManager

    unet = build_unet(cfg, in_channels, out_channels, dtype)
    tpl = init_unet_template(
        cfg, unet, sample_shape or (cfg.unet.image_size, in_channels),
        with_scale_factor=with_scale_factor)
    ckpt = CheckpointManager(run_dir)
    best = ckpt.restore_best(tpl, name=name)
    ckpt.close()
    return unet, best


def make_schedule(cfg: Config) -> NoiseSchedule:
    d = cfg.diffusion
    return NoiseSchedule.create(
        d.beta_schedule, d.timesteps, d.linear_start, d.linear_end,
        prediction_type=d.prediction_type,
    )


def compute_scale_factor(ae: AutoencoderKL, params_g, batch: jnp.ndarray,
                         rng: jax.Array) -> jnp.ndarray:
    """1 / std(encode_stage_2_inputs(first_batch)) — train_ldm.py:203-204."""
    z = ae.apply({"params": params_g}, batch, rng,
                 method=AutoencoderKL.encode_stage_2_inputs)
    return (1.0 / jnp.std(z.astype(jnp.float32))).astype(jnp.float32)


def make_ldm_train_step(unet: UNet1d, ae: AutoencoderKL, params_g,
                        sched: NoiseSchedule, opt, ema_decay: float = 0.0,
                        conditional: bool = False,
                        cond_dropout_prob: float = 0.0):
    """``conditional``: batch is ``(x, y)`` and y feeds the UNet label
    embedding; ``cond_dropout_prob`` routes labels to the CFG null branch
    (y = -1, zeroed embedding) so one network learns both scores."""

    def train_step(state: DiffusionState, batch, rng: jax.Array):
        x, y = batch if conditional else (batch, None)
        step_rng = jax.random.fold_in(rng, state.step)
        k_enc, k_t, k_noise, k_drop = jax.random.split(step_rng, 4)
        if conditional and cond_dropout_prob > 0:
            drop = jax.random.bernoulli(k_drop, cond_dropout_prob, y.shape)
            y = jnp.where(drop, -1, y)

        z = ae.apply({"params": params_g}, x, k_enc,
                     method=AutoencoderKL.encode_stage_2_inputs)
        z = jax.lax.stop_gradient(z.astype(jnp.float32)) * state.scale_factor

        t = jax.random.randint(k_t, (x.shape[0],), 0, sched.num_timesteps)
        noise = jax.random.normal(k_noise, z.shape, jnp.float32)
        noisy = sched.add_noise(z, noise, t)
        if sched.prediction_type == "v_prediction":
            target = sched.velocity(z, noise, t)
        else:
            target = noise

        def loss_fn(params):
            pred = unet.apply({"params": params}, noisy, t, y)
            return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = opt.update(grads, state.opt, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params, opt=new_opt)
        if ema_decay > 0.0 and state.ema_params is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema_params, new_params)
            new_state = new_state.replace(ema_params=new_ema)
        return new_state, {"loss": loss}

    return jax.jit(train_step, donate_argnums=(0,))


def make_ldm_eval_step(unet: UNet1d, ae: AutoencoderKL, params_g,
                       sched: NoiseSchedule, conditional: bool = False):
    @jax.jit
    def eval_step(params, scale_factor, batch, rng):
        x, y = batch if conditional else (batch, None)
        k_enc, k_t, k_noise = jax.random.split(rng, 3)
        z = ae.apply({"params": params_g}, x, k_enc,
                     method=AutoencoderKL.encode_stage_2_inputs)
        z = z.astype(jnp.float32) * scale_factor
        t = jax.random.randint(k_t, (x.shape[0],), 0, sched.num_timesteps)
        noise = jax.random.normal(k_noise, z.shape, jnp.float32)
        noisy = sched.add_noise(z, noise, t)
        target = sched.velocity(z, noise, t) if sched.prediction_type == "v_prediction" else noise
        pred = unet.apply({"params": params}, noisy, t, y)
        # per-sample MSE so padded loader rows can be trimmed host-side
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2,
                        axis=tuple(range(1, noisy.ndim)))

    return eval_step


@dataclass
class DiffusionTrainResult:
    run_dir: str
    best_loss: float
    last_epoch: int
    scale_factor: float
    stopped_on_nan: bool = False


def train_ldm(
    cfg: Config,
    train_ds: WindowDataset,
    valid_ds: WindowDataset,
    stage1_params,
    aekl_cfg: Optional[Config] = None,
    run_name: Optional[str] = None,
    mesh=None,
) -> DiffusionTrainResult:
    from sleepgen.train.train_aekl import build_models

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    mesh = mesh or make_mesh()
    aekl_cfg = aekl_cfg or cfg
    ae, _ = build_models(aekl_cfg, dtype)
    latent_channels = aekl_cfg.aekl.latent_channels

    run_name = run_name or (
        f"ldm_eeg_{'spectral' if cfg.spectral else 'no-spectral'}_{cfg.dataset}")
    run_dir, resume = setup_run_dir(cfg.train.output_dir, run_name)
    cfg.to_yaml(run_dir / "config.yaml")
    logger_t = MetricsLogger(run_dir, "train")
    logger_v = MetricsLogger(run_dir, "val")
    ckpt = CheckpointManager(run_dir)

    rng = jax.random.PRNGKey(cfg.train.seed)
    sched = make_schedule(cfg)
    unet = build_unet(cfg, latent_channels, latent_channels, dtype)
    if cfg.fast_train_math and dtype == jnp.bfloat16:
        # +17% step throughput on v5e (benches/ablate_train.py); same param
        # tree, fp32 masters/stats — see config.fast_train_math
        unet = unet.clone(fast_math=True)

    conditional = cfg.unet.num_classes > 0
    np_rng = np.random.default_rng(cfg.train.seed)
    n_dev = mesh.devices.size
    first_batch = next(train_ds.epoch_batches(
        cfg.train.batch_size, np_rng, pad_multiple=n_dev))
    if conditional:
        first_batch = first_batch[0]  # labeled loader yields (x, y)
    first_batch = shard_batch(mesh, jnp.asarray(first_batch, dtype))

    stage1_params = replicate(mesh, stage1_params)
    scale_factor = compute_scale_factor(ae, stage1_params, first_batch, rng)

    latent_len = first_batch.shape[1] // 2 ** (len(aekl_cfg.aekl.num_channels) - 1)
    z0 = jnp.zeros((2, latent_len, latent_channels), jnp.float32)
    params = jit_init(unet, rng, z0, jnp.zeros((2,), jnp.int32),
                      jnp.zeros((2,), jnp.int32) if conditional else None,
                      )["params"]
    opt = optax.adam(cfg.train.base_lr)
    ema_decay = cfg.diffusion.ema_decay
    state = DiffusionState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt=opt.init(params),
        best_loss=jnp.asarray(jnp.inf, jnp.float32),
        scale_factor=scale_factor,
        # distinct buffers: params and ema_params live in one donated
        # pytree, so aliased arrays would be donated twice
        ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                    if ema_decay > 0.0 else None),
    )
    if resume:
        restored = ckpt.restore_latest(jax.device_get(state))
        if restored is not None:
            state = restored
    state = replicate(mesh, state)

    train_step = make_ldm_train_step(
        unet, ae, stage1_params, sched, opt, ema_decay=ema_decay,
        conditional=conditional,
        cond_dropout_prob=cfg.train.cond_dropout_prob)
    eval_step = make_ldm_eval_step(unet, ae, stage1_params, sched,
                                   conditional=conditional)

    best_loss = float(jax.device_get(state.best_loss))
    stopped_on_nan = False
    # resume from the restored step (the reference's LDM resume left
    # start_epoch/best_loss unloaded — train_ldm.py:210-211 — fixed here)
    steps_per_epoch = max(1, (len(train_ds) + cfg.train.batch_size - 1)
                          // cfg.train.batch_size)
    start_epoch = int(jax.device_get(state.step)) // steps_per_epoch
    last_epoch = start_epoch

    def run_eval(epoch, sample=False):
        # fresh timestep/noise draws per epoch and per batch (a single rng
        # here would make every val batch a fixed projection)
        eval_rng = jax.random.fold_in(rng, epoch)

        def _losses(bi, batch):
            if conditional:
                dev_batch = (shard_batch(mesh, jnp.asarray(batch[0], dtype)),
                             shard_batch(mesh, jnp.asarray(batch[1])))
            else:
                dev_batch = shard_batch(mesh, jnp.asarray(batch, dtype))
            return eval_step(state.params, state.scale_factor, dev_batch,
                             jax.random.fold_in(eval_rng, bi))

        val = masked_epoch_mean(
            len(valid_ds),
            valid_ds.epoch_batches(cfg.train.batch_size, np_rng,
                                   shuffle=True, pad_multiple=n_dev),
            _losses, batch_size=cfg.train.batch_size)
        logger_v.log(epoch, {"loss": val})
        if sample:
            # in-training unconditioned sample, decoded with and without the
            # scale factor (reference util.py:226-258)
            _log_sample(epoch)
        return val

    from sleepgen.data.transforms import to_bcl
    from sleepgen.sample.samplers import ddpm_sample_loop

    @jax.jit  # hoisted out of the epoch loop: one compile for the whole
    # run (defining this inside _log_sample made a fresh jit wrapper per
    # sampling epoch — the full 1000-step scan + both decodes recompiled
    # every val_interval*2 epochs, minutes apiece on TPU)
    def _draw(params, sf, key):
        # conditional: one in-training sample per class; else one
        n = cfg.unet.num_classes if conditional else 1
        y = jnp.arange(n, dtype=jnp.int32) if conditional else None
        z_T = jax.random.normal(key, (n, latent_len, latent_channels))

        def model_fn(x, t):
            return unet.apply({"params": params}, x, t, y)

        z = ddpm_sample_loop(model_fn, sched, z_T, key, clip_sample=False)
        x_scaled = ae.apply({"params": stage1_params}, z / sf,
                            method=AutoencoderKL.decode)
        x_raw = ae.apply({"params": stage1_params}, z,
                         method=AutoencoderKL.decode)
        return x_scaled, x_raw

    def _log_sample(epoch):
        x_scaled, x_raw = _draw(state.params, state.scale_factor,
                                jax.random.fold_in(rng, epoch))
        x_scaled = to_bcl(np.asarray(jax.device_get(x_scaled), np.float32))
        x_raw = to_bcl(np.asarray(jax.device_get(x_raw), np.float32))
        tag = "conditional" if conditional else "unconditioned"
        np.save(run_dir / f"sample_{tag}_{epoch}.npy", x_scaled)
        np.save(run_dir / f"sample_noscale_{tag}_{epoch}.npy", x_raw)
        # figure artifacts like the reference's in-training sampler
        # (util.py:226-258: waveform figure + PSD comparison of the decode
        # with vs without the scale factor); never fatal to training
        try:
            from sleepgen.eval.reports import (save_sample_figure,
                                               save_spectral_figure)

            save_sample_figure(run_dir, epoch, x_scaled)
            save_spectral_figure(run_dir, epoch, x_scaled, x_raw,
                                 name="SAMPLE_VS_NOSCALE")
        except Exception as e:  # pragma: no cover - defensive
            print(f"sample figure logging failed at epoch {epoch}: {e}",
                  flush=True)

    run_eval(start_epoch)  # eval-first (training.py:337-348)

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
            # sampling every 2x eval_freq (training.py:373)
            val_loss = run_eval(
                epoch, sample=(epoch + 1) % (cfg.train.val_interval * 2) == 0)
            # update best_loss BEFORE the periodic save: saving first left
            # the checkpoint one improvement behind, so a crash-resume
            # could overwrite the true best_model with a worse one
            improved = val_loss <= best_loss
            if improved:
                best_loss = val_loss
                state = state.replace(best_loss=jnp.asarray(best_loss))
            host_state = jax.device_get(state)
            ckpt.save(int(host_state.step), host_state)
            if improved:
                best_params = (host_state.ema_params if ema_decay > 0.0
                               else host_state.params)
                ckpt.save_best(
                    {"params": best_params,
                     "scale_factor": host_state.scale_factor})

    host_state = jax.device_get(state)
    if stopped_on_nan:
        # final_model must never carry non-finite params ("last model
        # before the loss exploded", README.md:18) — fall back to the
        # latest finite periodic checkpoint, or skip if none exists.
        host_state = ckpt.restore_latest(host_state)
    else:
        ckpt.save(int(host_state.step), host_state)
    if host_state is not None:
        final_params = (host_state.ema_params if ema_decay > 0.0
                        else host_state.params)
        ckpt.save_best(
            {"params": final_params, "scale_factor": host_state.scale_factor},
            name="final_model")
    ckpt.close()
    logger_t.close()
    logger_v.close()
    return DiffusionTrainResult(
        str(run_dir), best_loss, last_epoch,
        float(jax.device_get(state.scale_factor)), stopped_on_nan)
