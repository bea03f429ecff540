"""Stage-1 AutoencoderKL training — jitted alternating G/D step.

Parity target: the inlined loop of reference
``src/train_autoencoderkl.py:190-334``:
  G: L1(recon, x) + kl_weight*KL + adv_weight*LSGAN(D(recon)->real)
     [+ spectral_weight*Jukebox when --spe spectral]   (:206-218)
  D: adv_weight * 0.5*(LSGAN(D(recon.detach())->fake)
                       + LSGAN(D(x)->real))            (:222-234)
  Adam(G 5e-3) / Adam(D 5e-4)                          (:149-152)

TPU re-design (SURVEY.md §3.1): both optimizer updates happen inside ONE
jitted ``train_step`` — the generator forward is shared with the
discriminator update (the reference re-runs D on detached recon; we
stop_gradient the same activations). The batch is sharded over the data
axis of the mesh; parameters are replicated and XLA inserts the ICI
all-reduce for gradients. The fragile spectral loss (README.md:18) is
computed in fp32 and a NaN guard stops training at the last finite
checkpoint automatically.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from sleepgen.config import Config
from sleepgen.data.dataset import WindowDataset
from sleepgen.train.evals import masked_epoch_mean
from sleepgen.losses import (
    discriminator_adv_loss,
    generator_adv_loss,
    jukebox_loss,
    kl_gaussian,
)
from sleepgen.nn import AutoencoderKL, PatchDiscriminator
from sleepgen.parallel import (make_mesh, prefetch_to_device,
                               replicate, shard_batch)
from sleepgen.utils import CheckpointManager, MetricsLogger, jit_init, setup_run_dir


@struct.dataclass
class AEKLState:
    step: jnp.ndarray
    params_g: Any
    opt_g: Any
    params_d: Any
    batch_stats_d: Any
    opt_d: Any
    best_loss: jnp.ndarray


def build_models(cfg: Config, dtype=jnp.float32) -> Tuple[AutoencoderKL, PatchDiscriminator]:
    ae = AutoencoderKL(
        num_channels=tuple(cfg.aekl.num_channels),
        latent_channels=cfg.aekl.latent_channels,
        in_channels=cfg.aekl.in_channels,
        out_channels=cfg.aekl.out_channels,
        num_res_blocks=cfg.aekl.num_res_blocks,
        norm_num_groups=cfg.aekl.norm_num_groups,
        attention_levels=tuple(cfg.aekl.attention_levels),
        with_encoder_nonlocal_attn=cfg.aekl.with_encoder_nonlocal_attn,
        with_decoder_nonlocal_attn=cfg.aekl.with_decoder_nonlocal_attn,
        dtype=dtype,
        use_pallas_norm=cfg.use_pallas_norm,
    )
    disc = PatchDiscriminator(
        num_layers_d=cfg.discriminator.num_layers_d,
        num_channels=cfg.discriminator.num_channels,
        in_channels=cfg.discriminator.in_channels,
        out_channels=cfg.discriminator.out_channels,
        kernel_size=cfg.discriminator.kernel_size,
        dtype=dtype,
    )
    return ae, disc


def restore_aekl_run(run_dir, dtype=jnp.float32, cfg: Optional[Config] = None):
    """Load a trained AEKL run dir -> (cfg, ae_module, ae_params).

    The one canonical stage-1 restore recipe, shared by every consumer
    (sample/impute CLIs, SamplerService, demo drivers) so the checkpoint
    layout lives in exactly one place. Pass ``cfg`` to apply overrides
    (e.g. a --latent_channels flag) before the template is built; by
    default the run dir's own config.yaml is used."""
    from pathlib import Path

    from sleepgen.utils import CheckpointManager

    cfg = cfg or Config.from_yaml(Path(run_dir) / "config.yaml")
    state0, *_ = init_state(cfg, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(run_dir)
    params = ckpt.restore_best(jax.device_get(state0.params_g))
    ckpt.close()
    ae, _ = build_models(cfg, dtype)
    return cfg, ae, params


def init_state(cfg: Config, rng: jax.Array, window: int = 3072,
               dtype=jnp.float32) -> Tuple[AEKLState, Any, Any, Any, Any]:
    ae, disc = build_models(cfg, dtype)
    x = jnp.zeros((2, window, cfg.aekl.in_channels), dtype)
    rng, k1, k2, k3 = jax.random.split(rng, 4)
    vars_g = jit_init(ae, {"params": k1}, x, k2)
    vars_d = jit_init(disc, {"params": k3}, x, train=True)
    opt_g = optax.adam(cfg.losses.optimizer_g_lr)
    opt_d = optax.adam(cfg.losses.optimizer_d_lr)
    state = AEKLState(
        step=jnp.zeros((), jnp.int32),
        params_g=vars_g["params"],
        opt_g=opt_g.init(vars_g["params"]),
        params_d=vars_d["params"],
        batch_stats_d=vars_d.get("batch_stats", FrozenDict()),
        opt_d=opt_d.init(vars_d["params"]),
        best_loss=jnp.asarray(jnp.inf, jnp.float32),
    )
    return state, ae, disc, opt_g, opt_d


def make_train_step(ae: AutoencoderKL, disc: PatchDiscriminator,
                    opt_g, opt_d, cfg: Config):
    adv_w = cfg.losses.adv_weight
    kl_w = cfg.losses.kl_weight
    spec_w = cfg.losses.spectral_weight
    spectral = cfg.spectral

    def train_step(state: AEKLState, batch: jnp.ndarray, rng: jax.Array):
        rng_sample = jax.random.fold_in(rng, state.step)

        def g_loss_fn(params_g):
            recon, z_mu, z_sigma = ae.apply({"params": params_g}, batch, rng_sample)
            x32 = batch.astype(jnp.float32)
            r32 = recon.astype(jnp.float32)
            l1 = jnp.mean(jnp.abs(r32 - x32))
            spec = jukebox_loss(r32, x32, axis=-2, reduction="sum")
            kl = kl_gaussian(z_mu, z_sigma)
            logits_fake = disc.apply(
                {"params": state.params_d, "batch_stats": state.batch_stats_d},
                recon, train=True, mutable=["batch_stats"],
            )[0][-1]
            g_adv = generator_adv_loss(logits_fake)
            loss = l1 + kl_w * kl + adv_w * g_adv
            if spectral:
                loss = loss + spec_w * spec
            aux = {"recons_loss": l1, "kl_loss": kl, "gen_loss": g_adv,
                   "spec_loss": spec, "recon": recon}
            return loss, aux

        (g_loss, aux), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g)
        updates_g, new_opt_g = opt_g.update(grads_g, state.opt_g, state.params_g)
        new_params_g = optax.apply_updates(state.params_g, updates_g)

        recon = jax.lax.stop_gradient(aux.pop("recon"))

        def d_loss_fn(params_d):
            out_f, mut = disc.apply(
                {"params": params_d, "batch_stats": state.batch_stats_d},
                recon, train=True, mutable=["batch_stats"],
            )
            out_r, mut = disc.apply(
                {"params": params_d, "batch_stats": mut["batch_stats"]},
                batch, train=True, mutable=["batch_stats"],
            )
            d_adv = discriminator_adv_loss(out_f[-1], out_r[-1])
            return adv_w * d_adv, (d_adv, mut["batch_stats"])

        (d_loss, (d_adv, new_bs)), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.params_d)
        updates_d, new_opt_d = opt_d.update(grads_d, state.opt_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, updates_d)

        new_state = state.replace(
            step=state.step + 1,
            params_g=new_params_g, opt_g=new_opt_g,
            params_d=new_params_d, batch_stats_d=new_bs, opt_d=new_opt_d,
        )
        metrics = {"g_loss": g_loss, "disc_loss": d_adv, **aux}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(ae: AutoencoderKL):
    @jax.jit
    def eval_step(params_g, batch):
        recon = ae.apply({"params": params_g}, batch, method=AutoencoderKL.reconstruct)
        # per-sample L1 so padded loader rows can be trimmed host-side
        l1 = jnp.mean(jnp.abs(recon.astype(jnp.float32) - batch.astype(jnp.float32)),
                      axis=tuple(range(1, batch.ndim)))
        return l1, recon

    return eval_step


def _log_val_figures(run_dir, epoch: int, pair: dict) -> None:
    """Waveform + PSD-overlay figure artifacts for one val batch
    (reference cadence: every val interval, train_autoencoderkl.py:262-283).
    Figure writing must never kill a training run — failures are logged."""
    if not pair:
        return
    try:
        from sleepgen.data.transforms import to_bcl
        from sleepgen.eval.reports import (save_reconstruction_figure,
                                           save_spectral_figure)

        orig = to_bcl(pair["orig"][:1])
        recon = to_bcl(pair["recon"][:1])
        save_reconstruction_figure(run_dir, epoch, orig, recon)
        save_spectral_figure(run_dir, epoch, orig, recon)
    except Exception as e:  # pragma: no cover - defensive
        print(f"figure logging failed at epoch {epoch}: {e}", flush=True)


@dataclass
class AEKLTrainResult:
    run_dir: str
    best_loss: float
    last_epoch: int
    stopped_on_nan: bool = False


def train_aekl(
    cfg: Config,
    train_ds: WindowDataset,
    valid_ds: WindowDataset,
    run_name: Optional[str] = None,
    mesh=None,
) -> AEKLTrainResult:
    """Full training driver (reference main(), train_autoencoderkl.py:106-347)."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    mesh = mesh or make_mesh()
    run_name = run_name or (
        f"aekl_eeg_{'spectral' if cfg.spectral else 'no-spectral'}_{cfg.dataset}")
    run_dir, resume = setup_run_dir(cfg.train.output_dir, run_name)
    cfg.to_yaml(run_dir / "config.yaml")
    logger_t = MetricsLogger(run_dir, "train")
    logger_v = MetricsLogger(run_dir, "val")
    ckpt = CheckpointManager(run_dir)

    rng = jax.random.PRNGKey(cfg.train.seed)
    state, ae, disc, opt_g, opt_d = init_state(
        cfg, rng, window=train_ds.padded_window, dtype=dtype)
    if resume:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state = restored
    state = replicate(mesh, state)

    train_step = make_train_step(ae, disc, opt_g, opt_d, cfg)
    eval_step = make_eval_step(ae)

    np_rng = np.random.default_rng(cfg.train.seed)
    n_dev = mesh.devices.size
    start_epoch = int(jax.device_get(state.step)) // max(
        1, (len(train_ds) + cfg.train.batch_size - 1) // cfg.train.batch_size)
    best_loss = float(jax.device_get(state.best_loss))
    stopped_on_nan = False
    last_epoch = start_epoch

    for epoch in range(start_epoch, cfg.train.n_epochs):
        last_epoch = epoch
        epoch_metrics = []
        # train shuffle=False / valid shuffle=True is a PRESERVED reference
        # quirk (dataset/dataset.py:74,91): its train randomness comes from
        # the per-epoch random window crop, not batch composition
        for dev_batch in prefetch_to_device(
            train_ds.epoch_batches(cfg.train.batch_size, np_rng,
                                   shuffle=False, pad_multiple=n_dev),
            mesh, dtype=dtype,
        ):
            state, metrics = train_step(state, dev_batch, rng)
            epoch_metrics.append(metrics)

        m = {k: float(np.mean([jax.device_get(em[k]) for em in epoch_metrics]))
             for k in epoch_metrics[0]}
        logger_t.log(epoch, m)

        if not np.isfinite(m["g_loss"]):
            # automatic "best model before explosion" (README.md:18)
            stopped_on_nan = True
            break

        if (epoch + 1) % cfg.train.val_interval == 0:
            first_pair = {}

            def _losses(bi, batch):
                dev_batch = shard_batch(mesh, jnp.asarray(batch, dtype))
                l1, recon = eval_step(state.params_g, dev_batch)
                if bi == 0:  # figures plot sample 0 only — fetch just that
                    first_pair["orig"] = np.asarray(
                        jax.device_get(dev_batch[:1]), np.float32)
                    first_pair["recon"] = np.asarray(
                        jax.device_get(recon[:1]), np.float32)
                return l1

            val_loss = masked_epoch_mean(
                len(valid_ds),
                valid_ds.epoch_batches(cfg.train.batch_size, np_rng,
                                       shuffle=True, pad_multiple=n_dev),
                _losses, batch_size=cfg.train.batch_size)
            logger_v.log(epoch, {"recons_loss": val_loss})
            # reconstruction + spectral-overlay figures every val interval —
            # the diagnostic the reference's authors used to catch the
            # spectral-loss explosion (train_autoencoderkl.py:262-283,
            # util.py:137-195)
            _log_val_figures(run_dir, epoch, first_pair)
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
                ckpt.save_best(host_state.params_g)

    host_state = jax.device_get(state)
    if stopped_on_nan:
        # "last model before the loss exploded" (README.md:18): final_model
        # must never carry non-finite params — fall back to the latest
        # finite periodic checkpoint, or skip the write if none exists.
        host_state = ckpt.restore_latest(host_state)
    else:
        ckpt.save(int(host_state.step), host_state)
    if host_state is not None:
        ckpt.save_best(host_state.params_g, name="final_model")
    ckpt.close()
    logger_t.close()
    logger_v.close()
    return AEKLTrainResult(str(run_dir), best_loss, last_epoch, stopped_on_nan)
