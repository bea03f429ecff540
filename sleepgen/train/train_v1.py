"""First-generation training loops (SURVEY.md §1: "two generations
coexist" — keep the v1 pipeline available).

Parity targets:
  * ``src/first_version/train_encoder.py:113-306``: v1 AutoencoderKL +
    v1 PatchGAN discriminator; L1 + KL (kl_weight) + plain MSE GAN
    (gan_weight, no LeakyReLU activation — unlike the main path's MONAI
    LSGAN), grad-clip 1.0 on both, AMP.
  * ``src/first_version/train_ddpm.py:19-118``: DDPM over frozen v1
    encoder latents via the full DDPM wrapper's forward loss
    (models/ldm.py p_losses), Adam(base_lr).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from sleepgen.diffusion.ddpm_v1 import DDPMTables, p_losses
from sleepgen.losses.kl import kl_gaussian
from sleepgen.nn.aekl_v1 import AutoencoderKLV1
from sleepgen.utils import jit_init
from sleepgen.nn.discriminator import DiscriminatorV1


@struct.dataclass
class V1EncoderState:
    step: jnp.ndarray
    params_g: Any
    opt_g: Any
    params_d: Any
    batch_stats_d: Any
    opt_d: Any


def make_v1_encoder_train_step(
    ae: AutoencoderKLV1,
    disc: DiscriminatorV1,
    opt_g,
    opt_d,
    kl_weight: float = 1e-6,
    gan_weight: float = 0.01,
):
    # NOTE: the reference's grad-clip 1.0 (train_encoder.py:185,205) lives
    # in the OPTIMIZERS — init_v1_encoder_state chains
    # optax.clip_by_global_norm into opt_g/opt_d. Callers building their
    # own optimizers must include it themselves (a dead clip_norm arg here
    # used to suggest this step applied it; it never did).
    def train_step(state: V1EncoderState, batch: jnp.ndarray, rng: jax.Array):
        key = jax.random.fold_in(rng, state.step)

        def g_loss_fn(params_g):
            recon, z_mu, z_sigma = ae.apply({"params": params_g}, batch, key)
            l1 = jnp.mean(jnp.abs(recon.astype(jnp.float32) - batch.astype(jnp.float32)))
            kl = kl_gaussian(z_mu, z_sigma)
            logits_fake, _ = disc.apply(
                {"params": state.params_d, "batch_stats": state.batch_stats_d},
                recon, train=True, mutable=["batch_stats"])
            # v1 uses raw MSE-to-1 (train_encoder.py:147-150), no activation
            g_adv = jnp.mean((logits_fake.astype(jnp.float32) - 1.0) ** 2)
            loss = l1 + kl_weight * kl + gan_weight * g_adv
            return loss, {"loss_l1": l1, "loss_kl": kl, "loss_g": g_adv,
                          "recon": recon}

        (g_loss, aux), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g)
        updates_g, new_opt_g = opt_g.update(grads_g, state.opt_g, state.params_g)
        new_params_g = optax.apply_updates(state.params_g, updates_g)
        recon = jax.lax.stop_gradient(aux.pop("recon"))

        def d_loss_fn(params_d):
            lf, mut = disc.apply(
                {"params": params_d, "batch_stats": state.batch_stats_d},
                recon, train=True, mutable=["batch_stats"])
            lr_, mut = disc.apply(
                {"params": params_d, "batch_stats": mut["batch_stats"]},
                batch, train=True, mutable=["batch_stats"])
            d = 0.5 * (jnp.mean(lf.astype(jnp.float32) ** 2)
                       + jnp.mean((lr_.astype(jnp.float32) - 1.0) ** 2))
            return gan_weight * d, mut["batch_stats"]

        (d_loss, new_bs), grads_d = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.params_d)
        updates_d, new_opt_d = opt_d.update(grads_d, state.opt_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, updates_d)

        new_state = state.replace(
            step=state.step + 1, params_g=new_params_g, opt_g=new_opt_g,
            params_d=new_params_d, batch_stats_d=new_bs, opt_d=new_opt_d)
        return new_state, {"loss": g_loss, "loss_d": d_loss, **aux}

    return jax.jit(train_step, donate_argnums=(0,))


def init_v1_encoder_state(
    ae: AutoencoderKLV1, disc: DiscriminatorV1, rng: jax.Array,
    window: int = 3072, lr_g: float = 1e-4, lr_d: float = 5e-4,
    clip_norm: float = 1.0,
) -> Tuple[V1EncoderState, Any, Any]:
    x = jnp.zeros((2, window, 1))
    rng, k1, k2, k3 = jax.random.split(rng, 4)
    vars_g = jit_init(ae, {"params": k1}, x, k2)
    vars_d = jit_init(disc, {"params": k3}, x, train=True)
    # grad-clip 1.0 parity (train_encoder.py:185,205)
    opt_g = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr_g))
    opt_d = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr_d))
    state = V1EncoderState(
        step=jnp.zeros((), jnp.int32),
        params_g=vars_g["params"], opt_g=opt_g.init(vars_g["params"]),
        params_d=vars_d["params"],
        batch_stats_d=vars_d.get("batch_stats", FrozenDict()),
        opt_d=opt_d.init(vars_d["params"]))
    return state, opt_g, opt_d


def make_v1_ddpm_train_step(tbl: DDPMTables, unet, ae: AutoencoderKLV1,
                            stage1_params, opt):
    """DDPM over frozen v1 latents (train_ddpm.py:19-60: loss =
    model(z)[0] i.e. p_losses at random t)."""

    def train_step(params, opt_state, step, batch, rng):
        key = jax.random.fold_in(rng, step)
        k_enc, k_t, k_noise = jax.random.split(key, 3)
        z = ae.apply({"params": stage1_params}, batch, k_enc,
                     method=AutoencoderKLV1.get_ldm_inputs)
        z = jax.lax.stop_gradient(z.astype(jnp.float32))
        t = jax.random.randint(k_t, (batch.shape[0],), 0, tbl.num_timesteps)
        noise = jax.random.normal(k_noise, z.shape, jnp.float32)

        def loss_fn(p):
            loss, aux = p_losses(
                tbl, lambda x, tt: unet.apply({"params": p}, x, tt), z, t, noise)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, {"loss": loss, **aux}

    return jax.jit(train_step, donate_argnums=(0, 1))


# ---------------------------------------------------------------------------
# Minimal v1 drivers (first_version/train_encoder.py:309-409 /
# train_ddpm.py:120-228 loop structure: epoch loop, per-interval validate,
# best/final checkpoints)
# ---------------------------------------------------------------------------
def train_v1_encoder(
    train_ds,
    valid_ds,
    run_dir,
    n_epochs: int = 10,
    batch_size: int = 16,
    val_interval: int = 5,
    lr_g: float = 1e-4,
    lr_d: float = 5e-4,
    kl_weight: float = 1e-6,
    gan_weight: float = 0.01,
    n_channels: int = 64,
    embed_dim: int = 3,
    z_channels: int = 3,
    ch_mult=(1, 2, 4),
    num_groups: int = 32,
    seed: int = 2,
    mesh=None,
):
    import numpy as np

    from sleepgen.parallel import make_mesh, replicate, shard_batch
    from sleepgen.utils import CheckpointManager, MetricsLogger

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    window = train_ds.padded_window
    ae = AutoencoderKLV1(embed_dim=embed_dim, n_channels=n_channels,
                         z_channels=z_channels, ch_mult=tuple(ch_mult),
                         resolution=window, num_groups=num_groups)
    disc = DiscriminatorV1()
    rng = jax.random.PRNGKey(seed)
    state, opt_g, opt_d = init_v1_encoder_state(
        ae, disc, rng, window=window, lr_g=lr_g, lr_d=lr_d)
    state = replicate(mesh, state)
    step = make_v1_encoder_train_step(ae, disc, opt_g, opt_d,
                                      kl_weight=kl_weight, gan_weight=gan_weight)

    logger = MetricsLogger(run_dir, "train")
    ckpt = CheckpointManager(run_dir)
    np_rng = np.random.default_rng(seed)
    best = float("inf")
    for epoch in range(n_epochs):
        metrics = None
        for batch in train_ds.epoch_batches(batch_size, np_rng, pad_multiple=n_dev):
            state, metrics = step(state, jnp.asarray(batch), rng)
        m = {k: float(jax.device_get(v)) for k, v in metrics.items()}
        logger.log(epoch, m)
        if (epoch + 1) % val_interval == 0:
            val = 0.0
            n = 0
            for batch in valid_ds.epoch_batches(batch_size, np_rng,
                                                pad_multiple=n_dev):
                recon, z_mu, z_sigma = ae.apply(
                    {"params": state.params_g}, jnp.asarray(batch), rng)
                val += float(jnp.mean(jnp.abs(recon - jnp.asarray(batch))))
                n += 1
            val /= max(n, 1)
            ckpt.save(epoch + 1, jax.device_get(state))
            if val <= best:
                best = val
                ckpt.save_best(jax.device_get(state.params_g))
    ckpt.save_best(jax.device_get(state.params_g), name="final_model")
    ckpt.close()
    logger.close()
    return best, state


def train_v1_ddpm(
    train_ds,
    stage1_params,
    run_dir,
    ae: AutoencoderKLV1,
    n_epochs: int = 10,
    batch_size: int = 16,
    base_lr: float = 2.5e-5,
    timesteps: int = 1000,
    unet=None,
    seed: int = 2,
    mesh=None,
):
    import numpy as np

    from sleepgen.nn.unet1d import UNet1d
    from sleepgen.parallel import make_mesh, replicate
    from sleepgen.utils import CheckpointManager, MetricsLogger

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    window = train_ds.padded_window
    latent_len = window // 2 ** (len(ae.ch_mult) - 1)
    unet = unet or UNet1d(in_channels=ae.embed_dim, out_channels=ae.embed_dim,
                          model_channels=64, channel_mult=(1, 2),
                          attention_resolutions=(2,))
    rng = jax.random.PRNGKey(seed)
    z0 = jnp.zeros((2, latent_len, ae.embed_dim), jnp.float32)
    params = jit_init(unet, rng, z0, jnp.zeros((2,), jnp.int32))["params"]
    opt = optax.adam(base_lr)
    opt_state = opt.init(params)
    stage1_params = replicate(mesh, stage1_params)
    tbl = DDPMTables.create("linear", timesteps, 0.0015, 0.0195)
    step = make_v1_ddpm_train_step(tbl, unet, ae, stage1_params, opt)

    logger = MetricsLogger(run_dir, "train")
    ckpt = CheckpointManager(run_dir)
    np_rng = np.random.default_rng(seed)
    i = 0
    for epoch in range(n_epochs):
        metrics = None
        for batch in train_ds.epoch_batches(batch_size, np_rng, pad_multiple=n_dev):
            params, opt_state, metrics = step(params, opt_state, i,
                                              jnp.asarray(batch), rng)
            i += 1
        logger.log(epoch, {k: float(jax.device_get(v))
                           for k, v in metrics.items()})
    ckpt.save_best({"params": jax.device_get(params)}, name="final_model")
    ckpt.close()
    logger.close()
    return params
