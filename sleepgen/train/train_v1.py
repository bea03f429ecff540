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
    clip_norm: float = 1.0,
):
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
    vars_g = ae.init({"params": k1}, x, k2)
    vars_d = disc.init({"params": k3}, x, train=True)
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
