"""Full DDPM wrapper math — the first-generation diffusion engine.

Parity target: reference ``src/models/ldm.py:78-478`` (v1 pipeline,
``src/first_version/train_ddpm.py``): registered-buffer schedule tables
(posterior coefficients, lvlb weights), ``q_sample``, ``p_losses`` with
eps/x0 targets + per-timestep log-variance + ELBO weighting, and the
ancestral ``p_sample_loop`` with posterior-variance noise.

Pure-functional re-design: all tables live in one ``DDPMTables`` pytree;
``p_sample_loop`` is a lax.scan. The modern path (NoiseSchedule +
ddpm/ddim_step) is preferred for new work; this module documents and
preserves the v1 semantics, including the lvlb ELBO term the main path
never enables (original_elbo_weight 0.0 in all configs).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from sleepgen.diffusion.schedules import make_betas


@struct.dataclass
class DDPMTables:
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    lvlb_weights: jnp.ndarray
    logvar: jnp.ndarray
    num_timesteps: int = struct.field(pytree_node=False)
    parameterization: str = struct.field(pytree_node=False, default="eps")

    @classmethod
    def create(
        cls,
        schedule: str = "ldm_linear",
        timesteps: int = 1000,
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
        logvar_init: float = 0.0,
    ) -> "DDPMTables":
        # note: the reference maps its name "linear" to the sqrt-space
        # schedule (ldm.py:40-49); make_betas calls that "ldm_linear".
        name = "ldm_linear" if schedule == "linear" else schedule
        betas = make_betas(name, timesteps, linear_start, linear_end, cosine_s)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = (1 - v_posterior) * betas * (1.0 - acp_prev) / (1.0 - acp) \
            + v_posterior * betas
        # post_var[0] == 0 makes lvlb[0] a deliberate inf/0-div that the
        # next line overwrites (reference ldm.py:219-224 quirk) — silence
        # the expected RuntimeWarning so real ones stay visible
        with np.errstate(divide="ignore", invalid="ignore"):
            if parameterization == "eps":
                lvlb = betas**2 / (2 * post_var * alphas * (1 - acp))
            elif parameterization == "x0":
                # PRESERVED reference bug (models/ldm.py x0 branch, itself
                # vendored CompVis code): `2.0 * 1 - acp` divides by
                # (2 - acp), not the intended 2*(1 - acp) — kept verbatim
                # for numerical parity with reference-trained v1 models
                lvlb = 0.5 * np.sqrt(acp) / (2.0 * 1 - acp)
            else:
                raise NotImplementedError(parameterization)
        lvlb[0] = lvlb[1]
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(acp),
            alphas_cumprod_prev=f32(acp_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1)),
            posterior_variance=f32(post_var),
            posterior_log_variance_clipped=f32(np.log(np.maximum(post_var, 1e-20))),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
            lvlb_weights=f32(lvlb),
            logvar=jnp.full((timesteps,), logvar_init, jnp.float32),
            num_timesteps=int(timesteps),
            parameterization=parameterization,
        )


def _extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    out = jnp.take(a, t, axis=0)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_sample(tbl: DDPMTables, x0: jnp.ndarray, t: jnp.ndarray,
             noise: jnp.ndarray) -> jnp.ndarray:
    """q(x_t | x_0) sample (ldm.py:392-408)."""
    return (_extract(tbl.sqrt_alphas_cumprod, t, x0.ndim) * x0
            + _extract(tbl.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * noise)


def predict_start_from_noise(tbl: DDPMTables, x_t, t, noise):
    return (_extract(tbl.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(tbl.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise)


def q_posterior(tbl: DDPMTables, x0, x_t, t):
    mean = (_extract(tbl.posterior_mean_coef1, t, x_t.ndim) * x0
            + _extract(tbl.posterior_mean_coef2, t, x_t.ndim) * x_t)
    var = _extract(tbl.posterior_variance, t, x_t.ndim)
    logvar = _extract(tbl.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, var, logvar


def p_losses(
    tbl: DDPMTables,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    loss_type: str = "l2",
    l_simple_weight: float = 1.0,
    original_elbo_weight: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """DDPM training loss with lvlb weighting (ldm.py:427-463)."""
    x_noisy = q_sample(tbl, x0, t, noise)
    model_out = model_fn(x_noisy, t).astype(jnp.float32)
    target = noise if tbl.parameterization == "eps" else x0

    if loss_type == "l2":
        per = (model_out - target.astype(jnp.float32)) ** 2
    elif loss_type == "l1":
        per = jnp.abs(model_out - target.astype(jnp.float32))
    else:
        raise NotImplementedError(loss_type)
    loss_simple = per.mean(axis=tuple(range(1, per.ndim)))

    logvar_t = jnp.take(tbl.logvar, t)
    loss = loss_simple / jnp.exp(logvar_t) + logvar_t
    loss = l_simple_weight * loss.mean()

    loss_vlb = (jnp.take(tbl.lvlb_weights, t) * loss_simple).mean()
    loss = loss + original_elbo_weight * loss_vlb
    return loss, {"loss_simple": loss_simple.mean(), "loss_vlb": loss_vlb,
                  "loss": loss}


def p_sample(
    tbl: DDPMTables,
    model_fn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    clip_denoised: bool = True,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """One ancestral step with posterior log-variance noise (ldm.py:310-357)."""
    model_out = model_fn(x, t).astype(jnp.float32)
    if tbl.parameterization == "eps":
        x_recon = predict_start_from_noise(tbl, x, t, model_out)
    else:
        x_recon = model_out
    if clip_denoised:
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
    mean, _, logvar = q_posterior(tbl, x_recon, x, t)
    nonzero = (t > 0).astype(x.dtype)
    nonzero = nonzero.reshape(nonzero.shape + (1,) * (x.ndim - nonzero.ndim))
    return mean + nonzero * jnp.exp(0.5 * logvar) * noise * temperature


def p_sample_loop(
    tbl: DDPMTables,
    model_fn,
    shape: Tuple[int, ...],
    rng: jax.Array,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """Full reverse chain T-1..0 as a lax.scan (ldm.py:359-381)."""
    rng, init_key = jax.random.split(rng)
    x = jax.random.normal(init_key, shape, jnp.float32)
    ts = jnp.arange(tbl.num_timesteps - 1, -1, -1)

    def body(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, jnp.float32)
        t_b = jnp.full((x.shape[0],), t, jnp.int32)
        x = p_sample(tbl, model_fn, x, t_b, noise, clip_denoised)
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x, rng), ts)
    return x
