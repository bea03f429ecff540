"""Batched diffusion sampling — the north-star throughput path.

Parity target: reference ``src/sample_trials.py:86-197`` (LDM: per-seed
batch-1, 200 DDIM steps, decode, crop [36:-36], save ``sample_i.npy`` and
``psd_list_i.npy``) and ``src/sample_trials_ddpm.py:59-128`` (DM in signal
space via DiffusionInferer.sample).

TPU re-design (SURVEY.md §3.3): seeds become a batch dimension — each
seed i gets its own PRNG stream (fold_in), the 200 DDIM steps run as one
``lax.scan`` with no host sync, and the stage-1 decode happens inside the
same jit. bf16 UNet compute, fp32 schedule math. One device step emits
hundreds of windows instead of the reference's one-per-loop.

The per-seed determinism contract of the reference
(``set_determinism(seed=i)`` at sample_trials.py:150) maps to
``noise_i = normal(fold_in(base_key, i))`` — deterministic per seed and
independent of batching.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sleepgen.diffusion import NoiseSchedule, ddim_step, ddim_timesteps, ddpm_step


def validate_stage(num_classes: int, stage, guidance_scale: float = 1.0) -> None:
    """Shared argument validation for conditional sampling surfaces.

    Raises ValueError when ``stage`` is missing/out-of-range for a
    conditional checkpoint, or when ``stage``/``guidance_scale`` are given
    for an unconditional one. Without the range check, a negative stage
    would silently sample the CFG null branch (UNet1d masks labels < 0 to
    the zero embedding) and an overlarge stage would silently clamp to the
    last class (flax Embed's out-of-bounds take)."""
    if num_classes > 0:
        if stage is None:
            raise ValueError(
                f"conditional checkpoint (num_classes={num_classes}): "
                f"pass stage=0..{num_classes - 1}")
        if not 0 <= int(stage) < num_classes:
            raise ValueError(
                f"stage {stage} out of range 0..{num_classes - 1}")
    else:
        if stage is not None:
            raise ValueError(
                "stage given but the checkpoint is unconditional "
                "(config.unet.num_classes=0)")
        if guidance_scale != 1.0:
            raise ValueError(
                "guidance_scale requires a class-conditional checkpoint "
                "(config.unet.num_classes=0 here) — it would be silently "
                "ignored")


def seed_noise(base_key: jax.Array, seeds: jnp.ndarray, shape: Tuple[int, ...]) -> jnp.ndarray:
    """Per-seed initial noise: vmapped fold_in keeps the per-seed contract
    under any batch split."""
    def one(seed):
        return jax.random.normal(jax.random.fold_in(base_key, seed), shape, jnp.float32)

    return jax.vmap(one)(seeds)


def ddim_sample_loop(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sched: NoiseSchedule,
    x_T: jnp.ndarray,
    num_inference_steps: int = 200,
    eta: float = 0.0,
) -> jnp.ndarray:
    """Full DDIM reverse process as one lax.scan (jit-safe, donation-safe)."""
    ts = jnp.asarray(ddim_timesteps(sched.num_timesteps, num_inference_steps))
    ratio = sched.num_timesteps // num_inference_steps
    ts_prev = ts - ratio

    def body(x, tp):
        t, t_prev = tp
        t_b = jnp.full((x.shape[0],), t, jnp.int32)
        out = model_fn(x, t_b)
        x, _ = ddim_step(sched, out.astype(jnp.float32), t, t_prev, x, eta=eta)
        return x, None

    x, _ = jax.lax.scan(body, x_T, (ts, ts_prev))
    return x


def ddpm_sample_loop(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sched: NoiseSchedule,
    x_T: jnp.ndarray,
    rng: jax.Array,
    clip_sample: bool = True,
) -> jnp.ndarray:
    """Full ancestral DDPM loop (DiffusionInferer.sample parity; used by the
    in-training sampler util.py:226-285 and sample_trials_ddpm.py)."""
    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)

    def body(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        t_b = jnp.full((x.shape[0],), t, jnp.int32)
        out = model_fn(x, t_b)
        noise = jax.random.normal(sub, x.shape, jnp.float32)
        x, _ = ddpm_step(sched, out.astype(jnp.float32), t, x, noise,
                         clip_sample=clip_sample)
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x_T, rng), ts)
    return x


def ddpm_inpaint_loop(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sched: NoiseSchedule,
    x_known: jnp.ndarray,
    mask: jnp.ndarray,
    rng: jax.Array,
    num_resample: int = 1,
    clip_sample: bool = True,
) -> jnp.ndarray:
    """Masked ancestral sampling (RePaint, Lugmayr et al. 2022) as one
    lax.scan — diffusion-based imputation of missing signal regions.

    ``mask`` is 1 where ``x_known`` is observed, 0 where it must be
    generated (broadcastable to ``x_known``'s (B, L, C)). At every reverse
    step the known region is projected onto the forward marginal
    q(x_t | x_known) so the generated region is denoised *in context*;
    ``num_resample`` > 1 adds RePaint's resampling jumps (renoise
    x_{t-1} -> x_t and denoise again) to harmonize the boundary. The
    returned signal equals ``x_known`` exactly on the observed region.

    Beyond-parity capability: the reference has no imputation path at
    all; EEG artifact repair falls out of the same trained DM
    (``src/sample_trials_ddpm.py`` only draws unconditional windows).
    """
    mask = jnp.asarray(mask, jnp.float32)
    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
    k_init, k_loop = jax.random.split(rng)
    x_T = jax.random.normal(k_init, x_known.shape, jnp.float32)

    def body(carry, t):
        x, key = carry
        t_b = jnp.full((x.shape[0],), t, jnp.int32)
        # small static unroll: RePaint's resampling count is 1-2 in practice
        for u in range(num_resample):
            key, k_f, k_r, k_j = jax.random.split(key, 4)
            x_known_t = sched.add_noise(
                x_known, jax.random.normal(k_f, x.shape, jnp.float32), t_b)
            x = mask * x_known_t + (1.0 - mask) * x
            out = model_fn(x, t_b)
            x_prev, _ = ddpm_step(
                sched, out.astype(jnp.float32), t, x,
                jax.random.normal(k_r, x.shape, jnp.float32),
                clip_sample=clip_sample)
            if u < num_resample - 1:
                # jump back: one forward step x_{t-1} -> x_t
                beta = sched._gather(sched.betas, t, x.ndim)
                x = (jnp.sqrt(1.0 - beta) * x_prev
                     + jnp.sqrt(beta) * jax.random.normal(k_j, x.shape,
                                                          jnp.float32))
            else:
                x = x_prev
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x_T, k_loop), ts)
    return mask * x_known + (1.0 - mask) * x


def _cond_model_fn(unet, params, labels, guidance_scale, guided=None):
    """Model closure shared by every sampling/imputation path: plain,
    conditional, or classifier-free-guided (null branch fused into one
    2B-batch apply).

    ``guided`` overrides the CFG-branch decision for callers whose
    ``guidance_scale`` is a *traced* scalar (make_ldm_sampler) — comparing
    a tracer against 1.0 inside Python control flow would fail; everyone
    else leaves it None and the Python-float comparison picks the branch."""
    if guided is None:
        guided = guidance_scale != 1.0
    if labels is None:
        def model_fn(x, t):
            return unet.apply({"params": params}, x, t)
    elif not guided:
        def model_fn(x, t):
            return unet.apply({"params": params}, x, t, labels)
    else:
        y2 = jnp.concatenate([labels, jnp.full_like(labels, -1)])

        def model_fn(x, t):
            v2 = unet.apply({"params": params}, jnp.concatenate([x, x]),
                            jnp.concatenate([t, t]), y2)
            v_c, v_n = jnp.split(v2, 2)
            return v_n + guidance_scale * (v_c - v_n)

    return model_fn


def impute_dm(
    unet,
    params,
    sched,
    x_known: jnp.ndarray,
    mask: jnp.ndarray,
    base_key: jax.Array,
    labels: jnp.ndarray | None = None,
    num_resample: int = 1,
    guidance_scale: float = 1.0,
):
    """Impute the masked-out region of ``x_known`` with a trained
    signal-space DM (optionally stage-conditional via ``labels``;
    ``guidance_scale>1`` applies classifier-free guidance to the repair —
    requires a model trained with cond_dropout_prob > 0)."""
    model_fn = _cond_model_fn(unet, params, labels, guidance_scale)
    return ddpm_inpaint_loop(model_fn, sched, x_known, mask, base_key,
                             num_resample=num_resample)


def latent_observed_mask(mask: jnp.ndarray, latent_len: int,
                         erode: int = 4) -> jnp.ndarray:
    """Signal-space observed-mask (B, L, 1) -> latent anchor mask
    (B, latent_len, 1), conservatively.

    A latent position counts as observed only if EVERY signal sample it
    covers is observed (min over each length-(L/latent_len) group), and
    the observed region is then eroded by ``erode`` further latent
    positions on each side: the stage-1 encoder's receptive field is much
    wider than its stride, so latents adjacent to the masked span are
    contaminated by the (arbitrary) masked content and must not be used
    as RePaint anchors. Erosion only ever *widens* the generated region —
    exactness of observed samples comes from the signal-space splice in
    :func:`impute_ldm`, not from this mask."""
    m = jnp.asarray(mask, jnp.float32)
    L = m.shape[-2]
    assert L % latent_len == 0, (L, latent_len)
    f = L // latent_len
    m = jnp.min(m[..., 0].reshape(*m.shape[:-2], latent_len, f), axis=-1)
    if erode > 0:
        m = jax.lax.reduce_window(
            m, 1.0, jax.lax.min,
            window_dimensions=(1,) * (m.ndim - 1) + (2 * erode + 1,),
            window_strides=(1,) * m.ndim, padding="SAME")
    return m[..., None]


def impute_ldm(
    unet,
    ae,
    unet_params,
    ae_params,
    scale_factor,
    sched,
    x_known: jnp.ndarray,
    mask: jnp.ndarray,
    base_key: jax.Array,
    labels: jnp.ndarray | None = None,
    num_resample: int = 1,
    latent_erode: int = 4,
    guidance_scale: float = 1.0,
):
    """RePaint imputation in LDM *latent* space (beyond parity).

    The flagship two-stage pipeline repairs masked spans with the SAME
    trained checkpoints that sample_trials uses: the observed window is
    encoded through the frozen stage-1 posterior mean (the deterministic
    branch, as in ``reconstruct`` — reference compute_mmds.py:495), masked
    ancestral sampling runs in latent space (4x shorter sequence, the
    operating point the LDM UNet was trained at), the result is decoded,
    and the observed samples are spliced back EXACTLY in signal space.

    ``mask`` is 1 = observed in signal space, broadcastable to
    ``x_known``'s (B, L, 1). The latent anchor mask is its conservative
    downsample eroded by ``latent_erode`` positions
    (:func:`latent_observed_mask`); whatever values sit inside the masked
    span of ``x_known`` only influence (eroded-away) contaminated latents,
    never the output's observed region. ``clip_sample`` is off in the
    latent chain — latents are unbounded, unlike [0,1] signals.
    """
    from sleepgen.nn import AutoencoderKL

    mask = jnp.asarray(mask, jnp.float32)
    z_mu, _ = ae.apply({"params": ae_params}, x_known,
                       method=AutoencoderKL.encode)
    z_known = z_mu.astype(jnp.float32) * scale_factor
    m_lat = latent_observed_mask(mask, z_known.shape[-2], latent_erode)
    model_fn = _cond_model_fn(unet, unet_params, labels, guidance_scale)
    z = ddpm_inpaint_loop(model_fn, sched, z_known, m_lat, base_key,
                          num_resample=num_resample, clip_sample=False)
    x_dec = ae.apply({"params": ae_params}, z / scale_factor,
                     method=AutoencoderKL.decode_stage_2_outputs)
    return mask * x_known + (1.0 - mask) * x_dec.astype(jnp.float32)


def sample_dm_conditional(
    unet,
    params,
    sched,
    labels: jnp.ndarray,
    base_key: jax.Array,
    seeds: jnp.ndarray,
    window: int,
    num_steps: int = 200,
    guidance_scale: float = 1.0,
):
    """Class-conditional signal-space sampling (beyond-parity path).

    One DDIM scan over ``num_steps`` with the label batch closed over the
    model fn — the loops themselves stay condition-agnostic. ``labels``
    is (B,) int32 aligned with ``seeds``; per-seed noise keeps the
    reference's seed determinism contract (sample_trials.py:150), so
    ``(seed, label, guidance_scale)`` fully determines each sample.

    ``guidance_scale > 1`` applies classifier-free guidance:
    ``v = v_null + s * (v_cond - v_null)`` with the null branch run as
    labels = -1 (zeroed embedding). Both branches go through the UNet in
    ONE 2B-batch apply — on TPU that doubles the MXU work per step but
    keeps a single fused dispatch instead of two half-utilized ones.
    Requires a model trained with ``train.cond_dropout_prob > 0``.
    """
    x_T = seed_noise(base_key, seeds, (window, 1))
    model_fn = _cond_model_fn(unet, params, labels, guidance_scale)
    return ddim_sample_loop(model_fn, sched, x_T, num_steps)
