"""GroupNorm(+SiLU) with a hand-derived VJP — the training-step norm path.

Round-3 training ablation (benches/ablate_train.py, BASELINE.md): in the
fused LDM train step, GroupNorm + attention account for ~48% of step time
(GN+attn-identity bound 4321 windows/s vs 2229 full), and autodiff of the
norm is the dominant share. XLA differentiates the mean/var graph into
several passes over the (B, L, C) activation; this module instead defines
the closed-form GroupNorm backward

    dx = inv * (dxhat - mean(dxhat) - xhat * mean(dxhat * xhat))

(means per (batch, group), over the (L, C/G) elements) with the SiLU
gradient fused in, saving only ``(x, scale, bias, mean, inv)`` as
residuals — x is resident anyway, the preceding conv's backward needs it —
so the backward is one fused read of (x, dy), one write of dx, and two
group-sized reductions.

Numerics: statistics in fp32 with the single-pass variance (flax
``use_fast_variance`` convention); normalize/affine/SiLU in
``compute_dtype`` (fp32 strict, bf16 under fast-math); parameter gradients
accumulated in fp32. Gradient parity vs autodiff is pinned by
tests/test_models.py::test_custom_vjp_group_norm_matches_autodiff.

Same engineering discipline as pallas_kernels/group_norm.py: measured
against the XLA default before adoption (BASELINE.md round-3 table).
**Measured outcome (v5e, LDM step batch 256): a documented NEGATIVE
result** — strict 2317 w/s vs 2229 XLA-autodiff baseline (+4%), but
under fast-math 2523 vs 2611 for plain autodiff (-3%): the custom_vjp
boundary costs more fusion than the closed-form backward saves. The
module stays as tested, reusable machinery (and the honest record);
production GroupNorm32 keeps XLA autodiff.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def group_norm_silu(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    num_groups: int, eps: float = 1e-6,
                    apply_silu: bool = True, compute_dtype=None):
    """GroupNorm + affine (+ SiLU) over (B, L, C) with a fused backward.

    ``compute_dtype=None`` normalizes in fp32 (strict policy); pass the
    model's bf16 for the fast-math variant. Statistics are always fp32.
    """
    y, _ = _fwd(x, scale, bias, num_groups, eps, apply_silu, compute_dtype)
    return y


def _stats(x: jnp.ndarray, num_groups: int, eps: float):
    b, l, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, l, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3))                      # (B, G)
    var = jnp.mean(xf * xf, axis=(1, 3)) - mean * mean    # fast variance
    inv = jax.lax.rsqrt(var + eps)
    return mean, inv


def _broadcast(stat: jnp.ndarray, shape, num_groups: int, dtype):
    """(B, G) -> (B, 1, C) in the compute dtype."""
    b, _, c = shape
    return jnp.repeat(stat.astype(dtype), c // num_groups,
                      axis=-1).reshape(b, 1, c)


def _fwd(x, scale, bias, num_groups, eps, apply_silu, compute_dtype):
    cdt = compute_dtype or jnp.float32
    mean, inv = _stats(x, num_groups, eps)
    mean_c = _broadcast(mean, x.shape, num_groups, cdt)
    inv_c = _broadcast(inv, x.shape, num_groups, cdt)
    xhat = (x.astype(cdt) - mean_c) * inv_c
    z = xhat * scale.astype(cdt) + bias.astype(cdt)
    y = (z * jax.nn.sigmoid(z)) if apply_silu else z
    return y.astype(x.dtype), (x, scale, bias, mean, inv)


def _bwd(num_groups, eps, apply_silu, compute_dtype, res, dy):
    x, scale, bias, mean, inv = res
    cdt = compute_dtype or jnp.float32
    b, l, c = x.shape
    g = num_groups

    mean_c = _broadcast(mean, x.shape, g, cdt)
    inv_c = _broadcast(inv, x.shape, g, cdt)
    xhat = (x.astype(cdt) - mean_c) * inv_c
    dyc = dy.astype(cdt)

    if apply_silu:
        # recompute z from the residuals instead of storing activations
        z = xhat * scale.astype(cdt) + bias.astype(cdt)
        sig = jax.nn.sigmoid(z)
        dz = dyc * (sig * (1.0 + z * (1.0 - sig)))
    else:
        dz = dyc

    # parameter grads accumulate in fp32
    dz32 = dz.astype(jnp.float32)
    xhat32 = xhat.astype(jnp.float32)
    dscale = jnp.sum(dz32 * xhat32, axis=(0, 1))
    dbias = jnp.sum(dz32, axis=(0, 1))

    # closed-form dx: means per (batch, group) over the (L, C/G) elements
    dxhat32 = dz32 * scale.astype(jnp.float32)
    m1 = jnp.mean(dxhat32.reshape(b, l, g, c // g), axis=(1, 3))       # (B, G)
    m2 = jnp.mean((dxhat32 * xhat32).reshape(b, l, g, c // g),
                  axis=(1, 3))                                          # (B, G)
    dx = inv_c * (dxhat32.astype(cdt) - _broadcast(m1, x.shape, g, cdt)
                  - xhat * _broadcast(m2, x.shape, g, cdt))
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(bias.dtype))


group_norm_silu.defvjp(_fwd, _bwd)
