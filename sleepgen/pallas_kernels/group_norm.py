"""Fused GroupNorm(+SiLU) Pallas TPU kernel.

Every ResBlock in the AEKL and the diffusion UNet opens with
GroupNorm -> SiLU (reference src/models/ae_kl.py:67-75,
src/models/unet.py:260-263). Unfused, that chain costs multiple HBM
round-trips of the (B, L, C) activation; this kernel does the statistics,
normalization, affine and SiLU in one VMEM residency per (batch row).

Design notes (TPU lane layout):
  * grid over the batch; each program holds one (L, C) slice in VMEM
    (worst case here: 3072 x 128 x f32 = 1.5 MB << 16 MB).
  * grouped statistics avoid lane-dimension reshapes: per-channel
    sum/sumsq are a sublane reduction to (1, C); group aggregation and
    broadcast back to channels are two tiny matmuls against a one-hot
    (C, G) membership matrix built with broadcasted_iota — MXU-friendly
    and exact.
  * fp32 statistics regardless of input dtype (the fp32-islands policy).

``fused_group_norm_silu`` is a custom_vjp: forward runs the kernel,
backward differentiates the pure-jnp reference implementation (identical
math), so the op is safe inside training steps.

Measured on v5e (round 1, 50-iter mean): XLA's own fusion of the jnp
reference is FASTER than this kernel for the model's shapes —
(256, 3072, 32, G=1): XLA 0.94 ms vs Pallas 2.17 ms;
(256, 768, 128, G=32): XLA 0.88 ms vs Pallas 1.29 ms.
The activations here are small (C < 128 lanes at G=1) and XLA pipelines
the fused reduce+elementwise well. Consequently ``use_pallas_norm``
defaults to False everywhere; the kernel stays as a correct, tested
baseline for future shapes where manual fusion pays (e.g. multi-minute
windows) — per the TPU-first rule: don't hand-schedule what the compiler
already schedules better.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def group_norm_silu_reference(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
    num_groups: int, eps: float = 1e-6, apply_silu: bool = True,
) -> jnp.ndarray:
    """Pure-jnp reference (and autodiff rule) — torch GroupNorm parity."""
    b, l, c = x.shape
    d = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, l, num_groups, d)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, l, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps, apply_silu):
    x = x_ref[0].astype(jnp.float32)  # (L, C)
    l, c = x.shape
    d = c // num_groups

    # one-hot group membership (C, G) via 2-D iota
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    member = (ch // d == grp).astype(jnp.float32)

    cs = jnp.sum(x, axis=0, keepdims=True)          # (1, C)
    css = jnp.sum(x * x, axis=0, keepdims=True)     # (1, C)
    gs = jnp.dot(cs, member, preferred_element_type=jnp.float32)    # (1, G)
    gss = jnp.dot(css, member, preferred_element_type=jnp.float32)  # (1, G)
    n = jnp.float32(l * d)
    mean_g = gs / n
    var_g = gss / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast back to channels: (1, G) @ (G, C)
    mean_c = jnp.dot(mean_g, member.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, member.T, preferred_element_type=jnp.float32)

    y = (x - mean_c) * inv_c
    y = y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pallas_forward(x, scale, bias, num_groups, eps, apply_silu, interpret):
    b, l, c = x.shape
    kern = functools.partial(_kernel, num_groups=num_groups, eps=eps,
                             apply_silu=apply_silu)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale[None, :], bias[None, :])


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm_silu(x, scale, bias, num_groups: int, eps: float = 1e-6,
                          apply_silu: bool = True):
    """GroupNorm + affine (+SiLU) over (B, L, C). Pallas kernel on TPU,
    interpreter elsewhere (tests), jnp-reference gradients."""
    return _pallas_forward(x, scale, bias, num_groups, eps, apply_silu,
                           interpret=not _on_tpu())


def _fwd(x, scale, bias, num_groups, eps, apply_silu):
    y = fused_group_norm_silu(x, scale, bias, num_groups, eps, apply_silu)
    return y, (x, scale, bias)


def _bwd(num_groups, eps, apply_silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: group_norm_silu_reference(
            xx, ss, bb, num_groups, eps, apply_silu), x, scale, bias)
    return vjp(g)


fused_group_norm_silu.defvjp(_fwd, _bwd)
