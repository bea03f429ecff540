"""Fused GroupNorm+SiLU+Conv3 Pallas TPU kernel — the resblock entry chain.

VERDICT r2 item 7: "the last sampler lever: GN-identity (59.6) and
attention-identity (57.7) bounds say remaining gains need conv-level
work. Prototype a fused conv+GN+SiLU Pallas kernel for the mc-128 1-D
shapes; keep only if it beats XLA, document either way."

Every ResBlock in the diffusion UNet opens with GroupNorm -> SiLU ->
Conv(k=3) (reference ``src/models/unet.py:260-266``). XLA schedules the
norm (a reduction barrier) and the conv as separate HBM passes; this
kernel holds one batch element's (L, C) slice in VMEM and does
statistics, normalize, affine, SiLU, and the k=3 convolution (three
shifted (L, C_in) @ (C_in, C_out) MXU matmuls) in one residency —
one HBM read of x, one HBM write of y.

Grid: (B,). VMEM per program at the flagship shapes: x + h + y + W
= (768x128)x3 fp32 + 3x128x128 ~ 1.3 MB << 16 MB; the largest level
(192, 512)->(192, 512) is similar.

Measured verdict on v5e: see BASELINE.md round-3 "Pallas fused
GN+SiLU+conv3" table (benches/bench_fused_resblock.py) — kept to the
same keep-only-if-it-beats-XLA rule as pallas_kernels/group_norm.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gn_silu_conv3_reference(x, scale, bias, w, b, num_groups: int,
                            eps: float = 1e-6):
    """Pure-jnp reference: GroupNorm(fp32 stats) -> SiLU -> 1-D conv k=3,
    SAME padding, fp32 accumulation. x: (B, L, C_in), w: (3, C_in, C_out)."""
    bsz, l, c = x.shape
    d = c // num_groups
    xf = x.astype(jnp.float32).reshape(bsz, l, num_groups, d)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(xf * xf, axis=(1, 3), keepdims=True) - mean * mean
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(bsz, l, c)
    h = h * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    h = h * jax.nn.sigmoid(h)
    h = h.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        h, w.astype(x.dtype), window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _kernel(x_ref, scale_ref, bias_ref, w_ref, b_ref, o_ref, *,
            num_groups, eps):
    x = x_ref[0].astype(jnp.float32)  # (L, C)
    l, c = x.shape
    d = c // num_groups

    # grouped statistics via the one-hot (C, G) membership matmul trick
    # (pallas_kernels/group_norm.py): no lane-dim reshapes
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    member = (ch // d == grp).astype(jnp.float32)
    cs = jnp.sum(x, axis=0, keepdims=True)
    css = jnp.sum(x * x, axis=0, keepdims=True)
    gs = jnp.dot(cs, member, preferred_element_type=jnp.float32)
    gss = jnp.dot(css, member, preferred_element_type=jnp.float32)
    n = jnp.float32(l * d)
    mean_g = gs / n
    var_g = gss / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, member.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, member.T, preferred_element_type=jnp.float32)

    h = (x - mean_c) * inv_c
    h = h * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    h = h * jax.nn.sigmoid(h)
    h = h.astype(w_ref.dtype)  # matmuls in the weight dtype (bf16 on TPU)

    # k=3 SAME conv as three shifted matmuls with fp32 MXU accumulation
    w0 = w_ref[0]
    w1 = w_ref[1]
    w2 = w_ref[2]
    zero = jnp.zeros((1, c), h.dtype)
    h_m1 = jnp.concatenate([zero, h[:-1]], axis=0)   # h shifted down (l-1)
    h_p1 = jnp.concatenate([h[1:], zero], axis=0)    # h shifted up (l+1)
    y = jnp.dot(h_m1, w0, preferred_element_type=jnp.float32)
    y += jnp.dot(h, w1, preferred_element_type=jnp.float32)
    y += jnp.dot(h_p1, w2, preferred_element_type=jnp.float32)
    y += b_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _kernel_tiled(x_ref, scale_ref, bias_ref, w_ref, b_ref, o_ref, *,
                  num_groups, eps):
    """TB batch elements per program: per-element GroupNorm stats, then ONE
    merged (TB*L, C_in) @ (C_in, C_out) MXU matmul per conv tap — the per-B
    grid's (L, C) matmuls leave the MXU pipeline short."""
    x = x_ref[...].astype(jnp.float32)  # (TB, L, C)
    tb, l, c = x.shape
    d = c // num_groups

    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    member = (ch // d == grp).astype(jnp.float32)
    cs = jnp.sum(x, axis=1)          # (TB, C)
    css = jnp.sum(x * x, axis=1)     # (TB, C)
    gs = jnp.dot(cs, member, preferred_element_type=jnp.float32)
    gss = jnp.dot(css, member, preferred_element_type=jnp.float32)
    n = jnp.float32(l * d)
    mean_g = gs / n                  # (TB, G)
    var_g = gss / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, member.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, member.T, preferred_element_type=jnp.float32)

    h = (x - mean_c[:, None, :]) * inv_c[:, None, :]
    h = h * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    h = h * jax.nn.sigmoid(h)
    h = h.astype(w_ref.dtype)

    hf = h.reshape(tb * l, c)        # merged-M matmuls
    c_out = w_ref.shape[-1]
    y1 = jnp.dot(hf, w_ref[1], preferred_element_type=jnp.float32)
    y0 = jnp.dot(hf, w_ref[0], preferred_element_type=jnp.float32)
    y2 = jnp.dot(hf, w_ref[2], preferred_element_type=jnp.float32)
    y0 = y0.reshape(tb, l, c_out)
    y2 = y2.reshape(tb, l, c_out)
    zero = jnp.zeros((tb, 1, c_out), jnp.float32)
    # SAME k=3: y[t] = h[t-1]@w0 + h[t]@w1 + h[t+1]@w2, zero at borders —
    # shifting after the matmul keeps every dot 8-row aligned
    y = y1.reshape(tb, l, c_out)
    y += jnp.concatenate([zero, y0[:, :-1]], axis=1)
    y += jnp.concatenate([y2[:, 1:], zero], axis=1)
    y += b_ref[0].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_groups", "eps", "interpret", "tb"))
def fused_gn_silu_conv3_tiled(x, scale, bias, w, b, num_groups: int,
                              eps: float = 1e-6,
                              interpret: bool | None = None, tb: int = 8):
    """Batch-tiled fused GN+SiLU+conv3: tb elements per Pallas program.
    Falls back to the largest tb' <= tb dividing B. See _kernel_tiled."""
    if interpret is None:
        from sleepgen.pallas_kernels.group_norm import _on_tpu

        interpret = not _on_tpu()
    bsz, l, c = x.shape
    c_out = w.shape[-1]
    while bsz % tb:
        tb //= 2
    # stay well inside the ~16 MB VMEM: x fp32 + h bf16 (6c bytes/row) and
    # three fp32 conv taps + bf16 out (~14*c_out bytes/row), plus weights
    while tb > 1 and tb * l * (6 * c + 14 * c_out) + 6 * c * c_out > 10 * 2**20:
        tb //= 2
    kern = functools.partial(_kernel_tiled, num_groups=num_groups, eps=eps)
    mspace = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        kern,
        grid=(bsz // tb,),
        in_specs=[
            pl.BlockSpec((tb, l, c), lambda i: (i, 0, 0), memory_space=mspace),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=mspace),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=mspace),
            pl.BlockSpec((3, c, c_out), lambda i: (0, 0, 0),
                         memory_space=mspace),
            pl.BlockSpec((1, c_out), lambda i: (0, 0), memory_space=mspace),
        ],
        out_specs=pl.BlockSpec((tb, l, c_out), lambda i: (i, 0, 0),
                               memory_space=mspace),
        out_shape=jax.ShapeDtypeStruct((bsz, l, c_out), x.dtype),
        interpret=interpret,
    )(x, scale[None, :], bias[None, :], w, b[None, :])


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "interpret"))
def fused_gn_silu_conv3(x, scale, bias, w, b, num_groups: int,
                        eps: float = 1e-6, interpret: bool | None = None):
    """Fused forward of GroupNorm+SiLU+Conv1d(k=3, SAME) over (B, L, C_in).

    w: (3, C_in, C_out); returns (B, L, C_out) in x.dtype. Inference
    prototype (no custom VJP — the training verdict on custom backward
    boundaries is already negative, BASELINE.md round-3).
    ``interpret=None``: Pallas on TPU, interpreter elsewhere (CPU tests)."""
    if interpret is None:
        from sleepgen.pallas_kernels.group_norm import _on_tpu

        interpret = not _on_tpu()
    bsz, l, c = x.shape
    c_out = w.shape[-1]
    kern = functools.partial(_kernel, num_groups=num_groups, eps=eps)
    mspace = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), memory_space=mspace),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=mspace),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=mspace),
            pl.BlockSpec((3, c, c_out), lambda i: (0, 0, 0),
                         memory_space=mspace),
            pl.BlockSpec((1, c_out), lambda i: (0, 0), memory_space=mspace),
        ],
        out_specs=pl.BlockSpec((1, l, c_out), lambda i: (i, 0, 0),
                               memory_space=mspace),
        out_shape=jax.ShapeDtypeStruct((bsz, l, c_out), x.dtype),
        interpret=interpret,
    )(x, scale[None, :], bias[None, :], w, b[None, :])
