"""Shared building blocks for sleepgen networks (flax.linen, NLC layout).

Every module here operates on (batch, length, channels) tensors — the
TPU-friendly channels-last layout that lets XLA tile 1-D convolutions onto
the MXU directly. The reference uses torch's (B, C, L); conversion happens
only at I/O boundaries (see sleepgen.data.transforms.to_ncl/from_ncl).

Mixed precision policy: parameters live in float32; modules take a
``dtype`` compute dtype (bfloat16 on TPU). Normalizations and softmax
always run in float32 — on TPU these are VPU ops and fp32 there costs
little while protecting the numerics the reference found fragile
(README.md:18, spectral-loss explosions).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def conv1d(
    features: int,
    kernel: int = 3,
    stride: int = 1,
    padding="SAME",
    use_bias: bool = True,
    dtype: Dtype = jnp.float32,
    name: str | None = None,
    zero_init: bool = False,
) -> nn.Conv:
    """1-D convolution on (B, L, C)."""
    kernel_init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(
        features=features,
        kernel_size=(kernel,),
        strides=(stride,),
        padding=padding,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init,
        name=name,
    )


class _GNParams(nn.Module):
    """scale/bias holder with nn.GroupNorm-compatible param names, so the
    fused path shares checkpoints with the unfused one."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


class ConvParams(nn.Module):
    """kernel/bias holder with nn.Conv-compatible param names and
    initializers. The fused GN+SiLU+conv3 resblock path (unet1d.py)
    consumes the conv weights directly in a Pallas kernel; declaring them
    through this module (named identically to the conv1d it replaces)
    keeps the parameter tree — and therefore every checkpoint — shared
    between the fused and unfused graphs."""

    features: int
    kernel: int = 3
    zero_init: bool = False

    @nn.compact
    def __call__(self, in_features: int):
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal())
        w = self.param("kernel", init, (self.kernel, in_features, self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return w, b


class GroupNorm32(nn.Module):
    """GroupNorm computed in float32 regardless of compute dtype.

    Parity: reference ``Normalize`` (GroupNorm eps=1e-6) at
    ``src/models/unet.py:71-74`` and MONAI AutoencoderKL's
    norm_num_groups GroupNorms.

    ``fuse_silu`` folds the SiLU that follows every ResBlock norm into the
    same op; ``use_pallas`` routes through the fused Pallas TPU kernel
    (sleepgen.pallas_kernels.group_norm) — identical math, same param tree.

    ``compute_dtype`` (inference fast-math): when set to the model's compute
    dtype (bf16), normalization/affine/SiLU run in that dtype while the
    statistics stay fp32 (flax's ``nn.GroupNorm`` always promotes mean/var
    to float32) — same param tree, no fp32 round-trips of the activation.
    Measured on v5e: the fp32 round-trips cost ~21% of DDIM sampling time
    (benches/ablate_unet.py). Training keeps the default full-fp32 path.
    """

    num_groups: int = 32
    epsilon: float = 1e-6
    fuse_silu: bool = False
    use_pallas: bool = False
    compute_dtype: Dtype | None = None
    # return the (scale, bias) affine params instead of computing the norm —
    # the fused resblock path (unet1d.py) feeds them to a Pallas kernel that
    # does norm+SiLU+conv in one VMEM residency. Same param tree either way.
    return_affine: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        if self.return_affine:
            return _GNParams(x.shape[-1], name="GroupNorm_0")()
        orig = x.dtype
        # sampling fast-math wins over the (fp32-only, off-by-default)
        # Pallas kernel — otherwise use_pallas_norm would silently disable
        # the +21% fast-math path
        if (self.use_pallas
                and (self.compute_dtype is None
                     or self.compute_dtype == jnp.float32)):
            from sleepgen.pallas_kernels import fused_group_norm_silu

            scale, bias = _GNParams(x.shape[-1], name="GroupNorm_0")()
            return fused_group_norm_silu(
                x, scale, bias, self.num_groups, self.epsilon, self.fuse_silu)
        if self.compute_dtype is not None and self.compute_dtype != jnp.float32:
            y = nn.GroupNorm(
                num_groups=self.num_groups,
                epsilon=self.epsilon,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
            )(x)
            return nn.silu(y) if self.fuse_silu else y
        y = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        if self.fuse_silu:
            y = nn.silu(y)
        return y.astype(orig)


def nearest_upsample_1d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor upsample along L for (B, L, C)."""
    return jnp.repeat(x, factor, axis=1)


def avg_pool_1d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """Average pool along L for (B, L, C)."""
    return nn.avg_pool(x, window_shape=(window,), strides=(stride,), padding="VALID")


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal timestep embeddings, [cos | sin] ordering.

    Parity: reference ``src/models/unet.py:12-36`` (cos first, then sin;
    zero-pad if dim is odd). Computed in float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class SelfAttention1d(nn.Module):
    """Full self-attention over the length axis of (B, L, C).

    Single qkv 1x1 projection, per-head scaling by 1/sqrt(sqrt(d)) applied
    to both q and k, softmax in float32, zero-initialized output
    projection — parity with ``QKVAttentionLegacy``/``AttentionBlock``
    (reference ``src/models/unet.py:97-174``). Residual is added by the
    caller's wrapper when needed.

    ``mixed_precision`` (inference fast-math): run the QK/AV matmuls with
    bf16 inputs and fp32 MXU accumulation (``preferred_element_type``)
    instead of casting q/k to fp32 — softmax stays fp32. fp32 matmuls run
    at 1/8 MXU rate on v5e; measured ~18% of DDIM sampling time
    (benches/ablate_unet.py). Training keeps the fp32-einsum default.
    """

    num_heads: int = 1
    dtype: Dtype = jnp.float32
    zero_out: bool = True
    kv_block_size: int = 0  # >0: blockwise (flash-style) attention
    quantized: bool = False  # int8 qkv/proj projections (sleepgen.nn.quant)
    mixed_precision: bool = False

    def _proj(self, features: int, name: str, zero_init: bool = False):
        if self.quantized:
            from sleepgen.nn.quant import QuantConv1d

            return QuantConv1d(features, 1, dtype=self.dtype, name=name)
        return conv1d(features, kernel=1, dtype=self.dtype, name=name,
                      zero_init=zero_init)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, c = x.shape
        h = self.num_heads
        assert c % h == 0, f"channels {c} not divisible by heads {h}"
        d = c // h
        qkv = self._proj(3 * c, "qkv")(x)
        qkv = qkv.reshape(b, l, h, 3 * d)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(d, jnp.float32)))
        if self.mixed_precision:
            q = (q.astype(jnp.float32) * scale).astype(self.dtype)
            k = (k.astype(jnp.float32) * scale).astype(self.dtype)
        else:
            q = q.astype(jnp.float32) * scale
            k = k.astype(jnp.float32) * scale
        if self.kv_block_size and l > self.kv_block_size:
            from sleepgen.nn.blockwise_attention import blockwise_attention

            out = blockwise_attention(q.astype(jnp.float32),
                                      k.astype(jnp.float32), v,
                                      self.kv_block_size)
            out = out.astype(self.dtype).reshape(b, l, c)
        else:
            logits = jnp.einsum("bihd,bjhd->bhij", q, k,
                                preferred_element_type=jnp.float32)
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhij,bjhd->bihd", weights, v.astype(self.dtype))
            out = out.reshape(b, l, c)
        return self._proj(c, "proj_out", zero_init=self.zero_out)(out)


class AttentionBlock1d(nn.Module):
    """norm -> attention -> residual add (reference unet.py:132-174)."""

    num_heads: int = 1
    num_groups: int = 32
    dtype: Dtype = jnp.float32
    use_pallas_norm: bool = False
    quantized: bool = False
    fast_math: bool = False  # inference-only: bf16 GN compute + matmuls
    kv_block_size: int = 0  # >0: blockwise attention for long windows

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gn_dtype = self.dtype if self.fast_math else None
        h = GroupNorm32(self.num_groups, use_pallas=self.use_pallas_norm,
                        compute_dtype=gn_dtype)(x)
        h = SelfAttention1d(num_heads=self.num_heads, dtype=self.dtype,
                            quantized=self.quantized,
                            mixed_precision=self.fast_math,
                            kv_block_size=self.kv_block_size)(h)
        return x + h
