"""1-D diffusion UNet (guided-diffusion lineage), TPU-native.

Parity target: reference ``UNetModel`` (``src/models/unet.py:330-563``)
with the LDM/DM configuration (``config/config_ldm.yaml:28-42``):
image_size 768, model_channels 128, channel_mult [1,2,4],
num_res_blocks 2, attention_resolutions [8,4] (=> attention at ds=4 and
in the middle block), num_heads 1, resblock_updown True,
use_scale_shift_norm False.

Structure (parity by construction):
  * sinusoidal timestep embedding (cos|sin) -> Dense(4*mc) -> SiLU -> Dense
    (unet.py:12-36, 372-377)
  * input column: conv_in; per level: num_res_blocks x [ResBlock (+Attn)];
    a down ResBlock between levels (resblock_updown) (unet.py:382-436)
  * middle: ResBlock, Attn, ResBlock (unet.py:439-457)
  * output column: (num_res_blocks+1) x [ResBlock on skip-concat (+Attn)],
    an up ResBlock at level boundaries (unet.py:460-499)
  * out: GN -> SiLU -> zero-init conv (unet.py:501-505)

Differences by design (documented, not accidental):
  * channels-last (B, L, C) layout for MXU-friendly convs;
  * the runtime skip-length crop hack (unet.py:541-553) is designed away:
    lengths must divide by 2**(levels-1), which holds for 768 and 3072
    (SURVEY.md §7 'hard parts'); asserted at trace time;
  * dropout omitted from the graph when 0.0 (all reference configs use 0).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from sleepgen.nn.layers import (
    AttentionBlock1d,
    ConvParams,
    Dtype,
    GroupNorm32,
    avg_pool_1d,
    conv1d,
    nearest_upsample_1d,
    timestep_embedding,
)


def _make_conv(quantized: bool, features: int, kernel: int, dtype,
               name: str, zero_init: bool = False):
    """conv1d, or its int8 drop-in when running the quantized inference
    path (sleepgen.nn.quant; zero_init is irrelevant there — quantized
    params are converted from trained weights, never initialized)."""
    if quantized:
        from sleepgen.nn.quant import QuantConv1d

        return QuantConv1d(features, kernel, dtype=dtype, name=name)
    return conv1d(features, kernel, dtype=dtype, name=name,
                  zero_init=zero_init)


class TimestepResBlock(nn.Module):
    """ResBlock with additive (or scale-shift) timestep conditioning and
    optional built-in up/down resampling (reference unet.py:227-327)."""

    out_channels: int
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    num_groups: int = 32
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas_norm: bool = False
    quantized: bool = False
    fast_math: bool = False  # inference-only: bf16 GN compute (fp32 stats)
    # inference-only: run each GroupNorm->SiLU->conv3 chain as ONE Pallas
    # kernel (sleepgen.pallas_kernels.fused_resblock) — one HBM read, one
    # write, fp32 stats, compute-dtype MXU matmuls. Same param tree as the
    # unfused graph (ConvParams/_GNParams declare identically-named params),
    # so any checkpoint runs either way.
    use_fused_resblock: bool = False

    def _fused_chain(self, x, gn_params_fn, conv_name, out_ch,
                     zero_init=False):
        from sleepgen.pallas_kernels.fused_resblock import (
            fused_gn_silu_conv3_tiled)

        scale, bias = gn_params_fn(x)
        w, b = ConvParams(out_ch, 3, zero_init=zero_init,
                          name=conv_name)(x.shape[-1])
        return fused_gn_silu_conv3_tiled(x.astype(self.dtype), scale, bias,
                                         w.astype(self.dtype), b,
                                         self.num_groups)

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        out_ch = self.out_channels
        gn_dtype = self.dtype if self.fast_math else None
        # the fused kernel handles the plain norm->silu->conv3 chain only:
        # up/down resampling sits between norm and conv in chain 1, and
        # scale-shift/dropout break chain 2 (no reference config uses them)
        fuse1 = self.use_fused_resblock and not (self.up or self.down)
        fuse2 = (self.use_fused_resblock and not self.use_scale_shift_norm
                 and self.dropout == 0.0)

        def gn(fuse_silu=True, return_affine=False):
            return GroupNorm32(self.num_groups, fuse_silu=fuse_silu,
                               use_pallas=self.use_pallas_norm,
                               compute_dtype=gn_dtype,
                               return_affine=return_affine)

        if fuse1:
            h = self._fused_chain(x, lambda v: gn(return_affine=True)(v),
                                  "in_conv", out_ch)
        else:
            h = gn()(x)
            if self.up:
                h = nearest_upsample_1d(h)
                x = nearest_upsample_1d(x)
            elif self.down:
                h = avg_pool_1d(h)
                x = avg_pool_1d(x)
            h = _make_conv(self.quantized, out_ch, 3, self.dtype, "in_conv")(h)

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype, param_dtype=jnp.float32, name="emb_proj",
        )(nn.silu(emb))
        emb_out = emb_out[:, None, :]  # broadcast over L

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(self.num_groups,
                            use_pallas=self.use_pallas_norm,
                            compute_dtype=gn_dtype)(h) * (1 + scale) + shift
            h = nn.silu(h)
            if self.dropout > 0.0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = _make_conv(self.quantized, out_ch, 3, self.dtype, "out_conv",
                           zero_init=True)(h)
        elif fuse2:
            h = self._fused_chain(h + emb_out,
                                  lambda v: gn(return_affine=True)(v),
                                  "out_conv", out_ch, zero_init=True)
        else:
            h = h + emb_out
            h = gn()(h)
            if self.dropout > 0.0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = _make_conv(self.quantized, out_ch, 3, self.dtype, "out_conv",
                           zero_init=True)(h)

        if x.shape[-1] != out_ch:
            x = _make_conv(self.quantized, out_ch, 1, self.dtype, "skip_conv")(x)
        return x + h


class UNet1d(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    model_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (8, 4)
    num_heads: int = 1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = True
    conv_resample: bool = True
    num_groups: int = 32
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas_norm: bool = False
    num_classes: int = 0  # >0: class-conditional (reference unet.py:379-380)
    # int8 inference path (sampling only): apply with params converted by
    # sleepgen.nn.quant.quantize_unet_params
    quantized: bool = False
    # inference fast-math (sampling only): GroupNorm compute and attention
    # matmuls in the compute dtype (statistics / softmax / accumulation stay
    # fp32). Same param tree as the strict path; quality-gated by the FID
    # harness. Measured +~45% DDIM throughput on v5e (benches/ablate_unet.py).
    fast_math: bool = False
    # >0: blockwise (flash-style, online-softmax) attention when the
    # attention length exceeds this — makes window length a config beyond
    # the reference's fixed 3072 (SURVEY.md §5 long-context)
    kv_block_size: int = 0
    # inference-only: fuse every GroupNorm->SiLU->conv3 chain into one
    # Pallas VMEM-resident kernel (fused_resblock.py). Checkpoint-compatible
    # with the unfused graph; measured on v5e in BASELINE.md round-3.
    use_fused_resblock: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray,
                 y: jnp.ndarray | None = None,
                 deterministic: bool = True) -> jnp.ndarray:
        mc = self.model_channels
        levels = len(self.channel_mult)
        assert x.shape[1] % (2 ** (levels - 1)) == 0, (
            f"length {x.shape[1]} must divide 2**{levels - 1}; the reference "
            "needed a runtime crop hack here (unet.py:541-553) — we require "
            "exact geometry instead")

        t_emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(4 * mc, dtype=self.dtype, param_dtype=jnp.float32,
                       name="time_dense_1")(t_emb.astype(self.dtype))
        emb = nn.Dense(4 * mc, dtype=self.dtype, param_dtype=jnp.float32,
                       name="time_dense_2")(nn.silu(emb))
        if self.num_classes:
            # label embedding added to the time embedding (unet.py:531-533).
            # y < 0 is the CFG null label: its embedding contribution is
            # masked to zero (same param tree as a plain conditional model),
            # so one network serves both the conditional and unconditional
            # branches of classifier-free guidance.
            assert y is not None, "class-conditional model needs labels y"
            l_emb = nn.Embed(self.num_classes, 4 * mc, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="label_emb")(jnp.maximum(y, 0))
            emb = emb + jnp.where((y >= 0)[:, None], l_emb,
                                  jnp.zeros_like(l_emb))

        def res(h, e, out_ch, name, **kw):
            return TimestepResBlock(
                out_channels=out_ch,
                use_scale_shift_norm=self.use_scale_shift_norm,
                num_groups=self.num_groups,
                dropout=self.dropout,
                dtype=self.dtype,
                use_pallas_norm=self.use_pallas_norm,
                quantized=self.quantized,
                fast_math=self.fast_math,
                use_fused_resblock=self.use_fused_resblock,
                name=name,
                **kw,
            )(h, e, deterministic)

        def attn(h, name):
            return AttentionBlock1d(self.num_heads, self.num_groups,
                                    self.dtype,
                                    use_pallas_norm=self.use_pallas_norm,
                                    quantized=self.quantized,
                                    fast_math=self.fast_math,
                                    kv_block_size=self.kv_block_size,
                                    name=name)(h)

        h = _make_conv(self.quantized, mc, 3, self.dtype,
                       "conv_in")(x.astype(self.dtype))
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = res(h, emb, mult * mc, f"down_{level}_res_{i}")
                if ds in self.attention_resolutions:
                    h = attn(h, f"down_{level}_attn_{i}")
                hs.append(h)
            if level != levels - 1:
                if self.resblock_updown:
                    h = res(h, emb, h.shape[-1], f"down_{level}_downres", down=True)
                elif self.conv_resample:
                    h = conv1d(h.shape[-1], 3, stride=2, dtype=self.dtype,
                               name=f"down_{level}_downconv")(h)
                else:
                    # conv_resample=False: parameter-free avg-pool, the
                    # reference Downsample's use_conv=False branch
                    # (models/unet.py:177-199)
                    h = nn.avg_pool(h, window_shape=(2,), strides=(2,))
                hs.append(h)
                ds *= 2

        h = res(h, emb, h.shape[-1], "mid_res_1")
        h = attn(h, "mid_attn")
        h = res(h, emb, h.shape[-1], "mid_res_2")

        for level in reversed(range(levels)):
            mult = self.channel_mult[level]
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = res(h, emb, mult * mc, f"up_{level}_res_{i}")
                if ds in self.attention_resolutions:
                    h = attn(h, f"up_{level}_attn_{i}")
                if level > 0 and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res(h, emb, h.shape[-1], f"up_{level}_upres", up=True)
                    else:
                        h = nearest_upsample_1d(h)
                        if self.conv_resample:  # Upsample use_conv
                            # (models/unet.py:202-224); False = nearest only
                            h = conv1d(h.shape[-1], 3, dtype=self.dtype,
                                       name=f"up_{level}_upconv")(h)
                    ds //= 2
        assert not hs, "skip stack imbalance"

        h = GroupNorm32(self.num_groups, fuse_silu=True,
                        use_pallas=self.use_pallas_norm,
                        compute_dtype=self.dtype if self.fast_math else None)(h)
        out = _make_conv(self.quantized, self.out_channels, 3, self.dtype,
                         "conv_out", zero_init=True)(h)
        return out.astype(jnp.float32)
