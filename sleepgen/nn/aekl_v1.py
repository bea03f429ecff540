"""First-generation custom AutoencoderKL (the reference's own VAE).

Parity target: reference ``src/models/ae_kl.py`` — the v1 pipeline's
stage-1 model (``src/first_version/train_encoder.py``), architecturally a
CompVis-style VAE that differs from the MONAI main-path model
(sleepgen.nn.aekl) in:
  * GroupNorm with 32 groups (ae_kl.py:16-17) instead of norm_num_groups=1;
  * n_channels x ch_mult channel progression with per-resolution attention
    (ae_kl.py:154-165) instead of an explicit num_channels list;
  * mandatory non-local attention bottleneck (ae_kl.py:167-170);
  * a z_channels bottleneck with separate embed_dim quant convs
    (ae_kl.py:254-257).

Also includes ``VAEDownsample`` — the maxpool/upsample baseline
(ae_kl.py:303-320).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sleepgen.nn.aekl import AEResBlock, Downsample, Upsample
from sleepgen.nn.layers import AttentionBlock1d, Dtype, GroupNorm32, conv1d


class EncoderV1(nn.Module):
    in_channels: int = 1
    n_channels: int = 64
    z_channels: int = 3
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    resolution: int = 3072
    attn_resolutions: Sequence[int] = ()
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        curr_res = self.resolution
        h = conv1d(self.n_channels, 3, dtype=self.dtype, name="conv_in")(x)
        for i, mult in enumerate(self.ch_mult):
            out_ch = self.n_channels * mult
            for j in range(self.num_res_blocks):
                h = AEResBlock(out_ch, self.num_groups, self.dtype,
                               name=f"down_{i}_res_{j}")(h)
                if curr_res in self.attn_resolutions:
                    h = AttentionBlock1d(1, self.num_groups, self.dtype,
                                         name=f"down_{i}_attn_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = Downsample(out_ch, self.dtype, name=f"down_{i}_downsample")(h)
                curr_res //= 2
        h = AEResBlock(h.shape[-1], self.num_groups, self.dtype, name="mid_res_1")(h)
        h = AttentionBlock1d(1, self.num_groups, self.dtype, name="mid_attn")(h)
        h = AEResBlock(h.shape[-1], self.num_groups, self.dtype, name="mid_res_2")(h)
        h = GroupNorm32(self.num_groups, name="norm_out")(h)
        return conv1d(self.z_channels, 3, dtype=self.dtype, name="conv_out")(h)


class DecoderV1(nn.Module):
    n_channels: int = 64
    z_channels: int = 3
    out_channels: int = 1
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    resolution: int = 3072
    attn_resolutions: Sequence[int] = ()
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        block_in = self.n_channels * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (len(self.ch_mult) - 1)
        h = conv1d(block_in, 3, dtype=self.dtype, name="conv_in")(z)
        h = AEResBlock(block_in, self.num_groups, self.dtype, name="mid_res_1")(h)
        h = AttentionBlock1d(1, self.num_groups, self.dtype, name="mid_attn")(h)
        h = AEResBlock(block_in, self.num_groups, self.dtype, name="mid_res_2")(h)
        for idx, i in enumerate(reversed(range(len(self.ch_mult)))):
            out_ch = self.n_channels * self.ch_mult[i]
            for j in range(self.num_res_blocks):
                h = AEResBlock(out_ch, self.num_groups, self.dtype,
                               name=f"up_{i}_res_{j}")(h)
                if curr_res in self.attn_resolutions:
                    h = AttentionBlock1d(1, self.num_groups, self.dtype,
                                         name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = Upsample(out_ch, self.dtype, name=f"up_{i}_upsample")(h)
                curr_res *= 2
        h = GroupNorm32(self.num_groups, name="norm_out")(h)
        return conv1d(self.out_channels, 3, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKLV1(nn.Module):
    embed_dim: int = 3
    in_channels: int = 1
    out_channels: int = 1
    n_channels: int = 64
    z_channels: int = 3
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    resolution: int = 3072
    attn_resolutions: Sequence[int] = ()
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(n_channels=self.n_channels, z_channels=self.z_channels,
                  ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
                  resolution=self.resolution,
                  attn_resolutions=self.attn_resolutions,
                  num_groups=self.num_groups, dtype=self.dtype)
        self.encoder = EncoderV1(in_channels=self.in_channels, **kw)
        self.decoder = DecoderV1(out_channels=self.out_channels, **kw)
        self.quant_conv_mu = conv1d(self.embed_dim, 1, dtype=self.dtype,
                                    name="quant_conv_mu")
        self.quant_conv_log_sigma = conv1d(self.embed_dim, 1, dtype=self.dtype,
                                           name="quant_conv_log_sigma")
        self.post_quant_conv = conv1d(self.z_channels, 1, dtype=self.dtype,
                                      name="post_quant_conv")

    def encode(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self.encoder(x)
        z_mu = self.quant_conv_mu(h)
        z_log_var = jnp.clip(
            self.quant_conv_log_sigma(h).astype(jnp.float32), -30.0, 20.0)
        return z_mu, jnp.exp(0.5 * z_log_var).astype(h.dtype)

    def sampling(self, z_mu, z_sigma, rng):
        return z_mu + jax.random.normal(rng, z_sigma.shape, z_sigma.dtype) * z_sigma

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def get_ldm_inputs(self, x, rng):
        z_mu, z_sigma = self.encode(x)
        return self.sampling(z_mu, z_sigma, rng)

    def reconstruct_ldm_outputs(self, z):
        return self.decode(z)

    def __call__(self, x, rng):
        z_mu, z_sigma = self.encode(x)
        z = self.sampling(z_mu, z_sigma, rng)
        return self.decode(z), z_mu, z_sigma


class VAEDownsample(nn.Module):
    """MaxPool(4)/nearest-up(4) non-learned baseline (ae_kl.py:303-320;
    bilinear upsample there -> linear interpolation in 1-D)."""

    factor: int = 4

    def get_ldm_inputs(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.max_pool(x, (self.factor,), strides=(self.factor,), padding="VALID")

    def reconstruct_ldm_outputs(self, z: jnp.ndarray) -> jnp.ndarray:
        b, l, c = z.shape
        return jax.image.resize(z, (b, l * self.factor, c), method="linear")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.get_ldm_inputs(x)
