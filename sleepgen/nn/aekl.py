"""1-D AutoencoderKL (VAE) — the stage-1 model of the latent diffusion stack.

Parity target: MONAI-generative ``AutoencoderKL`` with the reference's
configuration (``config/config_aekl_eeg.yaml:20-31`` — spatial_dims=1,
norm_num_groups=1, attention_levels all False, no nonlocal attention,
num_channels in {[32,32,64], [2,2,4], [4,4,16], [4,16,32]},
latent_channels in {1,3}); instantiated at
``src/train_autoencoderkl.py:129-133``. The reference's own
re-implementation (``src/models/ae_kl.py``) documents the block math:
ResBlock = GN -> SiLU -> conv3 -> GN -> SiLU -> conv3 (+ 1x1 skip on
channel change), Downsample = asymmetric right-pad + stride-2 valid conv
(``ae_kl.py:33-45``), Upsample = nearest x2 + conv3.

TPU re-design: channels-last (B, L, C); stride-2 downsampling keeps the
exact asymmetric padding so 3072 -> 1536 -> 768 lengths match the
reference's latent geometry; log-variance clamp [-30, 20]
(``ae_kl.py:264``) is kept for parity.

API surface mirrors the reference's usage sites:
  encode / sampling / decode / reconstruct (compute_mmds.py:495),
  encode_stage_2_inputs (train_ldm.py:148),
  decode_stage_2_outputs (sample_trials.py:166).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sleepgen.nn.layers import (
    AttentionBlock1d,
    Dtype,
    GroupNorm32,
    conv1d,
    nearest_upsample_1d,
)


class AEResBlock(nn.Module):
    out_channels: int
    num_groups: int = 1
    dtype: Dtype = jnp.float32
    use_pallas_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = GroupNorm32(self.num_groups, fuse_silu=True,
                        use_pallas=self.use_pallas_norm)(x)
        h = conv1d(self.out_channels, 3, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(self.num_groups, fuse_silu=True,
                        use_pallas=self.use_pallas_norm)(h)
        h = conv1d(self.out_channels, 3, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = conv1d(self.out_channels, 1, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    """Right-pad by one then stride-2 valid conv: ceil(L/2) output length
    (reference ae_kl.py:33-45 / MONAI 1-D Downsample parity)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
        return conv1d(self.channels, 3, stride=2, padding="VALID",
                      dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nearest_upsample_1d(x, 2)
        return conv1d(self.channels, 3, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    num_channels: Sequence[int]
    latent_channels: int
    num_res_blocks: int = 2
    num_groups: int = 1
    attention_levels: Sequence[bool] = (False, False, False)
    with_nonlocal_attn: bool = False
    dtype: Dtype = jnp.float32
    use_pallas_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = self.num_channels
        h = conv1d(ch[0], 3, dtype=self.dtype, name="conv_in")(x)
        for level, out_ch in enumerate(ch):
            for i in range(self.num_res_blocks):
                h = AEResBlock(out_ch, self.num_groups, self.dtype,
                               use_pallas_norm=self.use_pallas_norm,
                               name=f"down_{level}_res_{i}")(h)
                if self.attention_levels[level]:
                    h = AttentionBlock1d(1, self.num_groups, self.dtype,
                                         name=f"down_{level}_attn_{i}")(h)
            if level != len(ch) - 1:
                h = Downsample(out_ch, self.dtype, name=f"down_{level}_downsample")(h)
        if self.with_nonlocal_attn:
            h = AEResBlock(ch[-1], self.num_groups, self.dtype, name="mid_res_1")(h)
            h = AttentionBlock1d(1, self.num_groups, self.dtype, name="mid_attn")(h)
            h = AEResBlock(ch[-1], self.num_groups, self.dtype, name="mid_res_2")(h)
        h = GroupNorm32(self.num_groups, name="norm_out")(h)
        return conv1d(self.latent_channels, 3, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    num_channels: Sequence[int]  # encoder order; reversed internally
    out_channels: int = 1
    num_res_blocks: int = 2
    num_groups: int = 1
    attention_levels: Sequence[bool] = (False, False, False)
    with_nonlocal_attn: bool = False
    dtype: Dtype = jnp.float32
    use_pallas_norm: bool = False

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        rev = list(reversed(self.num_channels))
        rev_attn = list(reversed(self.attention_levels))
        h = conv1d(rev[0], 3, dtype=self.dtype, name="conv_in")(z)
        if self.with_nonlocal_attn:
            h = AEResBlock(rev[0], self.num_groups, self.dtype, name="mid_res_1")(h)
            h = AttentionBlock1d(1, self.num_groups, self.dtype, name="mid_attn")(h)
            h = AEResBlock(rev[0], self.num_groups, self.dtype, name="mid_res_2")(h)
        for level, out_ch in enumerate(rev):
            for i in range(self.num_res_blocks):
                h = AEResBlock(out_ch, self.num_groups, self.dtype,
                               use_pallas_norm=self.use_pallas_norm,
                               name=f"up_{level}_res_{i}")(h)
                if rev_attn[level]:
                    h = AttentionBlock1d(1, self.num_groups, self.dtype,
                                         name=f"up_{level}_attn_{i}")(h)
            if level != len(rev) - 1:
                h = Upsample(out_ch, self.dtype, name=f"up_{level}_upsample")(h)
        h = GroupNorm32(self.num_groups, name="norm_out")(h)
        return conv1d(self.out_channels, 3, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """VAE over (B, L, 1) EEG windows; latent is (B, L/4, latent_channels)."""

    num_channels: Sequence[int] = (32, 32, 64)
    latent_channels: int = 1
    in_channels: int = 1
    out_channels: int = 1
    num_res_blocks: int = 2
    norm_num_groups: int = 1
    attention_levels: Sequence[bool] = (False, False, False)
    with_encoder_nonlocal_attn: bool = False
    with_decoder_nonlocal_attn: bool = False
    dtype: Dtype = jnp.float32
    use_pallas_norm: bool = False

    def setup(self):
        self.encoder = Encoder(
            num_channels=self.num_channels,
            latent_channels=self.latent_channels,
            num_res_blocks=self.num_res_blocks,
            num_groups=self.norm_num_groups,
            attention_levels=self.attention_levels,
            with_nonlocal_attn=self.with_encoder_nonlocal_attn,
            dtype=self.dtype,
            use_pallas_norm=self.use_pallas_norm,
        )
        self.decoder = Decoder(
            num_channels=self.num_channels,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            num_groups=self.norm_num_groups,
            attention_levels=self.attention_levels,
            with_nonlocal_attn=self.with_decoder_nonlocal_attn,
            dtype=self.dtype,
            use_pallas_norm=self.use_pallas_norm,
        )
        self.quant_conv_mu = conv1d(self.latent_channels, 1, dtype=self.dtype,
                                    name="quant_conv_mu")
        self.quant_conv_log_sigma = conv1d(self.latent_channels, 1, dtype=self.dtype,
                                           name="quant_conv_log_sigma")
        self.post_quant_conv = conv1d(self.latent_channels, 1, dtype=self.dtype,
                                      name="post_quant_conv")

    def encode(self, x):
        h = self.encoder(x)
        z_mu = self.quant_conv_mu(h)
        z_log_var = jnp.clip(self.quant_conv_log_sigma(h).astype(jnp.float32), -30.0, 20.0)
        z_sigma = jnp.exp(0.5 * z_log_var).astype(h.dtype)
        return z_mu, z_sigma

    def sampling(self, z_mu, z_sigma, rng):
        eps = jax.random.normal(rng, z_sigma.shape, z_sigma.dtype)
        return z_mu + eps * z_sigma

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def reconstruct(self, x):
        """Deterministic reconstruction through the posterior mean
        (reference compute_mmds.py:495)."""
        z_mu, _ = self.encode(x)
        return self.decode(z_mu)

    def encode_stage_2_inputs(self, x, rng):
        z_mu, z_sigma = self.encode(x)
        return self.sampling(z_mu, z_sigma, rng)

    def decode_stage_2_outputs(self, z):
        return self.decode(z)

    def __call__(self, x, rng):
        z_mu, z_sigma = self.encode(x)
        z = self.sampling(z_mu, z_sigma, rng)
        return self.decode(z), z_mu, z_sigma
