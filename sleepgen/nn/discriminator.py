"""1-D PatchGAN discriminator for the AEKL adversarial loss.

Parity target: MONAI-generative ``PatchDiscriminator(spatial_dims=1,
num_layers_d=3, num_channels=64, kernel_size=3, norm="BATCH", bias=False,
padding=1)`` — reference ``src/train_autoencoderkl.py:135-137`` and
``config/config_aekl_eeg.yaml:33-43``. Structure:
  initial: conv k3 s2 (bias) -> LeakyReLU(0.2)            1 -> 64
  layer l: conv k3 s2/s1(last) (no bias) -> BN -> LReLU   64->128->256->512
  final:   conv k3 s1 (bias), logits map                  512 -> 1
``forward`` returns the per-stage feature list with logits last, matching
the reference's ``discriminator(x)[-1]`` call sites
(train_autoencoderkl.py:213,225-227).

The legacy v1 discriminator (kernel 4, reference src/models/discriminator.py)
is provided as ``DiscriminatorV1``.

BatchNorm statistics live in a ``batch_stats`` collection; training steps
thread it as mutable state.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

from sleepgen.nn.layers import Dtype, conv1d


class PatchDiscriminator(nn.Module):
    num_layers_d: int = 3
    num_channels: int = 64
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> List[jnp.ndarray]:
        k = self.kernel_size
        outs = []
        h = conv1d(self.num_channels, k, stride=2, dtype=self.dtype,
                   name="initial_conv")(x)
        h = nn.leaky_relu(h, 0.2)
        outs.append(h)
        ch = self.num_channels
        for l in range(self.num_layers_d):
            ch *= 2
            stride = 1 if l == self.num_layers_d - 1 else 2
            h = conv1d(ch, k, stride=stride, use_bias=False, dtype=self.dtype,
                       name=f"layer_{l}_conv")(h)
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                name=f"layer_{l}_bn",
            )(h)
            h = nn.leaky_relu(h, 0.2)
            outs.append(h)
        logits = conv1d(self.out_channels, k, stride=1, dtype=self.dtype,
                        name="final_conv")(h)
        outs.append(logits)
        return outs


class DiscriminatorV1(nn.Module):
    """Legacy v1 PatchGAN (kernel 4, stride 2) — reference
    ``src/models/discriminator.py:15-81``; kept for the first-generation
    pipeline (SURVEY.md §1 'two generations coexist')."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        pad = [(1, 1)]
        h = conv1d(self.ndf, 4, stride=2, padding=pad, dtype=self.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2**n, 8)
            h = conv1d(self.ndf * mult, 4, stride=2, padding=pad, use_bias=False,
                       dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32)(h)
            h = nn.leaky_relu(h, 0.2)
        mult = min(2**self.n_layers, 8)
        h = conv1d(self.ndf * mult, 4, stride=1, padding=pad, use_bias=False,
                   dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32)(h)
        h = nn.leaky_relu(h, 0.2)
        return conv1d(1, 4, stride=1, padding=pad, dtype=self.dtype)(h)
