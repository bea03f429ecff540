"""USleep (Perslev et al. 2021) — sleep-staging U-Net, used two ways:
as the FID feature extractor (bottleneck features, reference
``src/compute_fid.py:354-389``) and as a downstream sleep-stage decoder.

Parity target: reference ``src/models/usleep.py:101-287`` (braindecode
vendored copy): depth-12 encoder of [conv-k7-same -> ELU -> BatchNorm ->
(pad-if-odd) -> maxpool2], a 'bottom' conv block whose output is the FID
feature space, and a decoder of [upsample2 -> conv-k2 -> ELU -> BN ->
crop/concat skip -> conv-k7 -> ELU -> BN], ending in a 1x1-conv classifier
head with tanh + avg-pool over the window.

Channel widths follow the reference's exact integer-truncation recurrence
(usleep.py:184-188): ch_{i+1} = int(nf_i * sqrt(1.67)),
nf_{i+1} = int(nf_i * sqrt(2)), nf_0 = 5.

Note the reference's pad-if-odd uses ConstantPad1d(1) which pads both
sides (+2, parity preserved) before a flooring maxpool — we reproduce the
same arithmetic so feature shapes match exactly.
"""
from __future__ import annotations

import math
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sleepgen.nn.layers import Dtype, conv1d, nearest_upsample_1d


def usleep_channels(in_chans: int, depth: int, n_time_filters: int = 5,
                    complexity_factor: float = 1.67) -> List[int]:
    channels = [in_chans]
    nf = n_time_filters
    for _ in range(depth + 1):
        channels.append(int(nf * math.sqrt(complexity_factor)))
        nf = int(nf * math.sqrt(2))
    return channels


def _bn(name: str, train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32, name=name)


class USleep(nn.Module):
    in_chans: int = 2
    sfreq: float = 100.0
    depth: int = 12
    n_time_filters: int = 5
    complexity_factor: float = 1.67
    with_skip_connection: bool = True
    n_classes: int = 5
    input_size_s: float = 30.0
    time_conv_size_s: float = 9 / 128
    apply_softmax: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: (B, L, C). Returns (y_pred, decoded, bottom) like the
        reference's ``forward`` (usleep.py:257-286)."""
        k = int(np.round(self.time_conv_size_s * self.sfreq))
        assert k % 2 == 1, "time_conv_size must be odd"
        input_size = int(np.ceil(self.input_size_s * self.sfreq))
        chans = usleep_channels(self.in_chans, self.depth,
                                self.n_time_filters, self.complexity_factor)

        # encoder
        residuals = []
        h = x.astype(self.dtype)
        for i in range(self.depth):
            h = conv1d(chans[i + 1], k, dtype=self.dtype, name=f"enc_{i}_conv")(h)
            h = nn.elu(h)
            h = _bn(f"enc_{i}_bn", train)(h)
            residuals.append(h)
            if h.shape[1] % 2:
                h = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
            h = nn.max_pool(h, (2,), strides=(2,), padding="VALID")

        # bottom — the FID feature space (compute_fid.py:383-389)
        h = conv1d(chans[-1], k, dtype=self.dtype, name="bottom_conv")(h)
        h = nn.elu(h)
        h = _bn("bottom_bn", train)(h)
        bottom = h

        # decoder
        rev = list(reversed(chans))
        for i in range(self.depth):
            h = nearest_upsample_1d(h, 2)
            h = conv1d(rev[i + 1], 2, padding=[(0, 1)], dtype=self.dtype,
                       name=f"dec_{i}_preskip_conv")(h)
            h = nn.elu(h)
            h = _bn(f"dec_{i}_preskip_bn", train)(h)
            if self.with_skip_connection:
                res = residuals[-(i + 1)]
                m = min(h.shape[1], res.shape[1])
                h = jnp.concatenate([h[:, :m], res[:, :m]], axis=-1)
            h = conv1d(rev[i + 1], k, dtype=self.dtype, name=f"dec_{i}_postskip_conv")(h)
            h = nn.elu(h)
            h = _bn(f"dec_{i}_postskip_bn", train)(h)
        decoded = h

        # classifier head
        h = conv1d(chans[1], 1, dtype=self.dtype, name="clf_conv_1")(h)
        h = jnp.tanh(h)
        h = nn.avg_pool(h, (input_size,), strides=(input_size,), padding="VALID")
        h = conv1d(self.n_classes, 1, dtype=self.dtype, name="clf_conv_2")(h)
        h = nn.elu(h)
        y = conv1d(self.n_classes, 1, dtype=self.dtype, name="clf_conv_3")(h)
        if self.apply_softmax:
            y = nn.softmax(y, axis=-1)
        if y.shape[1] == 1:
            y = y[:, 0, :]
        return y, decoded, bottom
