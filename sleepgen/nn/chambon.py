"""SleepStagerChambon2018 + time-distributed sequence head.

Parity target: braindecode's ``SleepStagerChambon2018`` as configured by
``src/testing/run_sleep_decode.py:174-190``: apply_batch_norm=True,
dropout 0.9, pad_size_s 0.1, return_feats -> a ``TimeDistributed``
3-window wrapper with a flatten/dropout(0.5)/linear head. Chambon et al.
2018 architecture: optional spatial (cross-channel) conv, then two
[conv(k=0.5 s) -> BN -> ReLU -> maxpool(0.125 s)] stages, features
flattened.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from sleepgen.nn.layers import Dtype, conv1d


class Im2ColConv1d(nn.Module):
    """conv1d expressed as window-stack + one matmul, same params/output.

    Motivation (TPU compile time): XLA's backward pass for a wide-kernel,
    few-channel 1-D conv (Chambon's k=50, cin=1) materializes the weight
    gradient as a ~(T-k)-tap convolution whose TPU lowering compiles
    pathologically slowly through this environment's device relay
    (measured: 382 s for the plain Chambon train step vs seconds for
    USleep's k=9 convs). The im2col form differentiates into plain
    matmuls and slices, which compile fast. Param tree ("kernel" of shape
    (k, cin, features), "bias") matches nn.Conv exactly, so checkpoints
    and the torch importer are unaffected.
    """

    features: int
    kernel: int
    stride: int = 1
    padding: tuple[int, int] | str = (0, 0)
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, cin = x.shape
        k, s = self.kernel, self.stride
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, cin, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        if self.padding == "SAME":
            t_out = -(-t // s)
            total = max((t_out - 1) * s + k - t, 0)
            lo, hi = total // 2, total - total // 2
        else:
            lo, hi = self.padding
            t_out = (t + lo + hi - k) // s + 1
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (lo, hi), (0, 0)))
        span = (t_out - 1) * s + 1
        taps = [xp[:, d : d + span : s, :] for d in range(k)]
        cols = jnp.concatenate(taps, axis=-1)  # (B, T', k*cin)
        y = cols @ w.reshape(k * cin, self.features).astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class ChambonFeatureExtractor(nn.Module):
    n_chans: int = 1
    sfreq: float = 100.0
    n_conv_chs: int = 8
    time_conv_size_s: float = 0.5
    max_pool_size_s: float = 0.125
    pad_size_s: float = 0.1
    apply_batch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, T, C) -> flattened features (B, F).

        torch semantics preserved for n_chans>1: the spatial conv mixes the
        C inputs into V=n_chans virtual channels, and the temporal convs
        are applied per virtual channel with SHARED weights (braindecode's
        Conv2d with (1, k) kernels over a (B, 1, V, T) tensor). Feature
        flattening follows torch's (channels, V, T') C-order so imported
        fc weights line up.
        """
        k = int(np.ceil(self.time_conv_size_s * self.sfreq))
        pool = max(1, int(np.ceil(self.max_pool_size_s * self.sfreq)))
        pad = int(np.ceil(self.pad_size_s * self.sfreq))

        b, t, c = x.shape
        h = x.astype(self.dtype)
        if self.n_chans > 1:
            # spatial conv: (B, T, C) -> (B, T, V)
            h = nn.Dense(self.n_chans, dtype=self.dtype, name="spatial")(h)
        v = h.shape[-1]
        # fold virtual channels into the batch: shared temporal filters
        h = h.transpose(0, 2, 1).reshape(b * v, t, 1)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=jnp.float32, name=name)

        h = Im2ColConv1d(self.n_conv_chs, k, padding=(pad, pad),
                         dtype=self.dtype, name="conv1")(h)
        h = bn("bn1")(h) if self.apply_batch_norm else h
        h = nn.relu(h)
        h = nn.max_pool(h, (pool,), strides=(pool,), padding="VALID")
        h = Im2ColConv1d(self.n_conv_chs, k, padding=(pad, pad),
                         dtype=self.dtype, name="conv2")(h)
        h = bn("bn2")(h) if self.apply_batch_norm else h
        h = nn.relu(h)
        h = nn.max_pool(h, (pool,), strides=(pool,), padding="VALID")
        # (B*V, T', F) -> (B, F, V, T') to match torch flatten order
        h = h.reshape(b, v, h.shape[1], h.shape[2]).transpose(0, 3, 1, 2)
        return h.reshape(b, -1)


class SleepStagerChambon2018(nn.Module):
    """Single-window stager: features -> dropout -> linear."""

    n_chans: int = 1
    sfreq: float = 100.0
    n_outputs: int = 5
    dropout: float = 0.25
    apply_batch_norm: bool = False
    pad_size_s: float = 0.25
    return_feats: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = ChambonFeatureExtractor(
            n_chans=self.n_chans, sfreq=self.sfreq,
            pad_size_s=self.pad_size_s,
            apply_batch_norm=self.apply_batch_norm, dtype=self.dtype,
            name="feature_extractor")(x, train)
        if self.return_feats:
            return feats
        h = nn.Dropout(self.dropout, deterministic=not train)(feats)
        return nn.Dense(self.n_outputs, dtype=self.dtype, name="fc")(h)


class TimeDistributedStager(nn.Module):
    """Sequence model: per-window Chambon features (shared params),
    concatenated, dropout(0.5), linear -> n_outputs
    (run_sleep_decode.py:184-190)."""

    n_chans: int = 1
    sfreq: float = 100.0
    n_outputs: int = 5
    n_windows: int = 3
    # INTENTIONALLY unused, faithful to the reference: it passes
    # dropout=0.9 to SleepStagerChambon2018 but with return_feats=True the
    # features are taken BEFORE the fc head that owns that dropout
    # (run_sleep_decode.py:179-182), so only the head's 0.5 ever applies
    feat_dropout: float = 0.9
    head_dropout: float = 0.5
    pad_size_s: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, n_windows, T, C) -> logits (B, n_outputs)."""
        b, s, t, c = x.shape
        assert s == self.n_windows
        extractor = ChambonFeatureExtractor(
            n_chans=self.n_chans, sfreq=self.sfreq, pad_size_s=self.pad_size_s,
            apply_batch_norm=True, dtype=self.dtype, name="feature_extractor")
        feats = extractor(x.reshape(b * s, t, c), train)
        feats = feats.reshape(b, -1)
        feats = nn.Dropout(self.head_dropout, deterministic=not train)(feats)
        return nn.Dense(self.n_outputs, dtype=self.dtype, name="head")(feats)
