"""DeepSleepNet (Supratak et al. 2017) — the third downstream decoder.

Parity target: braindecode's ``DeepSleepNet`` as used by
``src/testing/run_sleep_decode_c.py`` (single-window mode, batch 128).
Architecture: two parallel CNN branches over the raw 30 s window —
a small-filter branch (kernel sfreq/2, stride sfreq/16) for temporal
detail and a large-filter branch (kernel sfreq*4, stride sfreq/2) for
frequency content — concatenated, then a residual sequence head. In
single-window mode braindecode applies the BiLSTM over a length-1
sequence; we keep that head (bidirectional LSTM + residual FC) so
sequence training also works.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from sleepgen.nn.layers import Dtype, conv1d


class _CNNBranch(nn.Module):
    kernel: int
    stride: int
    pool1: int
    kernel_small: int
    pool2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=jnp.float32, name=name)

        # im2col form: the wide-kernel (sfreq/2 and sfreq*4), cin=1 entry
        # convs compile pathologically slowly on the TPU backend as
        # lax.conv (see chambon.Im2ColConv1d); identical math and params
        from sleepgen.nn.chambon import Im2ColConv1d

        h = Im2ColConv1d(64, self.kernel, stride=self.stride, padding="SAME",
                         use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = bn("bn1")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (self.pool1,), strides=(self.pool1,), padding="SAME")
        h = nn.Dropout(0.5, deterministic=not train)(h)
        for i in range(3):
            h = conv1d(128, self.kernel_small, use_bias=False, dtype=self.dtype,
                       name=f"conv2_{i}")(h)
            h = bn(f"bn2_{i}")(h)
            h = nn.relu(h)
        h = nn.max_pool(h, (self.pool2,), strides=(self.pool2,), padding="SAME")
        return h


class DeepSleepNet(nn.Module):
    n_outputs: int = 5
    sfreq: float = 100.0
    return_feats: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, T, C) single windows or (B, S, T, C) sequences ->
        (B, n_outputs) or (B, S, n_outputs)."""
        single = x.ndim == 3
        if single:
            x = x[:, None]
        b, s, t, c = x.shape
        h = x.reshape(b * s, t, c).astype(self.dtype)

        sf = int(self.sfreq)
        small = _CNNBranch(sf // 2, sf // 16, 8, 8, 4, dtype=self.dtype,
                           name="branch_small")(h, train)
        large = _CNNBranch(sf * 4, sf // 2, 4, 6, 2, dtype=self.dtype,
                           name="branch_large")(h, train)
        feats = jnp.concatenate(
            [small.reshape(b * s, -1), large.reshape(b * s, -1)], axis=-1)
        feats = nn.Dropout(0.5, deterministic=not train)(feats)
        if self.return_feats:
            out = feats.reshape(b, s, -1)
            return out[:, 0] if single else out

        # sequence head: 2-layer BiLSTM (512 per direction) + residual FC
        seq = feats.reshape(b, s, -1)
        shortcut = nn.Dense(1024, dtype=self.dtype, name="shortcut")(seq)
        hcur = seq
        for layer in range(2):
            fwd = nn.RNN(nn.OptimizedLSTMCell(512), name=f"lstm_fwd_{layer}")(hcur)
            bwd = nn.RNN(nn.OptimizedLSTMCell(512), reverse=True,
                         keep_order=True, name=f"lstm_bwd_{layer}")(hcur)
            hcur = jnp.concatenate([fwd, bwd], axis=-1)
            hcur = nn.Dropout(0.5, deterministic=not train)(hcur)
        h = hcur + shortcut
        h = nn.Dropout(0.5, deterministic=not train)(h)
        logits = nn.Dense(self.n_outputs, dtype=self.dtype, name="fc")(h)
        return logits[:, 0] if single else logits
