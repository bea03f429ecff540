"""Fréchet Inception Distance over USleep bottleneck features.

Parity target: MONAI-generative ``FIDMetric`` as used by the reference
(``src/compute_fid.py:415-416``): features from the pretrained USleep
bottleneck (duplicated EEG channel, compute_fid.py:381,405), then
FID = |mu_r - mu_s|^2 + tr(C_r + C_s - 2 (C_r C_s)^{1/2}).

The matrix square root uses an eigendecomposition of the symmetrized
product (features are low-dimensional, ~hundreds), in float64 on host —
this is an eval path, not a training hot loop.
"""
from __future__ import annotations

import numpy as np


def _cov(feats: np.ndarray) -> np.ndarray:
    return np.cov(feats, rowvar=False)


def _sqrtm_psd(mat: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """Square root of a (nearly) PSD matrix via symmetric eigendecomposition."""
    sym = (mat + mat.T) / 2.0
    vals, vecs = np.linalg.eigh(sym)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """feats: (N, D) float arrays."""
    a = np.asarray(feats_a, np.float64)
    b = np.asarray(feats_b, np.float64)
    mu_a, mu_b = a.mean(0), b.mean(0)
    c_a, c_b = _cov(a), _cov(b)
    diff = mu_a - mu_b
    # tr((Ca Cb)^{1/2}) = tr((Ca^{1/2} Cb Ca^{1/2})^{1/2}) — PSD-stable form
    sa = _sqrtm_psd(c_a)
    covmean = _sqrtm_psd(sa @ c_b @ sa)
    return float(diff @ diff + np.trace(c_a) + np.trace(c_b) - 2.0 * np.trace(covmean))


def usleep_fid_features(usleep, variables, signals_blc, batch_size: int = 256):
    """Bottleneck features for (N, 3000, 1) signals: duplicate the EEG
    channel to 2 (compute_fid.py:381), run USleep, squeeze the length-1
    bottleneck -> (N, D)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def feats(x):
        x2 = jnp.concatenate([x, x], axis=-1)
        _, _, bottom = usleep.apply(variables, x2, train=False)
        return bottom[:, 0, :]

    outs = []
    n = signals_blc.shape[0]
    for i in range(0, n, batch_size):
        batch = jnp.asarray(signals_blc[i : i + batch_size])
        outs.append(np.asarray(jax.device_get(feats(batch))))
    return np.concatenate(outs, axis=0)


def compute_fid(usleep, variables, real_blc, synth_blc, batch_size: int = 256) -> float:
    fr = usleep_fid_features(usleep, variables, real_blc, batch_size)
    fs = usleep_fid_features(usleep, variables, synth_blc, batch_size)
    return frechet_distance(fr, fs)
