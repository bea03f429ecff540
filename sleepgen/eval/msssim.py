"""1-D SSIM / MS-SSIM metrics.

Parity target: the reference's 1-D-adapted MONAI metric
(``src/compute_mmds.py:67-408``; gaussian kernel, kernel_size 7,
sigma 1.5, data_range 1.0, MONAI MS-SSIM weights) used for
reconstruction quality (compute_mmds.py:485-507), synthetic-pair
diversity, and the test-pair baseline (compute_mmds_train_test.py). The
band-eval suite uses kernel_size 16 with a uniform kernel option
(testing/tailored_mssim.py) — both kernel types are supported.

Implemented as pure jnp on (B, L, C); depthwise conv via
``lax.conv_general_dilated`` with feature_group_count.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def gaussian_kernel_1d(kernel_size: int = 7, sigma: float = 1.5) -> np.ndarray:
    """MONAI's gaussian_1d (compute_mmds.py:185-196): exp(-t^2/(2s^2))
    over a centered integer grid, normalized to sum 1."""
    dist = np.arange((1 - kernel_size) / 2, (1 + kernel_size) / 2, 1.0)
    g = np.exp(-(dist**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Valid depthwise conv of (B, L, C) with (K,) kernel per channel."""
    c = x.shape[-1]
    k = jnp.tile(kernel[:, None, None], (1, 1, c))  # (K, 1, C) WIO, groups=C
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
    )


def ssim_and_cs(
    x: jnp.ndarray, y: jnp.ndarray,
    kernel: jnp.ndarray, data_range: float = 1.0,
    k1: float = 0.01, k2: float = 0.03,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-element SSIM and contrast-sensitivity maps, then mean over
    (L, C) -> (B,). MONAI compute_ssim_and_cs parity."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mu_x = _depthwise_conv(x, kernel)
    mu_y = _depthwise_conv(y, kernel)
    mu_xx = _depthwise_conv(x * x, kernel)
    mu_yy = _depthwise_conv(y * y, kernel)
    mu_xy = _depthwise_conv(x * y, kernel)
    var_x = mu_xx - mu_x * mu_x
    var_y = mu_yy - mu_y * mu_y
    cov = mu_xy - mu_x * mu_y
    cs = (2 * cov + c2) / (var_x + var_y + c2)
    ssim = ((2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)) * cs
    axes = tuple(range(1, x.ndim))
    return jnp.mean(ssim, axis=axes), jnp.mean(cs, axis=axes)


def uniform_kernel_1d(kernel_size: int = 16) -> np.ndarray:
    """Uniform (box) kernel — MONAI kernel_type='uniform' as used by the
    band-eval suite with kernel_size 16 (testing/tailored_mssim.py)."""
    return np.full((kernel_size,), 1.0 / kernel_size, np.float32)


def _make_kernel(kernel_size: int, sigma: float, kernel_type: str) -> np.ndarray:
    if kernel_type == "gaussian":
        return gaussian_kernel_1d(kernel_size, sigma)
    if kernel_type == "uniform":
        return uniform_kernel_1d(kernel_size)
    raise ValueError(kernel_type)


def ssim_1d(x: jnp.ndarray, y: jnp.ndarray, kernel_size: int = 7,
            sigma: float = 1.5, data_range: float = 1.0,
            kernel_type: str = "gaussian") -> jnp.ndarray:
    kernel = jnp.asarray(_make_kernel(kernel_size, sigma, kernel_type))
    s, _ = ssim_and_cs(x, y, kernel, data_range)
    return s


def ms_ssim_1d(
    x: jnp.ndarray,
    y: jnp.ndarray,
    kernel_size: int = 7,
    sigma: float = 1.5,
    data_range: float = 1.0,
    weights: Sequence[float] = MSSSIM_WEIGHTS,
    kernel_type: str = "gaussian",
) -> jnp.ndarray:
    """Multi-scale SSIM on (B, L, C) -> (B,). At each non-final scale keep
    CS, avg-pool by 2; final scale keeps SSIM; combine prod(v_i^w_i)
    (MONAI MultiScaleSSIMMetric semantics, relu-clamped)."""
    kernel = jnp.asarray(_make_kernel(kernel_size, sigma, kernel_type))
    weights_arr = jnp.asarray(weights, jnp.float32)
    levels = len(weights)
    vals = []
    for i in range(levels):
        s, cs = ssim_and_cs(x, y, kernel, data_range)
        if i < levels - 1:
            vals.append(jax.nn.relu(cs))
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 1), (1, 2, 1), "VALID") / 2.0
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, 2, 1), (1, 2, 1), "VALID") / 2.0
        else:
            vals.append(jax.nn.relu(s))
    stacked = jnp.stack(vals, axis=0)  # (levels, B)
    return jnp.prod(stacked ** weights_arr[:, None], axis=0)
