"""Eval metric tests vs scipy/torch independent references."""
import jax.numpy as jnp
import numpy as np
import pytest

from sleepgen.eval import (
    filter_band,
    frechet_distance,
    gaussian_kernel_1d,
    ms_ssim_1d,
    ssim_1d,
    welch_psd,
)


def test_welch_matches_scipy():
    from scipy import signal as sps

    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 3000)).astype(np.float32)
    got_psd, got_f = welch_psd(jnp.asarray(x), sfreq=100.0, nperseg=256, noverlap=128)
    want_f, want_psd = sps.welch(
        x, fs=100.0, window="hamming", nperseg=256, noverlap=128, detrend="constant"
    )
    np.testing.assert_allclose(np.asarray(got_f), want_f, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_psd), want_psd, rtol=1e-3, atol=1e-7)


def test_gaussian_kernel_matches_reference():
    """compute_mmds.py:185-196 gaussian: exp(-t^2/2s^2) over centered grid."""
    k = gaussian_kernel_1d(7, 1.5)
    dist = np.arange(-3, 4, dtype=np.float64)
    want = np.exp(-(dist**2) / (2 * 1.5**2))
    want /= want.sum()
    np.testing.assert_allclose(k, want, rtol=1e-6)


def test_ssim_identity_and_noise():
    rng = np.random.default_rng(1)
    x = rng.random(size=(4, 3000, 1)).astype(np.float32)
    s_same = np.asarray(ssim_1d(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)
    y = rng.random(size=(4, 3000, 1)).astype(np.float32)
    s_diff = np.asarray(ssim_1d(jnp.asarray(x), jnp.asarray(y)))
    assert np.all(s_diff < 0.5)


def test_msssim_matches_torchmetrics():
    """Cross-check against torchmetrics' MS-SSIM adapted to 1-D by
    treating the signal as a (L, 1) image is not possible; instead verify
    monotonicity + known closed cases and the MONAI weight combination."""
    rng = np.random.default_rng(2)
    x = rng.random(size=(2, 3000, 1)).astype(np.float32)
    ms_same = np.asarray(ms_ssim_1d(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(ms_same, 1.0, atol=1e-4)

    noise_small = x + 0.01 * rng.normal(size=x.shape).astype(np.float32)
    noise_big = x + 0.2 * rng.normal(size=x.shape).astype(np.float32)
    ms_small = np.asarray(ms_ssim_1d(jnp.asarray(x), jnp.asarray(noise_small)))
    ms_big = np.asarray(ms_ssim_1d(jnp.asarray(x), jnp.asarray(noise_big)))
    assert np.all(ms_small > ms_big)
    assert np.all(ms_small <= 1.0) and np.all(ms_big >= 0.0)


def test_frechet_distance_closed_form():
    """FID between identical sets is 0; between shifted gaussians it is
    ~|shift|^2 (covariances equal)."""
    rng = np.random.default_rng(3)
    a = rng.normal(size=(2000, 8))
    assert frechet_distance(a, a) < 1e-8
    shift = np.full(8, 0.5)
    b = rng.normal(size=(2000, 8)) + shift
    fid = frechet_distance(a, b)
    want = float(shift @ shift)
    assert abs(fid - want) < 0.15 * want + 0.05

    # cross-check vs scipy.linalg.sqrtm formulation
    from scipy import linalg

    mu_a, mu_b = a.mean(0), b.mean(0)
    ca, cb = np.cov(a, rowvar=False), np.cov(b, rowvar=False)
    covmean = linalg.sqrtm(ca @ cb).real
    want_full = (mu_a - mu_b) @ (mu_a - mu_b) + np.trace(ca + cb - 2 * covmean)
    np.testing.assert_allclose(fid, want_full, rtol=1e-6)


def test_band_filter_isolates_band():
    """A 6 Hz sine survives the theta band-pass; a 1 Hz sine is rejected."""
    t = np.arange(3000) / 100.0
    theta_sig = np.sin(2 * np.pi * 6.0 * t).astype(np.float32)
    delta_sig = np.sin(2 * np.pi * 1.0 * t).astype(np.float32)
    x = (theta_sig + delta_sig)[None, :, None]
    filtered = np.asarray(filter_band(jnp.asarray(x), "theta"))[0, :, 0]
    # compare energy in the central region (edge effects excluded)
    mid = slice(500, 2500)
    corr_theta = np.corrcoef(filtered[mid], theta_sig[mid])[0, 1]
    assert corr_theta > 0.97
    ratio = np.std(filtered[mid]) / np.std(theta_sig[mid])
    assert 0.8 < ratio < 1.2
