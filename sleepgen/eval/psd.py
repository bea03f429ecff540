"""Power spectral density — the on-device replacement for the reference's
MNE ``compute_psd`` calls (``src/util.py:66-121``, ``sample_trials.py:174``).

Welch periodogram with Hamming window, 256-sample segments, 50% overlap —
numerically close to MNE's spectra for 30 s 100 Hz windows while being a
single rfft batch on TPU. Returns dB (10*log10) like the artifact contract
at sample_trials.py:181.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sleepgen.data.transforms import SFREQ


def _segment(x: jnp.ndarray, nperseg: int, noverlap: int) -> jnp.ndarray:
    """(..., T) -> (..., n_segments, nperseg) via strided gather."""
    step = nperseg - noverlap
    n = (x.shape[-1] - noverlap) // step
    idx = jnp.arange(nperseg)[None, :] + step * jnp.arange(n)[:, None]
    return x[..., idx]


def welch_psd(
    x: jnp.ndarray,
    sfreq: float = float(SFREQ),
    nperseg: int = 256,
    noverlap: int = 128,
    fmax: float | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (..., T) -> (psd (..., F), freqs (F,)); density scaling (V^2/Hz)."""
    x = jnp.asarray(x, jnp.float32)
    nperseg = min(nperseg, x.shape[-1])
    noverlap = min(noverlap, nperseg - 1)
    # periodic hamming (scipy get_window default), not numpy's symmetric one
    k = jnp.arange(nperseg, dtype=jnp.float32)
    win = 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * k / nperseg)
    segs = _segment(x, nperseg, noverlap)
    segs = (segs - jnp.mean(segs, axis=-1, keepdims=True)) * win
    spec = jnp.fft.rfft(segs, axis=-1)
    scale = 1.0 / (sfreq * jnp.sum(win**2))
    p = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2) * scale
    # one-sided: double everything except DC and Nyquist
    p = p.at[..., 1:-1].multiply(2.0) if nperseg % 2 == 0 else p.at[..., 1:].multiply(2.0)
    psd = jnp.mean(p, axis=-2)
    freqs = jnp.fft.rfftfreq(nperseg, d=1.0 / sfreq)
    if fmax is not None:
        keep = int(np.searchsorted(np.asarray(freqs), fmax, side="right"))
        psd, freqs = psd[..., :keep], freqs[:keep]
    return psd, freqs


def welch_psd_db(
    x: np.ndarray, sfreq: float = float(SFREQ), fmax: float = 18.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-convenience: (C, T) or (B, C, T) -> dB PSD like the reference's
    ``10 * np.log10(psds)`` (sample_trials.py:181)."""
    psd, freqs = welch_psd(jnp.asarray(x), sfreq=sfreq, fmax=fmax)
    psd = np.asarray(psd)
    psd = np.maximum(psd, 1e-30)
    return 10.0 * np.log10(psd), np.asarray(freqs)
