"""Power spectral density — the on-device replacement for the reference's
MNE ``compute_psd`` calls (``src/util.py:66-121``, ``sample_trials.py:174``).

Two methods:

* :func:`multitaper_psd` — DPSS multitaper, the method MNE actually runs
  for the reference's artifacts: ``EpochsArray.compute_psd(fmax=18)``
  (``sample_trials.py:172-190``) resolves ``method='auto'`` to
  **multitaper** for Epochs. Implements ``psd_array_multitaper`` defaults
  (half-bandwidth 4, low-bias taper selection at eigenvalue > 0.9,
  non-adaptive sqrt-eigenvalue weights, DC removal, 'length'
  normalization); tapers come from scipy's DPSS solver on the host, the
  spectra are one batched rfft on device. This is what the
  ``psd_list_{i}.npy`` artifact contract uses.
* :func:`welch_psd` — Hamming/256/50% Welch periodogram (scipy-matched),
  kept for the in-repo PSD-correlation health metrics and band reports.

Both return dB via the ``*_db`` helpers like the artifact contract at
``sample_trials.py:181`` (``10 * np.log10(psds)``).
"""
from __future__ import annotations

import functools
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


# -- DPSS multitaper (MNE psd_array_multitaper semantics) --------------------

@functools.lru_cache(maxsize=8)
def dpss_tapers(
    n_times: int, half_nbw: float = 4.0, low_bias: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """DPSS tapers + concentration eigenvalues, MNE-selected.

    MNE ``_compute_mt_params``: ``n_tapers_max = int(2 * half_nbw)`` tapers
    from the Slepian solver, then ``low_bias`` keeps those with spectral
    concentration > 0.9 (falling back to the single best). Unit-energy
    tapers (l2 norm 1), identical convention to scipy/MNE.
    """
    from scipy.signal.windows import dpss as _dpss

    n_tapers_max = int(2 * half_nbw)
    tapers, ratios = _dpss(n_times, half_nbw, Kmax=n_tapers_max,
                           return_ratios=True)
    if low_bias:
        keep = ratios > 0.9
        if not keep.any():
            keep = np.zeros_like(keep)
            keep[np.argmax(ratios)] = True
        tapers, ratios = tapers[keep], ratios[keep]
    return tapers.astype(np.float64), ratios.astype(np.float64)


def multitaper_psd(
    x: jnp.ndarray,
    sfreq: float = float(SFREQ),
    fmin: float = 0.0,
    fmax: float | None = 18.0,
    bandwidth: float | None = None,
    low_bias: bool = True,
    normalization: str = "length",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (..., T) -> (psd (..., F), freqs (F,)) — MNE multitaper parity.

    Matches ``mne.time_frequency.psd_array_multitaper(x, sfreq, fmin, fmax)``
    defaults (the path under the reference's ``compute_psd(fmax=18)``,
    ``sample_trials.py:172-190``): DC removed per signal, rfft of the
    taper products (no zero padding), DC/Nyquist bins halved before the
    one-sided x2, non-adaptive combination with sqrt-eigenvalue weights
    (= eigenvalue-weighted mean of taper spectra), inclusive [fmin, fmax]
    mask, 'length' normalization ('full' additionally divides by sfreq).
    Runs as one batched device computation over any leading dims.
    """
    n_times = x.shape[-1]
    half_nbw = (float(bandwidth) * n_times / (2.0 * sfreq)
                if bandwidth is not None else 4.0)
    tapers, eigvals = dpss_tapers(n_times, half_nbw, low_bias)

    x = jnp.asarray(x, jnp.float32)
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    spec = jnp.fft.rfft(x[..., None, :] * jnp.asarray(tapers, jnp.float32),
                        axis=-1)  # (..., K, F)
    sq = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    sq = sq.at[..., 0].multiply(0.5)
    if n_times % 2 == 0:
        sq = sq.at[..., -1].multiply(0.5)
    w = jnp.asarray(eigvals, jnp.float32)
    psd = 2.0 * jnp.tensordot(sq, w, axes=[[-2], [0]]) / jnp.sum(w)
    if normalization == "full":
        psd = psd / sfreq
    freqs = np.fft.rfftfreq(n_times, d=1.0 / sfreq)
    lo = int(np.searchsorted(freqs, fmin, side="left"))
    hi = int(np.searchsorted(freqs, fmax, side="right")) if fmax is not None \
        else len(freqs)
    return psd[..., lo:hi], jnp.asarray(freqs[lo:hi], jnp.float32)


def multitaper_psd_db(
    x: np.ndarray, sfreq: float = float(SFREQ), fmax: float = 18.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-convenience dB wrapper — the artifact-contract PSD method."""
    psd, freqs = multitaper_psd(jnp.asarray(x), sfreq=sfreq, fmax=fmax)
    psd = np.asarray(psd)
    psd = np.maximum(psd, 1e-30)
    return 10.0 * np.log10(psd), np.asarray(freqs)
