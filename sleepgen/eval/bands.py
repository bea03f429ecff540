"""EEG frequency-band filtering for per-band metrics.

Parity target: the reference's per-band eval
(``src/testing/MSSIM_test.py:118-168``, ``testing/FID_test.py:84-230``)
which band-passes with ``mne.filter.filter_data`` at delta 0.5-4 Hz,
theta 4.1-8, alpha 8.1-12 before MS-SSIM/FID.

Implementation: zero-phase FIR band-pass designed with a Hamming-window
sinc (MNE's default design family), applied as a single XLA depthwise
convolution with reflect padding — runs batched on device instead of
per-file scipy on host.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sleepgen.data.transforms import SFREQ

EEG_BANDS: Dict[str, Tuple[float, float]] = {
    "delta": (0.5, 4.0),
    "theta": (4.1, 8.0),
    "alpha": (8.1, 12.0),
}


def firwin_bandpass(l_freq: float, h_freq: float, sfreq: float = float(SFREQ),
                    numtaps: int = 401) -> np.ndarray:
    """Hamming-window sinc band-pass (odd taps, zero-phase when centered)."""
    assert numtaps % 2 == 1
    n = np.arange(numtaps) - (numtaps - 1) / 2
    def sinc_lp(fc):
        h = np.sinc(2 * fc / sfreq * n) * 2 * fc / sfreq
        return h
    h = sinc_lp(h_freq) - sinc_lp(l_freq)
    h *= np.hamming(numtaps)
    # normalize band center gain to 1
    fc = (l_freq + h_freq) / 2
    gain = np.abs(np.sum(h * np.exp(-2j * np.pi * fc / sfreq * np.arange(numtaps))))
    return (h / gain).astype(np.float32)


def filter_band(x: jnp.ndarray, band: str | Tuple[float, float],
                sfreq: float = float(SFREQ), numtaps: int = 401) -> jnp.ndarray:
    """Band-pass (B, L, C) along L, zero-phase (centered FIR + reflect pad)."""
    lo, hi = EEG_BANDS[band] if isinstance(band, str) else band
    h = jnp.asarray(firwin_bandpass(lo, hi, sfreq, numtaps))
    pad = numtaps // 2
    c = x.shape[-1]
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    k = jnp.tile(h[:, None, None], (1, 1, c))
    return jax.lax.conv_general_dilated(
        xp, k, (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )
