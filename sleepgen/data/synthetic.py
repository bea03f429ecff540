"""Synthetic sleep-EEG fixture generator.

The reference has no hermetic test data (PhysioNet downloads only,
``src/preprocessing/convert_edfx.py:23-27``). This module generates
realistic-enough recordings — band-limited sinusoid mixtures at the sleep
bands (delta 0.5-4 Hz, theta 4.1-8, alpha 8.1-12, SURVEY.md §2a per-band
eval) plus 1/f pink noise — so the entire pipeline (ingest -> train ->
sample -> eval) runs without network access. Amplitudes are in volts
(~50 uV) to match raw EDF scale before the x1e6 step.
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Sequence

import numpy as np

BANDS = {"delta": (0.5, 4.0), "theta": (4.1, 8.0), "alpha": (8.1, 12.0)}


def pink_noise(rng: np.random.Generator, n: int, sfreq: float = 100.0) -> np.ndarray:
    """1/f noise via spectral shaping."""
    spec = rng.normal(size=n // 2 + 1) + 1j * rng.normal(size=n // 2 + 1)
    freqs = np.fft.rfftfreq(n, d=1.0 / sfreq)
    freqs[0] = freqs[1]
    spec = spec / np.sqrt(freqs)
    x = np.fft.irfft(spec, n=n)
    return (x / np.std(x)).astype(np.float64)


def synthetic_recording(
    seed: int,
    duration_s: float = 120.0,
    sfreq: float = 100.0,
    amplitude_v: float = 50e-6,
) -> np.ndarray:
    """One raw-scale recording (T,) float64 (volts, like MNE get_data)."""
    rng = np.random.default_rng(seed)
    n = int(duration_s * sfreq)
    t = np.arange(n) / sfreq
    x = np.zeros(n)
    for lo, hi in BANDS.values():
        for _ in range(3):
            f = rng.uniform(lo, hi)
            phase = rng.uniform(0, 2 * np.pi)
            amp = rng.uniform(0.3, 1.0)
            x += amp * np.sin(2 * np.pi * f * t + phase)
    x += 0.8 * pink_noise(rng, n, sfreq)
    x = x / np.max(np.abs(x)) * amplitude_v
    return x


def make_synthetic_dataset(
    n_recordings: int = 16,
    duration_s: float = 120.0,
    seed: int = 0,
) -> List[np.ndarray]:
    return [synthetic_recording(seed * 10_000 + i, duration_s) for i in range(n_recordings)]


def write_synthetic_npy_tree(
    out_dir: Path, n_subjects: int = 8, nights: Sequence[int] = (1, 2),
    duration_s: float = 120.0, seed: int = 0,
) -> "pd.DataFrame":  # noqa: F821
    """Materialize a reference-compatible .npy tree + ids CSV: one file per
    (subject, night), shaped (1, T) like convert_edfx.py output."""
    import pandas as pd

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    i = 0
    for subject in range(n_subjects):
        for night in nights:
            rec = synthetic_recording(seed * 10_000 + i, duration_s)
            name = f"SC4{subject:02d}{night}E0-Fpz-Cz"
            np.save(out_dir / f"{name}.npy", rec[None, :])
            rows.append(
                {"FILE_NAME_EEG": name, "subject": subject, "night": night,
                 "age": 30 + subject, "gender": "F" if subject % 2 else "M",
                 "LightsOff": "22:00"}
            )
            i += 1
    return pd.DataFrame(rows)
