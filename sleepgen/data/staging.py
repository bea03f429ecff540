"""Sleep-stage epoching + sequence sampling for downstream decoding.

Parity target: the braindecode/skorch stack used by
``src/testing/run_sleep_decode.py:97-156``:
  * 30 s windows cut from stage annotations with the AASM mapping
    (W->0, 1->1, 2->2, 3/4->3, R->4; run_sleep_decode.py:112-119)
  * per-window channel-wise standard scaling (:137)
  * ``SequenceSampler``: non-overlapping sequences of 3 consecutive
    windows within a recording, labeled by the center window (:149-166)
  * 'balanced' class weights (:168-169)
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

STAGE_MAPPING: Dict[str, int] = {
    "Sleep stage W": 0,
    "Sleep stage 1": 1,
    "Sleep stage 2": 2,
    "Sleep stage 3": 3,
    "Sleep stage 4": 3,
    "Sleep stage R": 4,
}
STAGE_NAMES = ["Wake", "N1", "N2", "N3", "REM"]


def windows_from_annotations(
    signal: np.ndarray,
    sfreq: float,
    annotations: Sequence[Tuple[float, float, str]],
    mapping: Dict[str, int] = STAGE_MAPPING,
    window_size_s: float = 30.0,
    t_offset: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Cut (N, window, C) epochs + integer labels from stage annotations.

    Long annotations (Sleep-EDFx hypnograms span many epochs) are split
    into consecutive 30 s windows, like braindecode's
    create_windows_from_events with stride == size.
    ``t_offset``: seconds already cropped off the signal start.
    """
    if signal.ndim == 1:
        signal = signal[:, None]
    win = int(round(window_size_s * sfreq))
    xs, ys = [], []
    for onset, duration, desc in annotations:
        if desc not in mapping:
            continue
        label = mapping[desc]
        start = onset - t_offset
        n_win = max(int(duration // window_size_s), 1)
        for k in range(n_win):
            i0 = int(round((start + k * window_size_s) * sfreq))
            i1 = i0 + win
            if i0 < 0 or i1 > len(signal):
                continue
            xs.append(signal[i0:i1])
            ys.append(label)
    if not xs:
        return np.empty((0, win, signal.shape[1]), np.float32), np.empty((0,), np.int64)
    return np.stack(xs).astype(np.float32), np.asarray(ys, np.int64)


def standard_scale_windows(x: np.ndarray) -> np.ndarray:
    """Per-window per-channel zero-mean unit-variance (sklearn scale
    semantics, run_sleep_decode.py:135-137). x: (N, T, C)."""
    mu = x.mean(axis=1, keepdims=True)
    sd = x.std(axis=1, keepdims=True)
    return ((x - mu) / np.where(sd == 0, 1.0, sd)).astype(np.float32)


def sequence_indices(
    rec_ids: np.ndarray, n_windows: int = 3, stride: int = 3,
) -> np.ndarray:
    """Start indices of length-n sequences that stay within one recording
    (SequenceSampler parity). Returns (M, n_windows) index matrix."""
    out: List[np.ndarray] = []
    for rid in np.unique(rec_ids):
        idx = np.flatnonzero(rec_ids == rid)
        for s in range(0, len(idx) - n_windows + 1, stride):
            out.append(idx[s : s + n_windows])
    return np.stack(out) if out else np.empty((0, n_windows), np.int64)


def center_label(labels: np.ndarray, seq_idx: np.ndarray) -> np.ndarray:
    """Label of the center window of each sequence (run_sleep_decode
    get_center_label)."""
    return labels[seq_idx[:, seq_idx.shape[1] // 2]]


def balanced_class_weights(y: np.ndarray, n_classes: int = 5) -> np.ndarray:
    """sklearn compute_class_weight('balanced'): n / (k * count_c) over the
    classes present; absent classes get weight 0."""
    counts = np.bincount(y, minlength=n_classes).astype(np.float64)
    present = counts > 0
    w = np.zeros(n_classes)
    w[present] = len(y) / (present.sum() * counts[present])
    return w.astype(np.float32)


def make_synthetic_staged(
    n_recordings: int = 24,
    n_epochs_per_rec: int = 40,
    sfreq: int = 100,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hermetic staged-EEG fixture: stage k is a sine at (2+3k) Hz plus
    noise, 30 s epochs. Returns (windows (N, 3000, 1) standard-scaled,
    labels (N,), recording_ids (N,)) — the shape contract of
    ``load_staged_dataset`` (cli/run_sleep_decode.py) without PhysioNet.
    """
    rng = np.random.default_rng(seed)
    stages = ["Sleep stage W", "Sleep stage 1", "Sleep stage 2",
              "Sleep stage 3", "Sleep stage R"]
    t = np.arange(30 * sfreq) / sfreq
    xs, ys, rids = [], [], []
    for rec in range(n_recordings):
        sig, anns = [], []
        for i in range(n_epochs_per_rec):
            s = int(rng.integers(0, 5))
            f = 2 + 3 * s
            phase = rng.uniform(0, 2 * np.pi)
            sig.append(np.sin(2 * np.pi * f * t + phase)
                       + 0.3 * rng.normal(size=len(t)))
            anns.append((i * 30.0, 30.0, stages[s]))
        x, y = windows_from_annotations(np.concatenate(sig), sfreq, anns)
        xs.append(standard_scale_windows(x))
        ys.append(y)
        rids.append(np.full(len(y), rec))
    return np.concatenate(xs), np.concatenate(ys), np.concatenate(rids)
