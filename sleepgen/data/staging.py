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


# Markov stage-transition matrix (rows: W, N1, N2, N3, REM). Loosely the
# empirical Sleep-EDFx hypnogram statistics: sleep is sticky, N1 is a hub,
# direct W<->N3 jumps are rare. Gives decoders temporal context to exploit
# (the 3-window sequence variant should beat the single-window one).
_STAGE_TRANSITIONS = np.array([
    # W     N1    N2    N3    REM
    [0.75, 0.19, 0.03, 0.00, 0.03],   # W
    [0.12, 0.45, 0.33, 0.02, 0.08],   # N1
    [0.03, 0.07, 0.72, 0.12, 0.06],   # N2
    [0.01, 0.02, 0.18, 0.77, 0.02],   # N3
    [0.05, 0.10, 0.07, 0.00, 0.78],   # REM
])
# ambiguous-boundary pairs for label noise (where human scorers disagree)
_CONFUSABLE = {0: [1], 1: [0, 4, 2], 2: [1, 3], 3: [2], 4: [1]}


def _stage_epoch(rng: np.random.Generator, stage: int, t: np.ndarray,
                 subj: Dict[str, float]) -> np.ndarray:
    """One 30 s epoch of stage-conditioned synthetic EEG.

    Classes share spectral bands on a common 1/f background so they
    overlap realistically instead of being separable by a single tone:
    W/N1 share alpha-theta, N1/REM are near-twins (theta), N2 differs
    from N1 mainly by brief spindle/K-complex events, N3 by delta power.
    """
    from sleepgen.data.synthetic import pink_noise

    n = len(t)

    def tone(freq, amp, jitter=0.05):
        f = freq * (1.0 + jitter * rng.normal())
        return amp * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))

    def burst(freq, amp, dur_s, center_s):
        env = np.exp(-0.5 * ((t - center_s) / (dur_s / 2.0)) ** 2)
        return amp * env * np.sin(2 * np.pi * freq * t + rng.uniform(0, 2 * np.pi))

    x = 1.4 * pink_noise(rng, n)
    if stage == 0:  # Wake: alpha bursts + faint EMG-like fast activity
        for _ in range(rng.integers(1, 4)):
            x += burst(subj["alpha"], rng.uniform(0.35, 0.7),
                       rng.uniform(2.0, 6.0), rng.uniform(0, 30))
        x += tone(22.0, 0.18, 0.2) + tone(30.0, 0.12, 0.2)
        x += tone(subj["theta"], 0.2)  # drowsy-wake theta leak toward N1
    elif stage == 1:  # N1: theta, residual alpha — REM's near-twin
        x += tone(subj["theta"], 0.45) + tone(subj["alpha"], 0.2)
        x += tone(0.4, 0.2, 0.3)  # slow rolling eye movements
    elif stage == 2:  # N2: theta background + spindles + K-complexes
        x += tone(subj["theta"], 0.4) + tone(subj["delta"], 0.3)
        for _ in range(rng.integers(1, 3)):  # spindles: 0.5-1 s @ ~13 Hz
            x += burst(subj["spindle"], rng.uniform(0.5, 0.9),
                       rng.uniform(0.5, 1.0), rng.uniform(1, 29))
        if rng.random() < 0.6:  # K-complex: one ~1 s biphasic wave
            x += burst(1.2, rng.uniform(1.2, 2.0), 1.0, rng.uniform(2, 28))
    elif stage == 3:  # N3: elevated delta (continuum with N2, not a wall)
        x += tone(subj["delta"], 1.0) + tone(subj["delta"] * 1.9, 0.4)
        x += tone(subj["theta"], 0.3)
        if rng.random() < 0.3:  # residual spindles in light N3
            x += burst(subj["spindle"], rng.uniform(0.3, 0.5),
                       rng.uniform(0.4, 0.8), rng.uniform(1, 29))
    else:  # REM: theta + sawtooth-ish bursts, no spindles
        x += tone(subj["theta"] * 1.05, 0.5)
        for _ in range(rng.integers(0, 3)):
            x += burst(3.0, rng.uniform(0.2, 0.45),
                       rng.uniform(1.0, 3.0), rng.uniform(0, 30))
        x += tone(subj["alpha"], 0.08)
    return subj["gain"] * x


def make_synthetic_staged(
    n_recordings: int = 24,
    n_epochs_per_rec: int = 40,
    sfreq: int = 100,
    seed: int = 0,
    label_noise: float = 0.08,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hermetic staged-EEG fixture with realistic class overlap.

    Returns (windows (N, 3000, 1) standard-scaled, labels (N,),
    recording_ids (N,)) — the shape contract of ``load_staged_dataset``
    (cli/run_sleep_decode.py) without PhysioNet.

    Unlike the round-2 fixture (one clean tone per stage, which every
    decoder solved at balanced accuracy 1.0 and therefore pinned nothing),
    stages here are overlapping mixtures on a shared 1/f background
    (:func:`_stage_epoch`), each recording carries subject-specific gains
    and peak frequencies, stage sequences follow a sticky Markov chain
    (:data:`_STAGE_TRANSITIONS`), and ``label_noise`` of the labels are
    flipped to a confusable neighbor stage — mimicking inter-scorer
    disagreement. Decoders land strictly between chance (0.2) and 1.0,
    like the ~0.7-0.8 of the reference's real task
    (``src/testing/run_sleep_decode.py:174-245``).
    """
    rng = np.random.default_rng(seed)
    stages = ["Sleep stage W", "Sleep stage 1", "Sleep stage 2",
              "Sleep stage 3", "Sleep stage R"]
    t = np.arange(30 * sfreq, dtype=np.float64) / sfreq
    xs, ys, rids = [], [], []
    for rec in range(n_recordings):
        subj = {
            "gain": float(np.exp(0.3 * rng.normal())),
            "alpha": float(rng.normal(10.0, 0.3)),
            "theta": float(rng.normal(5.5, 0.25)),
            "delta": float(rng.uniform(0.8, 1.6)),
            "spindle": float(rng.normal(13.0, 0.35)),
        }
        sig, anns = [], []
        s = int(rng.integers(0, 5))
        for i in range(n_epochs_per_rec):
            s = int(rng.choice(5, p=_STAGE_TRANSITIONS[s]))
            sig.append(_stage_epoch(rng, s, t, subj))
            anns.append((i * 30.0, 30.0, stages[s]))
        x, y = windows_from_annotations(np.concatenate(sig), sfreq, anns)
        flip = rng.random(len(y)) < label_noise
        y = y.copy()
        for j in np.flatnonzero(flip):
            y[j] = rng.choice(_CONFUSABLE[int(y[j])])
        xs.append(standard_scale_windows(x))
        ys.append(y)
        rids.append(np.full(len(y), rec))
    return np.concatenate(xs), np.concatenate(ys), np.concatenate(rids)


class LabeledEpochDataset:
    """Pre-cut labeled 30 s epochs for class-conditional diffusion.

    Where :class:`~sleepgen.data.dataset.WindowDataset` samples random
    windows from whole recordings (the unconditional contract of the
    reference's dataset.py), conditional generation trains on the
    stage-aligned epochs themselves: windows (N, 3000, C) + labels (N,).
    ``epoch_batches`` yields ``(x_padded, y)`` tuples with the same
    3000->3072 border pad the unconditional pipeline applies
    (transforms.BORDER_PAD), so the same UNet geometry serves both.
    """

    def __init__(self, windows: np.ndarray, labels: np.ndarray,
                 pad: int | None = None):
        from sleepgen.data import transforms as T

        assert len(windows) == len(labels)
        if windows.ndim == 2:
            windows = windows[..., None]
        self.pad = T.BORDER_PAD if pad is None else pad
        self.windows = np.pad(
            windows.astype(np.float32),
            ((0, 0), (self.pad, self.pad), (0, 0)), mode="edge")
        self.labels = labels.astype(np.int32)

    def __len__(self) -> int:
        return len(self.windows)

    @property
    def padded_window(self) -> int:
        return self.windows.shape[1]

    @property
    def num_classes(self) -> int:
        return int(self.labels.max()) + 1

    def epoch_batches(self, batch_size: int, rng: np.random.Generator,
                      shuffle: bool = True, pad_multiple: int = 1):
        idx = np.arange(len(self))
        if shuffle:
            rng.shuffle(idx)
        for i in range(0, len(idx), batch_size):
            sel = idx[i:i + batch_size]
            x, y = self.windows[sel], self.labels[sel]
            if pad_multiple > 1:
                from sleepgen.parallel import pad_to_multiple

                x = pad_to_multiple(x, pad_multiple)
                y = pad_to_multiple(y, pad_multiple)
            yield x, y
