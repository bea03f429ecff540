"""Windowed EEG dataset + loaders.

Parity target: reference ``src/dataset/dataset.py`` — CSV of recording
ids -> per-recording .npy -> MONAI PersistentDataset + DataLoader. The
semantics preserved:
  * one window per recording per epoch (the dataset item *is* the
    recording; the crop transform yields a fresh random window each epoch);
  * train loader shuffle=False / valid-test shuffle=True
    (dataset.py:74,91 — preserved as documented behavior, it only affects
    within-batch ordering);
  * drop_last=False: short final batches are padded up to the mesh size by
    repeating the tail (sleepgen.parallel.pad_to_multiple) and masked out
    of eval reductions.

TPU re-design: recordings are normalized once (affine per-recording
transforms commute with cropping — see transforms.py) and cached in host
RAM; each ``epoch_batches`` call draws crop offsets with a numpy
Generator and yields dense (B, L, 1) float32 arrays ready for
device_put. No worker processes: window assembly for the reference's
scale (hundreds of recordings) is microseconds per batch, and the TPU
step overlaps host assembly via dispatch pipelining.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator, List, Optional, Sequence

import numpy as np

from sleepgen.data import transforms as T


@dataclass
class WindowDataset:
    """Normalized recordings + windowing logic."""

    recordings: List[np.ndarray]  # each (T,) float32 in [0, 1]
    names: List[str] = field(default_factory=list)
    window: int = T.WINDOW_SIZE
    pad: int = T.BORDER_PAD

    def __post_init__(self):
        if not self.names:
            self.names = [f"rec_{i}" for i in range(len(self.recordings))]
        self.lengths = np.array([len(r) for r in self.recordings])
        assert (self.lengths >= self.window).all(), "recording shorter than window"

    def __len__(self) -> int:
        return len(self.recordings)

    @property
    def padded_window(self) -> int:
        return self.window + 2 * self.pad

    @classmethod
    def from_raw(cls, raws: Sequence[np.ndarray], names: Optional[List[str]] = None,
                 **kw) -> "WindowDataset":
        recs = [T.normalize_recording(r) for r in raws]
        return cls(recordings=recs, names=list(names or []), **kw)

    @classmethod
    def from_csv(cls, csv_path: str | Path, basepath: str | Path,
                 dataset: str = "edfx", **kw) -> "WindowDataset":
        """CSV contract of the reference (dataset.py:33-59): column
        FILE_NAME_EEG names ``{basepath}/{name}.npy`` (edfx appends .npy)."""
        import pandas as pd

        df = pd.read_csv(csv_path)
        suffix = ".npy" if dataset == "edfx" else ""
        raws, names = [], []
        for _, row in df.iterrows():
            p = Path(basepath) / f"{row['FILE_NAME_EEG']}{suffix}"
            raws.append(np.load(p))
            names.append(str(row["FILE_NAME_EEG"]))
        return cls.from_raw(raws, names, **kw)

    # -- batch iteration -----------------------------------------------------
    def epoch_windows(self, rng: np.random.Generator) -> np.ndarray:
        """One random window per recording -> (N, L_padded, 1) float32.
        Uses the native C++ gather (data/native) when built; numpy
        fallback otherwise — identical output either way."""
        starts = T.random_starts(rng, self.lengths, self.window)
        from sleepgen.data.native import gather_windows_native

        native = gather_windows_native(self.recordings, starts,
                                       self.window, self.pad)
        if native is not None:
            return native
        out = np.empty((len(self), self.padded_window, 1), np.float32)
        for i, (rec, s) in enumerate(zip(self.recordings, starts)):
            out[i, :, 0] = T.crop_and_pad(rec, s, self.window, self.pad)
        return out

    def epoch_batches(
        self,
        batch_size: int,
        rng: np.random.Generator,
        shuffle: bool = False,
        pad_multiple: int = 1,
    ) -> Iterator[np.ndarray]:
        wins = self.epoch_windows(rng)
        idx = np.arange(len(wins))
        if shuffle:
            rng.shuffle(idx)
        for i in range(0, len(idx), batch_size):
            batch = wins[idx[i : i + batch_size]]
            if pad_multiple > 1:
                from sleepgen.parallel import pad_to_multiple

                batch = pad_to_multiple(batch, pad_multiple)
            yield batch


def load_split(
    ids_csv: str | Path, basepath: str | Path, dataset: str = "edfx"
) -> WindowDataset:
    return WindowDataset.from_csv(ids_csv, basepath, dataset)
