from sleepgen.data.dataset import WindowDataset, load_split
from sleepgen.data.splits import split_subjects, write_splits
from sleepgen.data.synthetic import make_synthetic_dataset, write_synthetic_npy_tree
from sleepgen.data.transforms import (
    BORDER_PAD,
    PADDED_SIZE,
    SFREQ,
    WINDOW_SIZE,
    center_crop_valid,
    normalize_recording,
    to_bcl,
    to_blc,
)

__all__ = [
    "WindowDataset",
    "load_split",
    "split_subjects",
    "write_splits",
    "make_synthetic_dataset",
    "write_synthetic_npy_tree",
    "BORDER_PAD",
    "PADDED_SIZE",
    "SFREQ",
    "WINDOW_SIZE",
    "center_crop_valid",
    "normalize_recording",
    "to_bcl",
    "to_blc",
]
