"""Window transforms — parity with the reference's MONAI chain.

Reference chain (``src/dataset/dataset.py:10-30``):
  LoadImageD -> (EnsureChannelFirstD for SHHS) -> ScaleIntensityD(factor=1e6)
  -> ScaleIntensityD(minv=0, maxv=1) -> RandSpatialCropD(roi_size=[3000])
  -> BorderPadD(spatial_border=[36])  =>  (1, 3072) windows.

Notes on exact semantics:
  * MONAI ``ScaleIntensity(factor=f)`` multiplies by ``(1 + f)`` — the
    "numeric stability" x1e6 step is really x(1+1e6). The subsequent
    min-max to [0, 1] makes both steps affine-idempotent per recording, so
    we apply them once per recording at load time and cache the result.
  * The random crop is the only per-step randomness (train loader has
    shuffle=False, dataset.py:74 — randomness comes from RandSpatialCropD).

sleepgen layout is (B, L, C); converters to/from the reference's .npy
(B, C, L) artifact layout live here.
"""
from __future__ import annotations

import numpy as np

SFREQ = 100
WINDOW_SIZE = 30 * SFREQ  # 3000
BORDER_PAD = 36
PADDED_SIZE = WINDOW_SIZE + 2 * BORDER_PAD  # 3072


def scale_intensity_factor(x: np.ndarray, factor: float = 1e6) -> np.ndarray:
    """MONAI ScaleIntensityD(factor=f): multiply by (1 + f)."""
    return x * (1.0 + factor)


def scale_intensity_range(x: np.ndarray, minv: float = 0.0, maxv: float = 1.0) -> np.ndarray:
    """Min-max rescale to [minv, maxv] over the whole array."""
    lo, hi = x.min(), x.max()
    denom = hi - lo
    if denom == 0:
        return np.full_like(x, minv)
    return (x - lo) / denom * (maxv - minv) + minv


def normalize_recording(raw: np.ndarray, factor: float = 1e6) -> np.ndarray:
    """Full per-recording preprocessing (applied once, cached):
    x(1+1e6) then min-max to [0, 1]. Input (T,) or (1, T); output (T,)
    float32. Long recordings go through the native C++ path when built."""
    x = np.asarray(raw, dtype=np.float64).reshape(-1)
    if x.size >= 65536:
        from sleepgen.data.native import normalize_recording_native

        out = normalize_recording_native(x, factor)
        if out is not None:
            return out
    x = scale_intensity_factor(x, factor)
    x = scale_intensity_range(x, 0.0, 1.0)
    return x.astype(np.float32)


def crop_and_pad(
    rec: np.ndarray, start: int, window: int = WINDOW_SIZE, pad: int = BORDER_PAD
) -> np.ndarray:
    """One (window + 2*pad,) training window from a normalized recording."""
    seg = rec[start : start + window]
    return np.pad(seg, (pad, pad))


def random_starts(
    rng: np.random.Generator, lengths: np.ndarray, window: int = WINDOW_SIZE
) -> np.ndarray:
    """Random crop offsets, one per recording (RandSpatialCropD parity:
    uniform over valid positions)."""
    return (rng.random(len(lengths)) * (lengths - window + 1)).astype(np.int64)


def center_crop_valid(x: np.ndarray, pad: int = BORDER_PAD) -> np.ndarray:
    """Drop the border pad: the reference's ubiquitous [:, :, 36:-36]."""
    return x[..., pad:-pad, :] if x.ndim >= 2 else x[pad:-pad]


# -- layout converters -------------------------------------------------------
def to_blc(x: np.ndarray) -> np.ndarray:
    """(B, C, L) reference layout -> (B, L, C) sleepgen layout."""
    return np.ascontiguousarray(np.swapaxes(x, -1, -2))


def to_bcl(x: np.ndarray) -> np.ndarray:
    """(B, L, C) -> (B, C, L) for .npy artifact parity."""
    return np.ascontiguousarray(np.swapaxes(x, -1, -2))
