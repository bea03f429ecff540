"""ctypes bindings for the native data-loader core (window_gather.cpp).

The shared library is built lazily with g++ on first use and cached next
to the source; every entry point has a numpy fallback so the package
works without a toolchain.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "window_gather.cpp"
_SO = _HERE / "_window_gather.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(_SO), str(_SRC), "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return ctypes.CDLL(str(_SO))
    except Exception:
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            if _SO.exists():
                try:
                    _lib = ctypes.CDLL(str(_SO))
                except OSError:
                    _lib = _build()
            else:
                _lib = _build()
            if _lib is not None:
                _lib.sg_normalize_recording.argtypes = [
                    ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                    ctypes.c_double, ctypes.POINTER(ctypes.c_float)]
                _lib.sg_gather_windows.argtypes = [
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_float)]
                _lib.sg_gather_epochs.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int64, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_float)]
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def normalize_recording_native(raw: np.ndarray, factor: float = 1e6) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.float64).reshape(-1)
    out = np.empty(raw.shape, np.float32)
    lib.sg_normalize_recording(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(raw)), ctypes.c_double(factor),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def gather_windows_native(
    recordings, starts: np.ndarray, window: int, pad: int
) -> Optional[np.ndarray]:
    """One padded window per recording -> (n, window+2*pad, 1) float32."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(recordings)
    ptrs = (ctypes.c_void_p * n)(
        *[r.ctypes.data_as(ctypes.c_void_p).value for r in recordings])
    starts = np.ascontiguousarray(starts, np.int64)
    out = np.empty((n, window + 2 * pad), np.float32)
    lib.sg_gather_windows(
        ptrs, starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n), ctypes.c_int64(window), ctypes.c_int64(pad),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[..., None]


def gather_epochs_native(rec: np.ndarray, starts: np.ndarray,
                         window: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    rec = np.ascontiguousarray(rec, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    out = np.empty((len(starts), window), np.float32)
    lib.sg_gather_epochs(
        rec.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(starts)), ctypes.c_int64(window),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
