"""Native C++ loader parity + build tests."""
import numpy as np
import pytest

from sleepgen.data.native import (
    gather_epochs_native,
    gather_windows_native,
    native_available,
    normalize_recording_native,
)


@pytest.fixture(scope="module")
def lib_ok():
    if not native_available():
        pytest.skip("g++ build unavailable")
    return True


def test_normalize_parity(lib_ok):
    from sleepgen.data.transforms import (
        scale_intensity_factor,
        scale_intensity_range,
    )

    rng = np.random.default_rng(0)
    raw = rng.normal(size=100_000) * 50e-6
    got = normalize_recording_native(raw)
    want = scale_intensity_range(scale_intensity_factor(raw, 1e6), 0, 1)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=2e-7)
    assert got.dtype == np.float32


def test_gather_windows_parity(lib_ok):
    from sleepgen.data.transforms import crop_and_pad

    rng = np.random.default_rng(1)
    recs = [rng.random(5000).astype(np.float32) for _ in range(7)]
    starts = np.array([0, 100, 999, 1, 2000, 1500, 1999], np.int64)
    got = gather_windows_native(recs, starts, window=3000, pad=36)
    assert got.shape == (7, 3072, 1)
    for i in range(7):
        want = crop_and_pad(recs[i], starts[i], 3000, 36)
        np.testing.assert_array_equal(got[i, :, 0], want)


def test_gather_epochs(lib_ok):
    rec = np.arange(10_000, dtype=np.float32)
    starts = np.array([0, 3000, 6000], np.int64)
    got = gather_epochs_native(rec, starts, 3000)
    assert got.shape == (3, 3000)
    np.testing.assert_array_equal(got[1], rec[3000:6000])


def test_dataset_uses_native_transparently():
    """WindowDataset output must be identical whether or not the native
    path kicks in (same RNG, same windows)."""
    from sleepgen.data import WindowDataset, make_synthetic_dataset

    raws = make_synthetic_dataset(4, duration_s=60.0)
    ds = WindowDataset.from_raw(raws)
    w1 = ds.epoch_windows(np.random.default_rng(7))

    # numpy fallback path, forced
    import sleepgen.data.native as native_mod

    orig = native_mod.gather_windows_native
    try:
        native_mod.gather_windows_native = lambda *a, **k: None
        # dataset module imported the symbol lazily inside the method —
        # patch at source module level
        w2 = None
        from sleepgen.data import dataset as ds_mod
        w2 = ds.epoch_windows(np.random.default_rng(7))
    finally:
        native_mod.gather_windows_native = orig
    np.testing.assert_array_equal(w1, w2)
