"""Data pipeline tests — transform semantics + split parity vs sklearn."""
import numpy as np

from sleepgen.data import (
    BORDER_PAD,
    PADDED_SIZE,
    WINDOW_SIZE,
    WindowDataset,
    center_crop_valid,
    make_synthetic_dataset,
    normalize_recording,
    split_subjects,
    to_bcl,
    to_blc,
)


def test_normalize_recording_matches_monai_semantics():
    """ScaleIntensity(factor=f) multiplies by (1+f); then min-max [0,1]."""
    rng = np.random.default_rng(0)
    raw = rng.normal(size=5000) * 50e-6
    x = normalize_recording(raw)
    assert x.min() == 0.0 and x.max() == 1.0
    # affine invariance: same result as direct min-max of raw
    direct = (raw - raw.min()) / (raw.max() - raw.min())
    np.testing.assert_allclose(x, direct.astype(np.float32), atol=1e-6)


def test_window_dataset_geometry_and_determinism():
    raws = make_synthetic_dataset(n_recordings=6, duration_s=60.0)
    ds = WindowDataset.from_raw(raws)
    assert ds.padded_window == PADDED_SIZE == 3072

    rng = np.random.default_rng(42)
    wins = ds.epoch_windows(rng)
    assert wins.shape == (6, 3072, 1)
    # border pad is zero
    assert np.all(wins[:, :BORDER_PAD] == 0) and np.all(wins[:, -BORDER_PAD:] == 0)
    assert np.all(wins[:, BORDER_PAD:-BORDER_PAD] >= 0)

    # same seed -> same windows; different seed -> different crops
    wins2 = ds.epoch_windows(np.random.default_rng(42))
    np.testing.assert_array_equal(wins, wins2)
    wins3 = ds.epoch_windows(np.random.default_rng(43))
    assert not np.array_equal(wins, wins3)

    crop = center_crop_valid(wins)
    assert crop.shape == (6, WINDOW_SIZE, 1)


def test_epoch_batches_pad_multiple():
    raws = make_synthetic_dataset(n_recordings=5, duration_s=60.0)
    ds = WindowDataset.from_raw(raws)
    batches = list(ds.epoch_batches(4, np.random.default_rng(0), pad_multiple=4))
    assert [b.shape[0] for b in batches] == [4, 4]  # 5 -> 4 + pad(1->4)


def test_split_matches_sklearn():
    import pandas as pd
    from sklearn.model_selection import train_test_split

    df = pd.DataFrame({"subject": np.repeat(np.arange(20), 2), "x": np.arange(40)})
    tr, va, te = split_subjects(df, seed=42)

    subs = df["subject"].unique()
    sk_train, sk_test = train_test_split(subs, test_size=0.2, random_state=42)
    sk_train, sk_valid = train_test_split(sk_train, test_size=0.25, random_state=42)
    assert set(tr["subject"]) == set(sk_train)
    assert set(va["subject"]) == set(sk_valid)
    assert set(te["subject"]) == set(sk_test)
    # disjoint at subject level
    assert not (set(tr["subject"]) & set(te["subject"]))


def test_layout_converters_roundtrip():
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)  # (B, C, L)
    np.testing.assert_array_equal(to_bcl(to_blc(x)), x)


def test_split_matches_published_reference_splits():
    """Our subject split reproduces the reference's SHIPPED split CSVs
    exactly (data/ids/ids_sleep_edfx_cassette_double_{train,valid,test}.csv)."""
    import pytest
    from pathlib import Path
    import pandas as pd

    base = Path("/root/reference/data/ids/ids_sleep_edfx_cassette_double")
    if not base.with_suffix(".csv").exists():
        pytest.skip("reference tree unavailable")
    df = pd.read_csv(base.with_suffix(".csv"))
    tr, va, te = split_subjects(df)
    for name, got in [("train", tr), ("valid", va), ("test", te)]:
        want = pd.read_csv(f"{base}_{name}.csv")
        assert set(got["subject"]) == set(want["subject"]), name
        assert len(got) == len(want), name


def test_from_csv_shhs_layout(tmp_path):
    """SHHS CSV contract: FILE_NAME_EEG already carries .npy (no suffix
    appended, reference dataset.py:33-59) and recordings are 1-D (T,)
    per-channel arrays from convert_shhs; edfx ships (1, T). Both load to
    the same normalized (T,) recordings."""
    import pandas as pd

    rec = np.random.default_rng(0).standard_normal(4000)
    np.save(tmp_path / "shhs1-200001-C4A1.npy", rec)           # (T,)
    np.save(tmp_path / "SC4001E0-Fpz-Cz.npy", rec[None, :])    # (1, T)
    pd.DataFrame([{"FILE_NAME_EEG": "shhs1-200001-C4A1.npy"}]).to_csv(
        tmp_path / "shhs.csv", index=False)
    pd.DataFrame([{"FILE_NAME_EEG": "SC4001E0-Fpz-Cz"}]).to_csv(
        tmp_path / "edfx.csv", index=False)

    ds_shhs = WindowDataset.from_csv(tmp_path / "shhs.csv", tmp_path,
                                     dataset="shhs")
    ds_edfx = WindowDataset.from_csv(tmp_path / "edfx.csv", tmp_path,
                                     dataset="edfx")
    assert len(ds_shhs) == len(ds_edfx) == 1
    np.testing.assert_allclose(ds_shhs.recordings[0], ds_edfx.recordings[0])
