"""Automated invocations for the three CLIs the e2e chain test does not
reach (`cli/band_eval.py`, `cli/sample_trials_autoencoder.py`,
`cli/run_sleep_decode.py`) so no module under sleepgen/cli/ lacks an
automated caller. Each runs through its argparse main() on tiny hermetic
fixtures, exactly as a user would invoke it.

Parity anchors: reference ``src/testing/MSSIM_test.py:118-168`` /
``FID_test.py:84-230`` (band_eval), ``src/testing/
sample_trials_autoencoder.py:63-118``, ``src/testing/
run_sleep_decode_b.py`` (variant b single-window Chambon)."""
from pathlib import Path

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def npy_split(tmp_path_factory):
    """Six (1, T) per-channel recordings + an ids CSV, the convert_edfx
    output contract the eval CLIs consume."""
    d = tmp_path_factory.mktemp("npy")
    rng = np.random.default_rng(0)
    t = np.arange(9000) / 100.0
    names = []
    for s in range(6):
        sig = (40e-6 * np.sin(2 * np.pi * (2 + s) * t)
               + 10e-6 * rng.standard_normal(len(t)))
        name = f"SC4{s:02d}0E0-Fpz-Cz"
        np.save(d / f"{name}.npy", sig[None, :].astype(np.float64))
        names.append(name)
    csv = d / "ids_test.csv"
    pd.DataFrame({"subject": range(6), "FILE_NAME_EEG": names}).to_csv(
        csv, index=False)
    return d, csv


@pytest.fixture(scope="module")
def aekl_run(tmp_path_factory):
    """A minimal AEKL run dir (config.yaml + best_model checkpoint) without
    training — the artifact layout sample_trials_autoencoder and
    band_eval --mode reconstruction restore from."""
    import jax

    from sleepgen.config import Config
    from sleepgen.train.train_aekl import init_state
    from sleepgen.utils import CheckpointManager

    run = tmp_path_factory.mktemp("aekl_run")
    cfg = Config()
    cfg.dtype = "float32"
    cfg.aekl.num_channels = [2, 2, 4]
    cfg.to_yaml(run / "config.yaml")
    state, *_ = init_state(cfg, jax.random.PRNGKey(0), window=3072)
    ck = CheckpointManager(run)
    ck.save_best(jax.device_get(state.params_g))
    ck.close()
    return run


def test_band_eval_test_pairs(npy_split, tmp_path):
    from sleepgen.cli.band_eval import main

    npy_dir, csv = npy_split
    main(["--mode", "test_pairs", "--metric", "ms_ssim",
          "--path_test_ids", str(csv), "--path_pre_processed", str(npy_dir),
          "--output_dir", str(tmp_path), "--max_windows", "6"])
    out = tmp_path / "band_eval_test_pairs_ms_ssim_edfx.json"
    assert out.exists()
    import json

    res = json.loads(out.read_text())
    assert set(res) == {"all", "delta", "theta", "alpha"}
    for band, entry in res.items():
        assert -1.0 <= entry["ms_ssim_mean"] <= 1.0, band
        assert np.isfinite(entry["ms_ssim_std"]), band


def test_band_eval_fid_branch(npy_split, tmp_path):
    """The FID metric branch (random-init USleep feature space) per band —
    exercised on CPU before the TPU queue leans on it."""
    import json

    from sleepgen.cli.band_eval import main

    npy_dir, csv = npy_split
    main(["--mode", "test_pairs", "--metric", "fid",
          "--path_test_ids", str(csv), "--path_pre_processed", str(npy_dir),
          "--output_dir", str(tmp_path), "--max_windows", "6"])
    res = json.loads(
        (tmp_path / "band_eval_test_pairs_fid_edfx.json").read_text())
    for band, entry in res.items():
        assert np.isfinite(entry["fid"]) and entry["fid"] >= -1e-6, band


def test_band_eval_reconstruction(npy_split, aekl_run, tmp_path):
    from sleepgen.cli.band_eval import main

    npy_dir, csv = npy_split
    main(["--mode", "reconstruction", "--metric", "ms_ssim",
          "--best_model_path", str(aekl_run),
          "--path_test_ids", str(csv), "--path_pre_processed", str(npy_dir),
          "--output_dir", str(tmp_path), "--max_windows", "4"])
    import json

    res = json.loads(
        (tmp_path / "band_eval_reconstruction_ms_ssim_edfx.json").read_text())
    for band, entry in res.items():
        assert -1.0 <= entry["ms_ssim_mean"] <= 1.0, band


def test_sample_trials_autoencoder(npy_split, aekl_run, tmp_path):
    from sleepgen.cli.sample_trials_autoencoder import main

    npy_dir, csv = npy_split
    main(["--output_dir", str(tmp_path), "--stage1_path", str(aekl_run),
          "--path_train_ids", str(csv), "--path_pre_processed", str(npy_dir),
          "--batch_size", "4", "--no_figures"])
    out = tmp_path / "samples" / "2-2-4"
    files = sorted(out.glob("synthetic_trial_eeg_*.npy"))
    assert len(files) == 2  # 6 windows / batch 4
    x = np.load(files[0])
    assert x.shape == (4, 1, 3072) and np.isfinite(x).all()


def test_run_sleep_decode_variant_b(tmp_path):
    """Synthesized ingest outputs (<rec>-<ch>.npy + <rec>-annotation.npy)
    through the decode CLI's variant b on 2 epochs."""
    from sleepgen.cli.run_sleep_decode import main

    data = tmp_path / "npy"
    data.mkdir()
    rng = np.random.default_rng(1)
    t = np.arange(150 * 100) / 100.0
    anns = [(0.0, 30.0, "Sleep stage W"), (30.0, 30.0, "Sleep stage 1"),
            (60.0, 30.0, "Sleep stage 2"), (90.0, 30.0, "Sleep stage 3"),
            (120.0, 30.0, "Sleep stage R")]
    for s in range(6):
        sig = (30e-6 * np.sin(2 * np.pi * (1 + s) * t)
               + 8e-6 * rng.standard_normal(len(t)))
        np.save(data / f"SC4{s:02d}0E0-Fpz-Cz.npy", sig[None, :])
        np.save(data / f"SC4{s:02d}0E0-annotation.npy",
                np.array(anns, dtype=object), allow_pickle=True)

    out = tmp_path / "decode"
    main(["--data_dir", str(data), "--variant", "b", "--n_epochs", "2",
          "--batch_size", "8", "--output_dir", str(out), "--seed", "0"])
    import json

    hist = json.loads((out / "history.json").read_text())
    assert len(hist) == 2
    cm = np.load(out / "confusion_matrix.npy")
    assert cm.shape == (5, 5) and cm.sum() > 0
