"""The reference user's full command-line workflow on synthesized raw files:

    raw PSG/Hypnogram EDFs
      -> convert_edfx       (preprocessing/convert_edfx.py)
      -> split_ids          (preprocessing/split_train_valid_test_sleep_edfx.py)
      -> train_autoencoderkl
      -> train_ldm
      -> sample_trials      (artifact contract: sample_{i}.npy / psd_list_{i}.npy)
      -> compute_mmds       (reconstruction + test-pair floor)
      -> compute_fid        (synth-vs-test + test-vs-test floor)

Every stage runs through its CLI main() exactly as a user would invoke it,
chained only by the on-disk artifacts (npy dirs, CSVs, run dirs) — the one
test that proves the CLIs interoperate end-to-end. Tiny model widths, but
REAL full-size geometry: 100 Hz recordings, window 3000 (+2x36 pad), the
3072 -> 768 AEKL stride. Slow-marked (several CPU compiles)."""
from pathlib import Path

import numpy as np
import pytest

from test_ingest import _write_edf

pytestmark = pytest.mark.slow


def _make_raw_edfx(data_dir: Path, n_subjects: int = 20):
    """Per subject: one 40 s, 100 Hz PSG (two EEG channels, distinct band
    mixture per subject) + a hypnogram EDF whose sleep annotations span the
    whole recording (so the +-30 min wake crop keeps all 4000 samples —
    window 3000 needs >= 3072 after padding... the dataset pads, the
    recording only needs >= 3000)."""
    sfreq = 100
    t = np.arange(40 * sfreq) / sfreq
    rng = np.random.default_rng(0)
    for s in range(n_subjects):
        f1, f2 = 2 + s * 0.5, 8 + s
        eeg1 = (60 * np.sin(2 * np.pi * f1 * t)
                + 20 * np.sin(2 * np.pi * f2 * t)
                + 5 * rng.standard_normal(len(t)))
        eeg2 = 40 * np.sin(2 * np.pi * (f1 + 1) * t) + 5 * rng.standard_normal(len(t))
        stem = f"SC4{s:02d}0E0"
        _write_edf(data_dir / f"{stem}-PSG.edf", [eeg1, eeg2],
                   ["EEG Fpz-Cz", "EEG Pz-Oz"], sfreq)
        anns = [(0.0, 30.0, "Sleep stage 2"), (39.0, 1.0, "Sleep stage R")]
        _write_edf(data_dir / f"SC4{s:02d}0EC-Hypnogram.edf",
                   [np.zeros(5 * sfreq)], ["Marker"], sfreq, anns)


def _tiny_configs(cfg_dir: Path, runs_dir: Path):
    from sleepgen.config import Config

    aekl = Config()
    aekl.dtype = "float32"
    aekl.train.output_dir = str(runs_dir)
    aekl.train.run_dir = "aekl"
    aekl.train.batch_size = 8
    aekl.train.n_epochs = 2
    aekl.train.val_interval = 1
    aekl.aekl.num_channels = [2, 2, 4]
    aekl.losses.kl_weight = 1e-9
    aekl.to_yaml(cfg_dir / "aekl.yaml")

    ldm = Config()
    ldm.dtype = "float32"
    ldm.train.output_dir = str(runs_dir)
    ldm.train.run_dir = "ldm"
    ldm.train.batch_size = 8
    ldm.train.n_epochs = 2
    ldm.train.val_interval = 1
    ldm.aekl.num_channels = [2, 2, 4]
    ldm.unet.model_channels = 8
    ldm.unet.norm_num_groups = 8
    ldm.unet.channel_mult = [1, 2]
    ldm.unet.attention_resolutions = [2]
    ldm.to_yaml(cfg_dir / "ldm.yaml")


def test_raw_edf_to_metrics_cli_chain(tmp_path):
    data_dir = tmp_path / "raw"
    npy_dir = tmp_path / "npy"
    cfg_dir = tmp_path / "cfg"
    runs_dir = tmp_path / "runs"
    for d in (data_dir, cfg_dir):
        d.mkdir()

    # -- ingest ------------------------------------------------------------
    _make_raw_edfx(data_dir)
    from sleepgen.cli.convert_edfx import main as convert_main
    convert_main(["--data_dir", str(data_dir), "--out_dir", str(npy_dir),
                  "--crop_wake_mins", "0.5"])
    per_chan = sorted(p.stem for p in npy_dir.glob("*Fpz-Cz.npy"))
    assert len(per_chan) == 20

    # -- subject split (sklearn-parity 60/20/20) ----------------------------
    import pandas as pd
    ids_csv = tmp_path / "ids.csv"
    pd.DataFrame({
        "subject": [int(n[3:5]) for n in per_chan],
        "FILE_NAME_EEG": per_chan,
    }).to_csv(ids_csv, index=False)
    from sleepgen.cli.split_ids import main as split_main
    split_main(["--ids_csv", str(ids_csv)])
    tr_csv, va_csv, te_csv = (tmp_path / f"ids_{k}.csv"
                              for k in ("train", "valid", "test"))
    n_tr, n_va, n_te = (len(pd.read_csv(c)) for c in (tr_csv, va_csv, te_csv))
    assert (n_tr, n_va, n_te) == (12, 4, 4)

    # -- stage 1: AEKL ------------------------------------------------------
    _tiny_configs(cfg_dir, runs_dir)
    from sleepgen.cli.train_autoencoderkl import main as aekl_main
    res1 = aekl_main([
        "--config_file", str(cfg_dir / "aekl.yaml"),
        "--path_train_ids", str(tr_csv), "--path_valid_ids", str(va_csv),
        "--path_pre_processed", str(npy_dir), "--dtype", "float32"])
    assert np.isfinite(res1.best_loss) and not res1.stopped_on_nan
    aekl_run = str(res1.run_dir)

    # -- stage 2: LDM (frozen stage-1 restored from the run dir) ------------
    from sleepgen.cli.train_ldm import main as ldm_main
    res2 = ldm_main([
        "--config_file", str(cfg_dir / "ldm.yaml"),
        "--autoencoderkl_config_file_path", str(cfg_dir / "aekl.yaml"),
        "--best_model_path", aekl_run,
        "--path_train_ids", str(tr_csv), "--path_valid_ids", str(va_csv),
        "--path_pre_processed", str(npy_dir), "--dtype", "float32"])
    assert np.isfinite(res2.best_loss) and not res2.stopped_on_nan
    ldm_run = str(res2.run_dir)

    # -- sampling: the reference artifact contract ---------------------------
    from sleepgen.cli.sample_trials import main as sample_main
    sample_main([
        "--output_dir", str(tmp_path / "samples"),
        "--best_model_path", aekl_run, "--diffusion_path", ldm_run,
        "--start_seed", "0", "--stop_seed", "8",
        "--num_inference_steps", "4", "--batch_size", "8"])
    sample_dir = tmp_path / "samples" / "samples_ldm_1_no-spectral_edfx"
    samples = sorted(sample_dir.glob("sample_*.npy"))
    assert len(samples) == 8
    for f in samples:
        x = np.load(f)
        assert x.shape == (1, 1, 3000) and np.isfinite(x).all()
    assert len(list(sample_dir.glob("psd_list_*.npy"))) == 8

    # -- metrics CLIs --------------------------------------------------------
    from sleepgen.cli.compute_mmds import main as mmds_main
    recon = mmds_main([
        "--best_model_path", aekl_run,
        "--path_test_ids", str(te_csv), "--path_pre_processed", str(npy_dir),
        "--output_dir", str(tmp_path / "metrics"), "--batch_size", "8"])
    floor = mmds_main([
        "--best_model_path", aekl_run,
        "--path_test_ids", str(te_csv), "--path_pre_processed", str(npy_dir),
        "--output_dir", str(tmp_path / "metrics"), "--mode", "test_pairs",
        "--batch_size", "8"])
    assert np.isfinite(recon) and np.isfinite(floor)
    assert -1.0 <= recon <= 1.0 and -1.0 <= floor <= 1.0

    from sleepgen.cli.compute_fid import main as fid_main
    fid = fid_main([
        "--path_test_ids", str(te_csv), "--path_pre_processed", str(npy_dir),
        "--sample_dir", str(sample_dir), "--batch_size", "8"])
    fid_floor = fid_main([
        "--path_test_ids", str(te_csv), "--path_pre_processed", str(npy_dir),
        "--batch_size", "8"])
    assert np.isfinite(fid) and fid >= -1e-6
    assert np.isfinite(fid_floor) and fid_floor >= -1e-6
