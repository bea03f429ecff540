"""SHHS-axis flagship demo on TPU — VERDICT r3 next-step #8.

The 2-channel SHHS ingest path (reference
``src/preprocessing/convert_shhs.py:32-132``: EDF + profusion XML ->
stage-mapped, 18 Hz low-pass, resample 125->100 Hz, ±30 min non-wake
crop, per-channel .npy) had unit tests but no e2e demo. This script
synthesizes an SHHS-shaped fixture (2 EEG channels per subject at the
native 125 Hz, profusion stage XMLs), runs it through the REAL CLI chain
exactly as an NSRR user would —

    convert_shhs -> subject split -> train_autoencoderkl --dataset shhs
    -> train_ldm -> sample_trials -> compute_mmds / compute_fid

— and gates quality (MS-SSIM recon + test-pair floor, FID + floor, PSD
correlation). Writes report.json for the DEMO_SHHS artifact.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def make_fixture(out: Path, n_subjects: int, duration_s: float) -> Path:
    """Synthesize shhs1-<nsrrid>.edf + profusion XMLs + the nsrrid CSV."""
    import pandas as pd

    from sleepgen.data.edf import write_edf
    from sleepgen.data.synthetic import synthetic_recording

    edf_dir = out / "edf"
    ann_dir = out / "ann"
    edf_dir.mkdir(parents=True, exist_ok=True)
    ann_dir.mkdir(parents=True, exist_ok=True)
    sfreq = 125.0  # SHHS native rate: the 125->100 Hz resample is the point
    n_ep = int(duration_s // 30)
    assert n_ep >= 5, f"need >=5 epochs for a non-wake span, got {n_ep}"
    # wake bookends + a cycling sleep architecture (profusion codes:
    # 0 W, 1 N1, 2 N2, 3 N3, 4 N4, 5 REM — N4 and REM exercise the
    # stage remap, convert_shhs.py:86-92)
    cycle = [1, 2, 3, 4, 2, 5]
    ids = []
    for s in range(n_subjects):
        nsrrid = 200001 + s
        c4 = synthetic_recording(7_000_000 + 2 * s, duration_s, sfreq) * 1e6
        c3 = synthetic_recording(7_000_001 + 2 * s, duration_s, sfreq) * 1e6
        write_edf(edf_dir / f"shhs1-{nsrrid}.edf", [c4, c3],
                  ["EEG C4-A1", "EEG C3-A2"], sfreq)
        stages = [0, 0] + [cycle[k % 6] for k in range(n_ep - 4)] + [0, 0]
        xml = ("<CMPStudyConfig><EpochLength>30</EpochLength><a/><b/><c/>"
               "<SleepStages>"
               + "".join(f"<SleepStage>{v}</SleepStage>" for v in stages)
               + "</SleepStages></CMPStudyConfig>")
        (ann_dir / f"shhs1-{nsrrid}-profusion.xml").write_text(xml)
        ids.append(nsrrid)
    csv = out / "ids_nsrrid.csv"
    pd.DataFrame({"nsrrid": ids}).to_csv(csv, index=False)
    return csv


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="/tmp/sleepgen_demo_shhs")
    p.add_argument("--report", type=str, default=None)
    p.add_argument("--n_subjects", type=int, default=40)
    p.add_argument("--duration_s", type=float, default=600.0)
    p.add_argument("--aekl_epochs", type=int, default=400)
    p.add_argument("--ldm_epochs", type=int, default=1200)
    p.add_argument("--n_samples", type=int, default=128)
    p.add_argument("--sampler", type=str, default="dpm++2m")
    p.add_argument("--sample_steps", type=int, default=20)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--small", action="store_true",
                   help="tiny widths for a CPU smoke run")
    args = p.parse_args()

    import pandas as pd

    from sleepgen.config import Config
    from sleepgen.utils.profiling import enable_compilation_cache, tpu_contact

    enable_compilation_cache()
    tpu_contact()
    t0 = time.time()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # 1. fixture + ingest through the CLI
    csv = make_fixture(out, args.n_subjects, args.duration_s)
    npy = out / "npy"
    from sleepgen.cli.convert_shhs import main as convert_main

    convert_main(["--edf_dir", str(out / "edf"), "--ann_dir", str(out / "ann"),
                  "--out_dir", str(npy), "--ids_csv", str(csv)])
    chan_files = sorted(p.name for p in npy.glob("shhs1-*-C*.npy"))
    print(f"[{time.time()-t0:.0f}s] converted {len(chan_files)} channel files",
          flush=True)
    assert len(chan_files) == 2 * args.n_subjects

    # 2. subject-level split; both channels of a subject stay together
    # (SHHS CSV contract: FILE_NAME_EEG carries .npy, dataset.py:33-59)
    from sleepgen.data.splits import split_subjects

    df = pd.DataFrame({
        "subject": [int(n.split("-")[1]) for n in chan_files],
        "FILE_NAME_EEG": chan_files,
    })
    tr, va, te = split_subjects(df)
    tr_csv, va_csv, te_csv = (out / f"ids_{k}.csv"
                              for k in ("train", "valid", "test"))
    tr.to_csv(tr_csv, index=False)
    va.to_csv(va_csv, index=False)
    te.to_csv(te_csv, index=False)
    print(f"[{time.time()-t0:.0f}s] split {len(tr)}/{len(va)}/{len(te)} "
          f"channel recordings", flush=True)

    # 3. configs (flagship widths; epochs per flags)
    cfg = Config()
    cfg.dtype = args.dtype
    cfg.dataset = "shhs"
    cfg.train.output_dir = str(out / "runs")
    cfg.train.batch_size = 64
    cfg.train.n_epochs = args.aekl_epochs
    cfg.train.val_interval = max(args.aekl_epochs // 4, 1)
    cfg.aekl.num_channels = [2, 2, 4] if args.small else [32, 32, 64]
    if args.small:
        cfg.unet.model_channels = 16
        cfg.unet.norm_num_groups = 8
        cfg.unet.channel_mult = [1, 2]
        cfg.unet.attention_resolutions = [2]
    cfg.losses.kl_weight = 1e-9
    cfg.fast_train_math = not args.small
    cfg.to_yaml(out / "aekl_shhs.yaml")
    cfg.train.n_epochs = args.ldm_epochs
    cfg.train.val_interval = max(args.ldm_epochs // 4, 1)
    cfg.to_yaml(out / "ldm_shhs.yaml")

    # 4. the user-facing CLI chain
    from sleepgen.cli.train_autoencoderkl import main as aekl_main

    print(f"[{time.time()-t0:.0f}s] train_autoencoderkl --dataset shhs "
          f"({args.aekl_epochs} epochs)...", flush=True)
    res1 = aekl_main([
        "--config_file", str(out / "aekl_shhs.yaml"),
        "--path_train_ids", str(tr_csv), "--path_valid_ids", str(va_csv),
        "--path_pre_processed", str(npy), "--dataset", "shhs",
        "--dtype", args.dtype])
    print(f"[{time.time()-t0:.0f}s] AEKL best val L1 {res1.best_loss:.5f}",
          flush=True)
    assert np.isfinite(res1.best_loss) and not res1.stopped_on_nan

    from sleepgen.cli.train_ldm import main as ldm_main

    print(f"[{time.time()-t0:.0f}s] train_ldm ({args.ldm_epochs} epochs)...",
          flush=True)
    res2 = ldm_main([
        "--config_file", str(out / "ldm_shhs.yaml"),
        "--autoencoderkl_config_file_path", str(out / "aekl_shhs.yaml"),
        "--best_model_path", str(res1.run_dir),
        "--path_train_ids", str(tr_csv), "--path_valid_ids", str(va_csv),
        "--path_pre_processed", str(npy), "--dataset", "shhs",
        "--dtype", args.dtype])
    print(f"[{time.time()-t0:.0f}s] LDM best val loss {res2.best_loss:.5f}",
          flush=True)

    from sleepgen.cli.sample_trials import main as sample_main

    print(f"[{time.time()-t0:.0f}s] sample_trials ({args.sampler}-"
          f"{args.sample_steps}, {args.n_samples} seeds)...", flush=True)
    sample_main([
        "--output_dir", str(out / "samples"),
        "--best_model_path", str(res1.run_dir),
        "--diffusion_path", str(res2.run_dir),
        "--start_seed", "0", "--stop_seed", str(args.n_samples),
        "--sampler", args.sampler,
        "--num_inference_steps", str(args.sample_steps),
        "--batch_size", "64", "--type_dataset", "shhs", "--no_psd"])
    sample_dirs = list((out / "samples").glob("samples_ldm_*"))
    assert len(sample_dirs) == 1, sample_dirs
    sample_dir = sample_dirs[0]

    from sleepgen.cli.compute_mmds import main as mmds_main

    recon = mmds_main([
        "--best_model_path", str(res1.run_dir), "--dataset", "shhs",
        "--path_test_ids", str(te_csv), "--path_pre_processed", str(npy),
        "--output_dir", str(out / "metrics"), "--batch_size", "64"])
    floor = mmds_main([
        "--best_model_path", str(res1.run_dir), "--dataset", "shhs",
        "--path_test_ids", str(te_csv), "--path_pre_processed", str(npy),
        "--output_dir", str(out / "metrics"), "--mode", "test_pairs",
        "--batch_size", "64"])

    from sleepgen.cli.compute_fid import main as fid_main

    fid = fid_main([
        "--path_test_ids", str(te_csv), "--path_pre_processed", str(npy),
        "--dataset", "shhs", "--sample_dir", str(sample_dir),
        "--batch_size", "64"])
    fid_floor = fid_main([
        "--path_test_ids", str(te_csv), "--path_pre_processed", str(npy),
        "--dataset", "shhs", "--batch_size", "64"])

    # PSD correlation of samples vs held-out test windows
    import jax.numpy as jnp

    from sleepgen.data import load_split
    from sleepgen.data.transforms import center_crop_valid, to_blc
    from sleepgen.eval.psd import welch_psd

    test_ds = load_split(te_csv, npy, "shhs")
    test_w = center_crop_valid(
        test_ds.epoch_windows(np.random.default_rng(0)))
    sigs = to_blc(np.concatenate(
        [np.load(f) for f in sorted(sample_dir.glob("sample_*.npy"))]))
    pt, _ = welch_psd(jnp.asarray(test_w[..., 0]), fmax=18.0)
    ps, _ = welch_psd(jnp.asarray(sigs[..., 0]), fmax=18.0)
    psd_corr = float(np.corrcoef(
        np.log10(np.asarray(pt).mean(0) + 1e-30),
        np.log10(np.asarray(ps).mean(0) + 1e-30))[0, 1])

    report = {
        "dataset": "shhs",
        "n_subjects": args.n_subjects,
        "n_channel_recordings": len(chan_files),
        "native_sfreq": 125.0,
        "aekl_best_val_l1": res1.best_loss,
        "ldm_best_val_loss": res2.best_loss,
        "ms_ssim_reconstruction": float(recon),
        "ms_ssim_test_pairs_floor": float(floor),
        "fid_synth_vs_test": float(fid),
        "fid_test_vs_test_floor": float(fid_floor),
        "psd_log_correlation": psd_corr,
        "sampler": f"{args.sampler}-{args.sample_steps}",
        "epochs": [args.aekl_epochs, args.ldm_epochs],
        "wall_clock_sec": round(time.time() - t0, 1),
    }
    (out / "report.json").write_text(json.dumps(report, indent=1))
    if args.report:
        Path(args.report).write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
