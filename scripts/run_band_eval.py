"""Per-band metric table for a trained flagship run — VERDICT r3 missing #3.

Drives ``cli/band_eval.py`` (the re-design of the reference's per-band
suite, ``src/testing/MSSIM_test.py:118-168`` / ``FID_test.py:84-230``)
against a demo_synthetic_e2e run: regenerates that demo's synthetic
fixture deterministically, materializes its TEST split as a
reference-layout .npy tree + ids CSV, then runs all four modes
(test-pair floor / synthetic pairs / synth-vs-test / reconstruction)
with MS-SSIM + FID per band (delta/theta/alpha/broadband, kernel 16 as in
the reference's tailored SSIM). One aggregated JSON is the BANDS artifact.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--aekl_run", type=str, required=True,
                   help="demo_synthetic_e2e AEKL run dir")
    p.add_argument("--sample_dir", type=str, required=True,
                   help="dir with the demo's sample_*.npy artifacts")
    p.add_argument("--out", type=str, default="/tmp/sleepgen_band_eval")
    p.add_argument("--report", type=str, default=None,
                   help="also copy the aggregated JSON to this path")
    p.add_argument("--n_recordings", type=int, default=48,
                   help="must match the demo fixture")
    p.add_argument("--duration_s", type=float, default=300.0)
    p.add_argument("--usleep_checkpoint", type=str, default=None,
                   help="trained USleep run dir for the FID feature space "
                        "(default: seeded random init, the hermetic proxy)")
    p.add_argument("--kernel_size", type=int, default=16,
                   help="reference tailored-SSIM band kernel "
                        "(testing/MSSIM_test.py kernel_size=16)")
    p.add_argument("--max_windows", type=int, default=128)
    args = p.parse_args()

    from sleepgen.data.synthetic import synthetic_recording
    from sleepgen.cli.band_eval import main as band_main
    from sleepgen.utils.profiling import enable_compilation_cache, tpu_contact

    enable_compilation_cache()
    tpu_contact()
    t0 = time.time()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # the demo's test split = recordings [n_tr + n_va, n_recordings) of
    # make_synthetic_dataset(n, duration_s, seed=0) — regenerate exactly
    # (seed contract: synthetic_recording(0 * 10_000 + i))
    n_tr = int(args.n_recordings * 0.7)
    n_va = int(args.n_recordings * 0.15)
    npy = out / "npy"
    npy.mkdir(exist_ok=True)
    rows = []
    for i in range(n_tr + n_va, args.n_recordings):
        rec = synthetic_recording(i, args.duration_s)
        name = f"TEST{i:03d}-Fpz-Cz"
        np.save(npy / f"{name}.npy", rec[None, :])
        rows.append({"FILE_NAME_EEG": name, "subject": i})
    import pandas as pd

    csv = out / "ids_test.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    print(f"[{time.time()-t0:.0f}s] test split: {len(rows)} recordings",
          flush=True)

    common = ["--metric", "both", "--output_dir", str(out),
              "--kernel_size", str(args.kernel_size),
              "--max_windows", str(args.max_windows),
              "--path_test_ids", str(csv), "--path_pre_processed", str(npy)]
    if args.usleep_checkpoint:
        common += ["--usleep_checkpoint", args.usleep_checkpoint]

    results = {}
    for mode, extra in [
        ("test_pairs", []),
        ("sample_pairs", ["--sample_dir", args.sample_dir]),
        ("sample_vs_test", ["--sample_dir", args.sample_dir]),
        ("reconstruction", ["--best_model_path", args.aekl_run]),
    ]:
        print(f"[{time.time()-t0:.0f}s] band_eval --mode {mode}", flush=True)
        band_main(["--mode", mode] + common + extra)
        results[mode] = json.loads(
            (out / f"band_eval_{mode}_both_edfx.json").read_text())

    report = {
        "modes": results,
        "kernel_size": args.kernel_size,
        "usleep_checkpoint": args.usleep_checkpoint,
        "sample_dir": args.sample_dir,
        "aekl_run": args.aekl_run,
        "n_test_recordings": len(rows),
        "wall_clock_sec": round(time.time() - t0, 1),
    }
    (out / "report.json").write_text(json.dumps(report, indent=1))
    if args.report:
        Path(args.report).write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
