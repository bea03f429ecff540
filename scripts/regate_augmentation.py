"""Multi-seed re-gate of the augmentation study (VERDICT r4 item 7).

The round-3 augmentation result (real-only 0.2466 -> +synthetic 0.2583
balanced acc, DEMO_COND_r3.json) is a single unrepeated run at near-noise
effect size. This script re-runs ONLY the decoder-training half of the
study across several seeds, reusing the conditional DM's generated
windows saved by scripts/demo_conditional.py — no DM retraining. Reports
mean +/- std for both arms and the per-seed deltas, so the claim
"synthetic augmentation helps" can be made (or demoted) honestly.

Mirrors the reference paper's central use case (stage-labeled synthetic
data for scarce-label decoding); the fixture/masks are bit-identical to
scripts/demo_conditional.py so the two reports are comparable.
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
    p.add_argument("--cond_out", type=str, default="/tmp/sleepgen_demo_cond",
                   help="demo_conditional.py output dir holding "
                        "generated_windows_g*.npy")
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--n_recordings", type=int, default=40)
    p.add_argument("--n_epochs_per_rec", type=int, default=60)
    p.add_argument("--n_per_class", type=int, default=64)
    p.add_argument("--decoder_epochs", type=int, default=60)
    p.add_argument("--report", type=str, default=None)
    args = p.parse_args()

    cond = Path(args.cond_out)
    # prefer the guided variant (demo_conditional uses gens[scales[-1]])
    gen_files = sorted(cond.glob("generated_windows_g*.npy"))
    if not gen_files:
        sys.exit(f"ERROR: no generated_windows_g*.npy under {cond} — run "
                 "scripts/demo_conditional.py first (the queue rebuilds it "
                 "when /tmp was wiped)")
    gen_file = gen_files[-1]

    from sleepgen.data.staging import make_synthetic_staged
    from sleepgen.nn.chambon import SleepStagerChambon2018
    from sleepgen.train.decode import train_decoder
    from sleepgen.utils.profiling import enable_compilation_cache, tpu_contact

    enable_compilation_cache()
    tpu_contact()
    t0 = time.time()

    # identical fixture + masks to demo_conditional.py
    x, y, rids = make_synthetic_staged(args.n_recordings,
                                       args.n_epochs_per_rec)
    n_tr = int(args.n_recordings * 0.8)
    va_m = rids >= n_tr
    n_low = max(2, int(n_tr * 0.1))
    low_m = rids < n_low

    gen = np.load(gen_file)
    labels = np.repeat(np.arange(5, dtype=np.int64),
                       len(gen) // 5)[: len(gen)]
    x_aug = np.concatenate([x[low_m], gen])
    y_aug = np.concatenate([y[low_m], labels])
    print(f"[{time.time()-t0:.0f}s] {int(low_m.sum())} real low-data epochs "
          f"+ {len(gen)} synthetic ({gen_file.name}); {args.seeds} seeds",
          flush=True)

    # per-seed persistence so a supervisor restart resumes at the first
    # unfinished seed instead of retraining all arms (queue sessions are
    # restart-prone; same pattern as the demo scripts' per-section JSONs)
    prog_path = cond / "aug_regate_progress.json"
    runs = (json.loads(prog_path.read_text())
            if prog_path.exists() else [])
    done = {r["seed"] for r in runs}
    for seed in range(args.seeds):
        if seed in done:
            print(f"[{time.time()-t0:.0f}s] seed {seed}: restored from "
                  f"{prog_path.name}", flush=True)
            continue
        dec_low = train_decoder(
            SleepStagerChambon2018(n_chans=1, sfreq=100, dropout=0.5),
            (x[low_m], y[low_m]), (x[va_m], y[va_m]),
            n_epochs=args.decoder_epochs, batch_size=64, seed=seed)
        dec_aug = train_decoder(
            SleepStagerChambon2018(n_chans=1, sfreq=100, dropout=0.5),
            (x_aug, y_aug), (x[va_m], y[va_m]),
            n_epochs=args.decoder_epochs, batch_size=64, seed=seed)
        runs.append({"seed": seed,
                     "real_only_bal_acc": dec_low.best_valid_bal_acc,
                     "real_plus_synth_bal_acc": dec_aug.best_valid_bal_acc})
        prog_path.write_text(json.dumps(runs))
        print(f"[{time.time()-t0:.0f}s] seed {seed}: real-only "
              f"{dec_low.best_valid_bal_acc:.4f} vs +synth "
              f"{dec_aug.best_valid_bal_acc:.4f}", flush=True)
    runs.sort(key=lambda r: r["seed"])

    low = np.array([r["real_only_bal_acc"] for r in runs])
    aug = np.array([r["real_plus_synth_bal_acc"] for r in runs])
    delta = aug - low
    report = {
        "generated_file": gen_file.name,
        "n_real_low": int(low_m.sum()),
        "n_synthetic": int(len(gen)),
        "seeds": args.seeds,
        "per_seed": runs,
        "real_only_mean": float(low.mean()),
        "real_only_std": float(low.std(ddof=1)) if len(low) > 1 else 0.0,
        "real_plus_synth_mean": float(aug.mean()),
        "real_plus_synth_std": float(aug.std(ddof=1)) if len(aug) > 1 else 0.0,
        "delta_mean": float(delta.mean()),
        "delta_std": float(delta.std(ddof=1)) if len(delta) > 1 else 0.0,
        "delta_min": float(delta.min()),
        # honest call: the effect is "established" at this substrate scale
        # only if every seed moved the same way and the mean clears 1 std
        "consistent_across_seeds": bool((delta > 0).all() or (delta < 0).all()),
        "wall_clock_sec": round(time.time() - t0, 1),
    }
    out = json.dumps(report, indent=1)
    print(out)
    if args.report:
        Path(args.report).write_text(out)


if __name__ == "__main__":
    main()
