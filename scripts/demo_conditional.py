"""Class-conditional generation gate on TPU (beyond-parity).

Trains a stage-conditional signal-space DM (config.unet.num_classes=5) on
the hermetic staged fixture, samples per-stage, and gates conditioning
with the decode harness: a Chambon variant-b decoder trained on REAL
staged epochs classifies the GENERATED epochs — balanced accuracy of
decoder(generated) vs the requested labels is the conditional-fidelity
score. (The reference's UNet carries num_classes but never trains it,
src/models/unet.py:379-380; this demo is the end-to-end proof sleepgen's
wiring works.) Also reports the per-class PSD-correlation matrix
(generated class i vs real class j) — diagonal dominance = class-specific
spectra, not just decoder-fooling artifacts.
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
    p.add_argument("--out", type=str, default="/tmp/sleepgen_demo_cond")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--n_recordings", type=int, default=40)
    p.add_argument("--n_epochs_per_rec", type=int, default=60)
    p.add_argument("--n_per_class", type=int, default=64)
    p.add_argument("--decoder_epochs", type=int, default=60)
    p.add_argument("--sample_steps", type=int, default=200)
    p.add_argument("--cond_dropout", type=float, default=0.15,
                   help="CFG label-dropout prob during training "
                        "(0 disables the guided evaluation)")
    p.add_argument("--guidance_scale", type=float, default=2.0,
                   help="classifier-free guidance scale for the guided "
                        "evaluation (plain conditional always reported)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sleepgen.config import Config
    from sleepgen.data.staging import LabeledEpochDataset, make_synthetic_staged
    from sleepgen.eval.psd import welch_psd
    from sleepgen.nn.chambon import SleepStagerChambon2018
    from sleepgen.sample.samplers import sample_dm_conditional
    from sleepgen.train.decode import balanced_accuracy, confusion_matrix, train_decoder
    from sleepgen.train.train_dm import train_dm
    from sleepgen.train.train_ldm import build_unet, make_schedule
    from sleepgen.utils import CheckpointManager
    from sleepgen.utils.profiling import tpu_contact

    tpu_contact()
    t0 = time.time()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # hermetic staged data; generator and decoder share the train split
    x, y, rids = make_synthetic_staged(args.n_recordings, args.n_epochs_per_rec)
    n_tr = int(args.n_recordings * 0.8)
    tr_m, va_m = rids < n_tr, rids >= n_tr
    train_ds = LabeledEpochDataset(x[tr_m], y[tr_m])
    valid_ds = LabeledEpochDataset(x[va_m], y[va_m])
    print(f"[{time.time()-t0:.0f}s] staged data: {len(train_ds)} train / "
          f"{len(valid_ds)} valid epochs", flush=True)

    cfg = Config()
    cfg.train.output_dir = str(out)
    cfg.train.batch_size = 128
    cfg.train.n_epochs = args.epochs
    cfg.train.val_interval = max(args.epochs // 2, 1)
    cfg.unet.image_size = 3072
    cfg.unet.num_classes = 5
    cfg.train.cond_dropout_prob = args.cond_dropout

    print(f"[{time.time()-t0:.0f}s] training conditional DM "
          f"({args.epochs} epochs)...", flush=True)
    res = train_dm(cfg, train_ds, valid_ds, run_name="cond_dm")
    print(f"[{time.time()-t0:.0f}s] cond DM best val loss: "
          f"{res.best_loss:.5f}", flush=True)

    # restore best and sample n_per_class per stage
    dtype = jnp.bfloat16
    unet = build_unet(cfg, 1, 1, dtype)
    window = train_ds.padded_window
    tpl = {"params": jax.device_get(unet.init(
        jax.random.PRNGKey(0), jnp.zeros((2, window, 1), jnp.float32),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32))["params"])}
    ck = CheckpointManager(res.run_dir)
    best = ck.restore_best(tpl, name="final_model")
    ck.close()
    sched = make_schedule(cfg)

    labels = np.repeat(np.arange(5, dtype=np.int32), args.n_per_class)

    # decoder gate: variant b trained on REAL train epochs
    print(f"[{time.time()-t0:.0f}s] training variant-b decoder on real "
          f"epochs ({args.decoder_epochs} epochs)...", flush=True)
    dec = train_decoder(SleepStagerChambon2018(n_chans=1, sfreq=100,
                                               dropout=0.5),
                        (x[tr_m], y[tr_m]), (x[va_m], y[va_m]),
                        n_epochs=args.decoder_epochs, batch_size=64)
    print(f"[{time.time()-t0:.0f}s] decoder real-valid bal acc: "
          f"{dec.best_valid_bal_acc:.4f}", flush=True)

    real_psd = []
    for c in range(5):
        pr, _ = welch_psd(jnp.asarray(x[va_m][y[va_m] == c][..., 0]), fmax=18.0)
        real_psd.append(np.log10(np.asarray(pr).mean(0) + 1e-30))

    def evaluate(guidance: float) -> dict:
        """Sample all stages at one guidance scale and gate with the
        real-data decoder + per-class PSD-correlation matrix."""
        print(f"[{time.time()-t0:.0f}s] sampling {len(labels)} windows "
              f"(DDIM-{args.sample_steps}, {args.n_per_class}/class, "
              f"guidance {guidance})...", flush=True)
        sample_jit = jax.jit(lambda params, yb, seeds: sample_dm_conditional(
            unet, params, sched, yb, jax.random.PRNGKey(0), seeds, window,
            num_steps=args.sample_steps, guidance_scale=guidance))
        gen, bs = [], 64
        for i in range(0, len(labels), bs):
            yb = jnp.asarray(labels[i:i + bs])
            seeds = jnp.arange(i, i + len(yb))
            gen.append(np.asarray(jax.device_get(
                sample_jit(best["params"], yb, seeds)), np.float32))
        gen = np.concatenate(gen)[:, 36:-36, :]  # crop pad -> 3000, like eval
        tag = f"g{guidance:g}"
        np.save(out / f"generated_windows_{tag}.npy", gen)

        pred = dec.predict(gen)
        cm = confusion_matrix(labels, pred, 5)
        np.save(out / f"conditional_confusion_{tag}.npy", cm)

        # per-class PSD-correlation: generated class i vs real class j —
        # diagonal dominance = class-specific spectra, not decoder-fooling
        psd_corr = np.zeros((5, 5))
        for i in range(5):
            pg, _ = welch_psd(jnp.asarray(gen[labels == i][..., 0]), fmax=18.0)
            lg = np.log10(np.asarray(pg).mean(0) + 1e-30)
            for j in range(5):
                psd_corr[i, j] = float(np.corrcoef(lg, real_psd[j])[0, 1])
        return gen, {
            "conditional_fidelity_bal_acc": balanced_accuracy(labels, pred, 5),
            "per_class_recall": [float(cm[i, i] / max(cm[i].sum(), 1))
                                 for i in range(5)],
            "psd_corr_diag_mean": float(np.mean(np.diag(psd_corr))),
            "psd_corr_offdiag_mean": float(
                (psd_corr.sum() - np.trace(psd_corr)) / 20.0),
            "psd_corr_matrix": psd_corr.round(4).tolist(),
        }

    # guidance sweep: plain conditional always; CFG scale only when the
    # model trained its null branch (cond_dropout > 0)
    scales = [1.0]
    if args.cond_dropout > 0 and args.guidance_scale != 1.0:
        scales.append(args.guidance_scale)
    results, gens = {}, {}
    for s in scales:
        gens[s], results[f"guidance_{s:g}"] = evaluate(s)

    # augmentation study — the reference paper's central use case: does
    # stage-labeled synthetic data help a decoder when real data is
    # scarce? Low-data regime: decoders see only the first few real
    # recordings, with and without the generated epochs mixed in.
    n_low = max(2, int(n_tr * 0.1))
    low_m = rids < n_low
    gen_aug = gens[scales[-1]]  # guided variant when available
    x_aug = np.concatenate([x[low_m], gen_aug])
    y_aug = np.concatenate([y[low_m], labels])
    print(f"[{time.time()-t0:.0f}s] augmentation study: {low_m.sum()} real "
          f"epochs ({n_low} recordings) vs + {len(gen_aug)} synthetic...",
          flush=True)
    dec_low = train_decoder(
        SleepStagerChambon2018(n_chans=1, sfreq=100, dropout=0.5),
        (x[low_m], y[low_m]), (x[va_m], y[va_m]),
        n_epochs=args.decoder_epochs, batch_size=64)
    dec_aug = train_decoder(
        SleepStagerChambon2018(n_chans=1, sfreq=100, dropout=0.5),
        (x_aug, y_aug), (x[va_m], y[va_m]),
        n_epochs=args.decoder_epochs, batch_size=64)
    augmentation = {
        "n_real_low": int(low_m.sum()),
        "n_synthetic": int(len(gen_aug)),
        "guidance_used": scales[-1],
        "real_only_bal_acc": dec_low.best_valid_bal_acc,
        "real_plus_synth_bal_acc": dec_aug.best_valid_bal_acc,
    }
    print(f"[{time.time()-t0:.0f}s] augmentation: real-only "
          f"{dec_low.best_valid_bal_acc:.4f} vs +synth "
          f"{dec_aug.best_valid_bal_acc:.4f}", flush=True)

    report = {
        "cond_dm_best_val_loss": res.best_loss,
        "decoder_real_valid_bal_acc": dec.best_valid_bal_acc,
        **results,
        "augmentation_study": augmentation,
        "n_per_class": args.n_per_class,
        "epochs": args.epochs,
        "cond_dropout": args.cond_dropout,
        "wall_clock_sec": round(time.time() - t0, 1),
    }
    (out / "report.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
