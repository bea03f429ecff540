"""End-to-end demo on the real TPU: train the flagship AEKL + LDM on
synthetic EEG, sample with batched DDIM, and report quality metrics
(MS-SSIM reconstruction, FID synthetic-vs-test with its test-vs-test
floor, PSD overlap).

This is the whole reference workflow (train_autoencoderkl -> train_ldm ->
sample_trials -> compute_mmds/compute_fid) compressed into one script on
hermetic data — the round-N health check that the framework actually
learns, not just runs.

Usage: python scripts/demo_synthetic_e2e.py --out /tmp/sleepgen_demo
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="/tmp/sleepgen_demo")
    p.add_argument("--aekl_epochs", type=int, default=400)
    p.add_argument("--ldm_epochs", type=int, default=800)
    p.add_argument("--n_recordings", type=int, default=48)
    p.add_argument("--batch_size", type=int, default=256,
                   help="AEKL train batch (reference ships 2048, "
                        "config_aekl_eeg.yaml:3; one window per recording "
                        "per epoch, so n_recordings must cover it)")
    p.add_argument("--ldm_batch_size", type=int, default=None,
                   help="LDM train batch (reference ships 1024, "
                        "config_ldm.yaml:4; defaults to --batch_size)")
    p.add_argument("--duration_s", type=float, default=300.0,
                   help="per-recording length; large-batch runs shrink it "
                        "to keep the host fixture small")
    p.add_argument("--n_samples", type=int, default=128)
    p.add_argument("--small", action="store_true",
                   help="tiny widths for a quick smoke run")
    p.add_argument("--latent_channels", type=int, default=1,
                   help="stage-1 latent channels (reference sweeps 1 and 3)")
    p.add_argument("--quant", action="store_true",
                   help="also sample with the int8 UNet and report its "
                        "quality metrics next to bf16 (the FID quality gate)")
    p.add_argument("--usleep_checkpoint", type=str, default=None,
                   help="run dir with a trained USleep (demo_decode.py); "
                        "reports FID in the trained feature space alongside "
                        "the seeded random-init one")
    p.add_argument("--fast_train_math", action="store_true",
                   help="train the LDM with the bf16 fast-math UNet "
                        "(config.fast_train_math) — the round-3 val-loss "
                        "parity gate for that default")
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddim", "dpm++2m", "both"],
                   help="sampler for the metric samples; 'both' runs the "
                        "DDIM parity sampler AND DPM++2M-20 from the same "
                        "checkpoints and reports both metric sets")
    p.add_argument("--sample_steps", type=int, default=200)
    p.add_argument("--sample_batch", type=int, default=64,
                   help="seed batch (64 = v5e optimum, BASELINE.md r3)")
    p.add_argument("--spe", action="store_true",
                   help="train the AEKL with the Jukebox spectral loss "
                        "(the reference's --spe spectral axis)")
    p.add_argument("--spectral_weight", type=float, default=None,
                   help="override cfg.losses.spectral_weight (reference "
                        "ships 1e4, which SPECTRAL_AUDIT_r4.json measures "
                        "as a ~1e9:1 spectral:L1 gradient ratio; ~1e-5 "
                        "balances the warm gradients at batch 256)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help=">0: train the LDM with an EMA of the UNet params "
                        "and sample from it (beyond-parity knob; the "
                        "checkpointed best/final params become the EMA)")
    args = p.parse_args()

    from sleepgen.config import Config
    from sleepgen.data import WindowDataset, make_synthetic_dataset
    from sleepgen.data.transforms import center_crop_valid
    from sleepgen.eval import ms_ssim_1d
    from sleepgen.train.train_aekl import init_state, train_aekl
    from sleepgen.train.train_ldm import train_ldm, build_unet
    from sleepgen.sample.sample_ldm import sample_ldm_trials
    from sleepgen.utils import CheckpointManager

    t_start = time.time()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # relay resilience: cache + first-contact marker for the supervisor
    from sleepgen.utils.profiling import tpu_contact

    tpu_contact()

    cfg = Config()
    cfg.train.output_dir = str(out)
    cfg.train.batch_size = args.batch_size
    cfg.train.n_epochs = args.aekl_epochs
    cfg.train.val_interval = max(args.aekl_epochs // 4, 1)
    cfg.aekl.num_channels = [2, 2, 4] if args.small else [32, 32, 64]
    cfg.aekl.latent_channels = args.latent_channels
    cfg.fast_train_math = bool(args.fast_train_math)
    cfg.spectral = bool(args.spe)
    if args.spectral_weight is not None:
        cfg.losses.spectral_weight = args.spectral_weight
    cfg.diffusion.ema_decay = args.ema_decay
    if args.small:
        cfg.unet.model_channels = 32
    cfg.losses.kl_weight = 1e-9

    raws = make_synthetic_dataset(args.n_recordings, duration_s=args.duration_s)
    n_tr = int(args.n_recordings * 0.7)
    n_va = int(args.n_recordings * 0.15)
    train = WindowDataset.from_raw(raws[:n_tr])
    valid = WindowDataset.from_raw(raws[n_tr : n_tr + n_va])
    test = WindowDataset.from_raw(raws[n_tr + n_va :])

    print(f"[{time.time()-t_start:.0f}s] training AEKL "
          f"({cfg.aekl.num_channels}, {args.aekl_epochs} epochs)...", flush=True)
    res1 = train_aekl(cfg, train, valid, run_name="demo_aekl")
    print(f"[{time.time()-t_start:.0f}s] AEKL best val L1: {res1.best_loss:.5f} "
          f"(nan_stop={res1.stopped_on_nan})", flush=True)

    state0, ae, *_ = init_state(cfg, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(res1.run_dir)
    stage1 = ckpt.restore_best(jax.device_get(state0.params_g))
    ckpt.close()

    cfg.train.n_epochs = args.ldm_epochs
    cfg.train.val_interval = max(args.ldm_epochs // 4, 1)
    cfg.train.batch_size = args.ldm_batch_size or args.batch_size
    print(f"[{time.time()-t_start:.0f}s] training LDM ({args.ldm_epochs} epochs)...",
          flush=True)
    res2 = train_ldm(cfg, train, valid, stage1, run_name="demo_ldm")
    print(f"[{time.time()-t_start:.0f}s] LDM best val loss: {res2.best_loss:.5f} "
          f"scale_factor={res2.scale_factor:.4f}", flush=True)

    lc = cfg.aekl.latent_channels
    unet = build_unet(cfg, lc, lc,
                      jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
    z0 = jnp.zeros((2, cfg.unet.image_size, lc), jnp.float32)
    tpl = {"params": jax.device_get(unet.init(
        jax.random.PRNGKey(0), z0, jnp.zeros((2,), jnp.int32))["params"]),
        "scale_factor": np.zeros((), np.float32)}
    ckpt2 = CheckpointManager(res2.run_dir)
    best = ckpt2.restore_best(tpl)
    ckpt2.close()

    cfg.diffusion.sampler = "ddim" if args.sampler == "both" else args.sampler
    cfg.diffusion.num_inference_steps = args.sample_steps
    print(f"[{time.time()-t_start:.0f}s] sampling {args.n_samples} windows "
          f"({cfg.diffusion.sampler}-{args.sample_steps}, "
          f"batch {args.sample_batch})...", flush=True)
    sigs = sample_ldm_trials(
        cfg, best["params"], stage1, float(best["scale_factor"]),
        out / "samples", 0, args.n_samples,
        batch_size=min(args.n_samples, args.sample_batch),
        compute_psd=False)

    # ---- metrics
    rng = np.random.default_rng(0)
    test_w = test.epoch_windows(rng)
    test_crop = center_crop_valid(test_w)

    # AE reconstruction MS-SSIM
    from sleepgen.nn import AutoencoderKL as AE

    recon = np.asarray(jax.device_get(ae.apply(
        {"params": stage1}, jnp.asarray(test_w), method=AE.reconstruct)))
    ms_recon = float(np.mean(np.asarray(ms_ssim_1d(
        jnp.asarray(test_crop), jnp.asarray(center_crop_valid(recon))))))

    # synthetic pair diversity + sample-vs-test
    k = min(len(sigs), len(test_crop))
    ms_pairs_synth = float(np.mean(np.asarray(ms_ssim_1d(
        jnp.asarray(sigs[:-1]), jnp.asarray(sigs[1:])))))
    ms_pairs_test = float(np.mean(np.asarray(ms_ssim_1d(
        jnp.asarray(test_crop[:-1]), jnp.asarray(test_crop[1:])))))

    # FID over USleep features (seeded random init; reference
    # compute_fid.py:354-389 uses a pretrained params.pt the repo doesn't
    # ship — a sleepgen-trained space is supplied via --usleep_checkpoint)
    from sleepgen.cli.compute_fid import load_usleep
    from sleepgen.eval import compute_fid, frechet_distance, usleep_fid_features

    m, variables = load_usleep(None, seed=0)
    fid = compute_fid(m, variables, test_crop, sigs[:k])
    feats = usleep_fid_features(m, variables, test_crop)
    half = len(feats) // 2
    # the floor needs >= 2 windows per half for a covariance
    fid_floor = (frechet_distance(feats[:half], feats[half : 2 * half])
                 if half >= 2 else None)

    fid_trained = fid_trained_floor = None
    if args.usleep_checkpoint:
        mt, vt = load_usleep(args.usleep_checkpoint, seed=0)
        fid_trained = compute_fid(mt, vt, test_crop, sigs[:k])
        ft = usleep_fid_features(mt, vt, test_crop)
        if half >= 2:
            fid_trained_floor = frechet_distance(ft[:half], ft[half : 2 * half])

    quant_metrics = None
    if args.quant:
        print(f"[{time.time()-t_start:.0f}s] sampling int8 (quantized UNet)...",
              flush=True)
        t_q = time.time()
        sigs_q = sample_ldm_trials(
            cfg, best["params"], stage1, float(best["scale_factor"]),
            out / "samples_int8", 0, args.n_samples,
            batch_size=min(args.n_samples, 128), compute_psd=False,
            quantized=True)
        q_sec = time.time() - t_q
        from sleepgen.eval.psd import welch_psd as _wp

        fid_q = compute_fid(m, variables, test_crop, sigs_q[:k])
        pairs_q = float(np.mean(np.asarray(ms_ssim_1d(
            jnp.asarray(sigs_q[:-1]), jnp.asarray(sigs_q[1:])))))
        psd_q, _ = _wp(jnp.asarray(sigs_q[..., 0]), fmax=18.0)
        quant_metrics = {
            "fid_synth_vs_test": fid_q,
            "ms_ssim_synth_pairs": pairs_q,
            "psd_log_correlation": float(np.corrcoef(
                np.log10(np.asarray(psd_q).mean(0) + 1e-30),
                np.log10(np.asarray(_wp(jnp.asarray(test_crop[..., 0]),
                                        fmax=18.0)[0]).mean(0) + 1e-30))[0, 1]),
            "sample_sec_incl_compile": round(q_sec, 1),
        }
        if args.usleep_checkpoint:
            quant_metrics["fid_trained_features"] = compute_fid(
                mt, vt, test_crop, sigs_q[:k])

    # PSD band-energy overlap
    from sleepgen.eval.psd import welch_psd

    psd_t, _ = welch_psd(jnp.asarray(test_crop[..., 0]), fmax=18.0)
    psd_s, _ = welch_psd(jnp.asarray(sigs[..., 0]), fmax=18.0)
    pt = np.asarray(psd_t).mean(0)
    ps = np.asarray(psd_s).mean(0)
    psd_corr = float(np.corrcoef(np.log10(pt + 1e-30), np.log10(ps + 1e-30))[0, 1])

    dpm_metrics = None
    if args.sampler == "both":
        # same checkpoints through DPM++2M-20 — the 10x-fewer-steps
        # quality gate next to the DDIM-200 parity numbers
        cfg.diffusion.sampler = "dpm++2m"
        cfg.diffusion.num_inference_steps = 20
        print(f"[{time.time()-t_start:.0f}s] sampling {args.n_samples} "
              f"windows (dpm++2m-20, batch {args.sample_batch})...",
              flush=True)
        t_d = time.time()
        sigs_d = sample_ldm_trials(
            cfg, best["params"], stage1, float(best["scale_factor"]),
            out / "samples_dpm", 0, args.n_samples,
            batch_size=min(args.n_samples, args.sample_batch),
            compute_psd=False)
        d_sec = time.time() - t_d
        psd_d, _ = welch_psd(jnp.asarray(sigs_d[..., 0]), fmax=18.0)
        dpm_metrics = {
            "fid_synth_vs_test": compute_fid(m, variables, test_crop,
                                             sigs_d[:k]),
            "ms_ssim_synth_pairs": float(np.mean(np.asarray(ms_ssim_1d(
                jnp.asarray(sigs_d[:-1]), jnp.asarray(sigs_d[1:]))))),
            "psd_log_correlation": float(np.corrcoef(
                np.log10(pt + 1e-30),
                np.log10(np.asarray(psd_d).mean(0) + 1e-30))[0, 1]),
            "sample_sec_incl_compile": round(d_sec, 1),
        }
        if args.usleep_checkpoint:
            dpm_metrics["fid_trained_features"] = compute_fid(
                mt, vt, test_crop, sigs_d[:k])

    report = {
        "aekl_best_val_l1": res1.best_loss,
        "ldm_best_val_loss": res2.best_loss,
        "scale_factor": res2.scale_factor,
        "ms_ssim_reconstruction": ms_recon,
        "ms_ssim_synth_pairs": ms_pairs_synth,
        "ms_ssim_test_pairs_floor": ms_pairs_test,
        "fid_synth_vs_test": fid,
        "fid_test_vs_test_floor": fid_floor,
        "psd_log_correlation": psd_corr,
        "fast_train_math": bool(args.fast_train_math),
        "spectral": bool(args.spe),
        "spectral_weight": (args.spectral_weight if args.spectral_weight
                            is not None else (1e4 if args.spe else None)),
        "aekl_batch": args.batch_size,
        "ldm_batch": args.ldm_batch_size or args.batch_size,
        "n_recordings": args.n_recordings,
        "ema_decay": args.ema_decay,
        "sampler": ("ddim" if args.sampler == "both" else args.sampler)
                   + f"-{args.sample_steps}",
        "wall_clock_sec": round(time.time() - t_start, 1),
    }
    if fid_trained is not None:
        report["fid_trained_features"] = fid_trained
        report["fid_trained_features_floor"] = fid_trained_floor
    if quant_metrics is not None:
        report["int8"] = quant_metrics
    if dpm_metrics is not None:
        report["dpm_pp_2m_20"] = dpm_metrics
    (out / "report.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
