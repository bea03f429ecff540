"""Imputation quality gate on TPU (beyond parity).

Default (DM mode): loads the stage-conditional DM trained by
scripts/demo_conditional.py, masks a contiguous span of REAL held-out
staged epochs, repairs it with RePaint masked sampling
(samplers.ddpm_inpaint_loop). With ``--aekl_run`` (LDM mode):
``--dm_run`` names a flagship train_ldm run dir instead and the repair
runs in LATENT space through the frozen AEKL (samplers.impute_ldm) on
held-out synthetic-EEG windows — the same checkpoints sample_trials
uses double as artifact-repair models. Either way the repair is scored
against cheap baselines (linear interpolation, std-matched noise fill):

  * masked-region log-PSD correlation vs the original span (spectral
    fidelity — the right metric for a generative repair; exact-MSE is
    reported but a faithful generative fill will NOT minimize it)
  * boundary continuity: |first difference| at the two mask edges vs the
    signal's typical step size
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
    p.add_argument("--dm_run", type=str,
                   default="/tmp/sleepgen_demo_cond/cond_dm",
                   help="DM run dir; with --aekl_run, an LDM run dir")
    p.add_argument("--aekl_run", type=str, default=None,
                   help="AEKL run dir: switches to latent-space (LDM) "
                        "imputation on synthetic-EEG windows")
    p.add_argument("--out", type=str, default="/tmp/sleepgen_demo_impute")
    p.add_argument("--n_windows", type=int, default=64)
    p.add_argument("--mask_start", type=int, default=1000)
    p.add_argument("--mask_len", type=int, default=1000)
    p.add_argument("--num_resample", type=int, default=1)
    p.add_argument("--batch", type=int, default=32,
                   help="windows per device dispatch. The repair chain is "
                        "ONE dispatch per batch (T*num_resample UNet evals); "
                        "at resample=4 a batch-32 dispatch runs 400+ s, "
                        "which crashed the TPU worker in round 4 — use 8-16")
    p.add_argument("--latent_erode", type=int, default=4)
    p.add_argument("--n_recordings", type=int, default=40,
                   help="must match the demo_conditional fixture")
    p.add_argument("--n_epochs_per_rec", type=int, default=60)
    args = p.parse_args()
    latent_mode = args.aekl_run is not None

    import jax
    import jax.numpy as jnp

    from sleepgen.config import Config
    from sleepgen.data.staging import make_synthetic_staged
    from sleepgen.data.transforms import BORDER_PAD
    from sleepgen.eval.psd import welch_psd
    from sleepgen.sample.samplers import impute_dm, impute_ldm
    from sleepgen.train.train_ldm import make_schedule
    from sleepgen.utils.profiling import enable_compilation_cache, tpu_contact

    enable_compilation_cache()
    tpu_contact()
    t0 = time.time()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    cfg = Config.from_yaml(Path(args.dm_run) / "config.yaml")
    conditional = cfg.unet.num_classes > 0

    if latent_mode:
        # flagship-distribution fixture: held-out synthetic-EEG windows
        # (the LDM demo runs train on make_synthetic_dataset recordings)
        from sleepgen.data import WindowDataset, make_synthetic_dataset

        assert not conditional, "LDM demo mode expects an unconditional run"
        raws = make_synthetic_dataset(args.n_recordings, duration_s=300.0)
        held_out = raws[int(args.n_recordings * 0.8):]
        ds = WindowDataset.from_raw(held_out)
        wins = ds.epoch_windows(np.random.default_rng(0))  # (N, 3072, 1)
        while len(wins) < args.n_windows:
            wins = np.concatenate(
                [wins, ds.epoch_windows(np.random.default_rng(len(wins)))])
        x_pad = wins[: args.n_windows].astype(np.float32)
        xv = x_pad[:, BORDER_PAD:-BORDER_PAD]
        yv = np.zeros((len(xv),), np.int64)  # unused
    else:
        # same hermetic fixture as demo_conditional; impute on the VALID split
        x, y, rids = make_synthetic_staged(args.n_recordings,
                                           args.n_epochs_per_rec)
        va = rids >= int(args.n_recordings * 0.8)
        xv, yv = x[va][: args.n_windows], y[va][: args.n_windows]
        x_pad = np.pad(xv.astype(np.float32),
                       ((0, 0), (BORDER_PAD, BORDER_PAD), (0, 0)),
                       mode="edge")
    n, length = xv.shape[0], xv.shape[1]
    start, stop = args.mask_start, min(args.mask_start + args.mask_len, length)
    # validate BEFORE the expensive chain runs: an out-of-range start would
    # mask nothing, burn the full T-step repair, then IndexError in metrics
    assert 0 <= start < length and args.mask_len > 0, (start, args.mask_len,
                                                       length)
    print(f"[{time.time()-t0:.0f}s] {n} held-out windows "
          f"({'ldm' if latent_mode else 'dm'} mode), masking "
          f"[{start}:{stop}) of {length}", flush=True)

    if latent_mode:
        from sleepgen.train.train_aekl import restore_aekl_run
        from sleepgen.train.train_ldm import restore_unet_run

        aekl_cfg, ae, ae_params = restore_aekl_run(args.aekl_run)
        window = (cfg.unet.image_size
                  * 2 ** (len(aekl_cfg.aekl.num_channels) - 1))
        lc = aekl_cfg.aekl.latent_channels
        unet, best = restore_unet_run(cfg, args.dm_run, lc, lc,
                                      with_scale_factor=True)
        scale_factor = float(best["scale_factor"])
    else:
        from sleepgen.train.train_ldm import restore_unet_run

        window = cfg.unet.image_size
        unet, best = restore_unet_run(cfg, args.dm_run, 1, 1,
                                      sample_shape=(window, 1),
                                      name="final_model")
    sched = make_schedule(cfg)

    assert x_pad.shape[1] == window, (x_pad.shape, window)
    mask = np.ones((1, window, 1), np.float32)
    mask[:, BORDER_PAD + start : BORDER_PAD + stop, :] = 0.0

    @jax.jit
    def repair(params, xb, yb, key):
        if latent_mode:
            return impute_ldm(unet, ae, params, ae_params,
                              jnp.float32(scale_factor), sched, xb,
                              jnp.asarray(mask), key,
                              num_resample=args.num_resample,
                              latent_erode=args.latent_erode)
        return impute_dm(unet, params, sched, xb, jnp.asarray(mask), key,
                         labels=yb if conditional else None,
                         num_resample=args.num_resample)

    bs = args.batch
    outs = []
    print(f"[{time.time()-t0:.0f}s] imputing (full {cfg.diffusion.timesteps}"
          f"-step chain, resample={args.num_resample})...", flush=True)
    for i in range(0, n, bs):
        # per-dispatch persistence: this workload crashed the TPU worker in
        # round 4, so a supervisor restart must not redo completed ~100 s
        # dispatches (key includes the knobs that change the output)
        part = out / (f"imputed_part_{i}_{bs}_{args.num_resample}"
                      f"_{args.mask_start}_{args.mask_len}.npy")
        if part.exists():
            outs.append(np.load(part))
            print(f"[{time.time()-t0:.0f}s]   batch {i}: restored "
                  f"{part.name}", flush=True)
            continue
        xb, yb = x_pad[i : i + bs], yv[i : i + bs]
        real = len(xb)
        if real < bs:
            xb = np.concatenate([xb, np.repeat(xb[-1:], bs - real, 0)])
            yb = np.concatenate([yb, np.repeat(yb[-1:], bs - real, 0)])
        fixed = repair(best["params"], jnp.asarray(xb),
                       jnp.asarray(yb, jnp.int32),
                       jax.random.fold_in(jax.random.PRNGKey(0), i))
        got = np.asarray(jax.device_get(fixed), np.float32)[:real]
        np.save(part, got)
        outs.append(got)
        print(f"[{time.time()-t0:.0f}s]   batch {i}: done", flush=True)
    imputed = np.concatenate(outs)[:, BORDER_PAD:-BORDER_PAD, 0]
    orig = xv[..., 0]
    np.save(out / "imputed.npy", imputed)

    # baselines on the masked span. Anchors must be OBSERVED samples:
    # left = start-1 (if the span doesn't touch the left edge), right =
    # stop, the first unmasked sample (if it doesn't touch the right
    # edge) — anchoring on min(stop, length-1) would read masked data
    # when the span runs to the end. Edge-touching spans degenerate to a
    # one-anchor constant fill; a fully-masked window falls back to the
    # normalized midpoint 0.5.
    lin = orig.copy()
    span = stop - start
    left = orig[:, start - 1][:, None] if start > 0 else None
    right = orig[:, stop][:, None] if stop < length else None
    if left is None and right is None:
        lin[:, start:stop] = 0.5
    elif left is None:
        lin[:, start:stop] = right
    elif right is None:
        lin[:, start:stop] = left
    else:
        ramp = np.linspace(0, 1, span, dtype=np.float32)[None, :]
        lin[:, start:stop] = left * (1 - ramp) + right * ramp
    noise = orig.copy()
    rng = np.random.default_rng(0)
    noise[:, start:stop] = rng.standard_normal((n, span)).astype(np.float32) \
        * orig.std(axis=1, keepdims=True)

    def span_psd_corr(a, b):
        """Mean per-window log-PSD correlation over the masked span."""
        pa, _ = welch_psd(jnp.asarray(a[:, start:stop]), fmax=18.0)
        pb, _ = welch_psd(jnp.asarray(b[:, start:stop]), fmax=18.0)
        la = np.log10(np.asarray(pa) + 1e-30)
        lb = np.log10(np.asarray(pb) + 1e-30)
        cs = [float(np.corrcoef(la[i], lb[i])[0, 1]) for i in range(len(la))]
        return float(np.mean(cs))

    def boundary_jump(a):
        """|first difference| across the mask edges that exist (a span
        touching the window edge has only one), normalized by the signal's
        median |step|: ~1 = seamless, >>1 = visible seam."""
        step = np.median(np.abs(np.diff(orig, axis=1)))
        jumps = []
        if start > 0:
            jumps.append(np.abs(a[:, start] - a[:, start - 1]))
        if stop < length:
            jumps.append(np.abs(a[:, stop] - a[:, stop - 1]))
        if not jumps:
            return float("nan")
        return float(np.mean(np.stack(jumps)) / step)

    report = {
        "mode": "ldm_latent" if latent_mode else "dm_signal",
        "dm_run": str(args.dm_run),
        "aekl_run": args.aekl_run,
        "conditional": conditional,
        "n_windows": n,
        "mask": [start, stop],
        "num_resample": args.num_resample,
        "latent_erode": args.latent_erode if latent_mode else None,
        "psd_corr_masked_span": {
            "diffusion": span_psd_corr(imputed, orig),
            "linear_interp": span_psd_corr(lin, orig),
            "noise_fill": span_psd_corr(noise, orig),
        },
        "boundary_jump_ratio": {
            "diffusion": boundary_jump(imputed),
            "linear_interp": boundary_jump(lin),
            "noise_fill": boundary_jump(noise),
            "original": boundary_jump(orig),
        },
        "mse_masked_span": {
            "diffusion": float(np.mean((imputed[:, start:stop]
                                        - orig[:, start:stop]) ** 2)),
            "linear_interp": float(np.mean((lin[:, start:stop]
                                            - orig[:, start:stop]) ** 2)),
            "noise_fill": float(np.mean((noise[:, start:stop]
                                         - orig[:, start:stop]) ** 2)),
        },
        "wall_clock_sec": round(time.time() - t0, 1),
    }
    (out / "report.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
