"""Signal-space DM health check on TPU: train_dm at full 3072 length,
then DDIM sampling via the DM path, plus PSD/MS-SSIM checks.
(The pure-DM side of the reference: train_pure_ldm.py + sample_trials_ddpm.py.)
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
    p.add_argument("--out", type=str, default="/tmp/sleepgen_demo_dm")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--n_samples", type=int, default=64)
    p.add_argument("--strict_train_math", action="store_true",
                   help="disable config.fast_train_math for the DM step "
                        "(A/B against the round-3 default)")
    args = p.parse_args()

    from sleepgen.config import Config
    from sleepgen.data import WindowDataset, make_synthetic_dataset
    from sleepgen.data.transforms import BORDER_PAD
    from sleepgen.eval import ms_ssim_1d
    from sleepgen.eval.psd import welch_psd
    from sleepgen.sample.samplers import ddim_sample_loop, seed_noise
    from sleepgen.sample.sample_ldm import sampling_schedule
    from sleepgen.train.train_dm import train_dm
    from sleepgen.train.train_ldm import build_unet
    from sleepgen.utils import CheckpointManager

    t0 = time.time()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    from sleepgen.utils.profiling import tpu_contact

    tpu_contact()

    cfg = Config()
    if args.strict_train_math:
        cfg.fast_train_math = False
    cfg.train.output_dir = str(out)
    cfg.train.batch_size = 128
    cfg.train.n_epochs = args.epochs
    cfg.train.val_interval = max(args.epochs // 2, 1)
    cfg.unet.image_size = 3072

    raws = make_synthetic_dataset(40, duration_s=300.0)
    train = WindowDataset.from_raw(raws[:32])
    valid = WindowDataset.from_raw(raws[32:])

    print(f"[{time.time()-t0:.0f}s] training DM ({args.epochs} epochs)...",
          flush=True)
    res = train_dm(cfg, train, valid, run_name="demo_dm")
    print(f"[{time.time()-t0:.0f}s] DM best val loss: {res.best_loss:.5f}",
          flush=True)

    dtype = jnp.bfloat16
    unet = build_unet(cfg, 1, 1, dtype)
    x0 = jnp.zeros((2, 3072, 1), jnp.float32)
    tpl = {"params": jax.device_get(unet.init(
        jax.random.PRNGKey(0), x0, jnp.zeros((2,), jnp.int32))["params"])}
    ckpt = CheckpointManager(res.run_dir)
    best = ckpt.restore_best(tpl, name="final_model")
    ckpt.close()

    sched = sampling_schedule(cfg)

    @jax.jit
    def sample(params, key, seeds):
        x_T = seed_noise(key, seeds, (3072, 1))

        def fn(x, t):
            return unet.apply({"params": params}, x, t)

        x = ddim_sample_loop(fn, sched, x_T, 200)
        return x[:, BORDER_PAD:-BORDER_PAD, :]

    print(f"[{time.time()-t0:.0f}s] sampling {args.n_samples} (DDIM-200, 3072)...",
          flush=True)
    sigs = np.asarray(jax.device_get(sample(
        best["params"], jax.random.PRNGKey(0), jnp.arange(args.n_samples))))

    test_w = valid.epoch_windows(np.random.default_rng(0))[:, 36:-36, :]
    psd_t, _ = welch_psd(jnp.asarray(test_w[..., 0]), fmax=18.0)
    psd_s, _ = welch_psd(jnp.asarray(sigs[..., 0]), fmax=18.0)
    corr = float(np.corrcoef(
        np.log10(np.asarray(psd_t).mean(0) + 1e-30),
        np.log10(np.asarray(psd_s).mean(0) + 1e-30))[0, 1])
    pair = float(np.mean(np.asarray(ms_ssim_1d(
        jnp.asarray(sigs[:-1]), jnp.asarray(sigs[1:])))))

    report = {"dm_best_val_loss": res.best_loss, "psd_log_correlation": corr,
              "ms_ssim_synth_pairs": pair,
              "fast_train_math": bool(cfg.fast_train_math),
              "wall_clock_sec": round(time.time() - t0, 1)}
    (out / "report.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
