"""CLI: per-frequency-band evaluation suite.

Parity target: the reference's 26-script testing suite collapsed into one
driver with modes (``src/testing/MSSIM_test.py:118-168``,
``MSSIM_test_shhs.py``, ``MSSIM_dm_sample.py``, ``MSSIM_sample.py``,
``MSSIM_reconstruction.py``, ``FID_test.py:84-230``,
``FID_train_test.py``): MS-SSIM and FID per EEG band (delta 0.5-4 Hz,
theta 4.1-8, alpha 8.1-12, plus broadband) over
  * test-pair baselines (diversity floor)
  * synthetic sample pairs
  * synthetic vs test
  * AE reconstructions vs originals
Band-pass runs on device (sleepgen.eval.bands); results go to a JSON +
TSV table instead of per-script pickles.
"""
from __future__ import annotations

import argparse
import json
from glob import glob
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", type=str, required=True,
                   choices=["test_pairs", "sample_pairs", "sample_vs_test",
                            "reconstruction"])
    p.add_argument("--metric", type=str, default="ms_ssim",
                   choices=["ms_ssim", "fid", "both"])
    p.add_argument("--path_test_ids", type=str, default=None)
    p.add_argument("--path_pre_processed", type=str, default=None)
    p.add_argument("--sample_dir", type=str, default=None)
    p.add_argument("--best_model_path", type=str, default=None,
                   help="AEKL run dir (reconstruction mode)")
    p.add_argument("--usleep_checkpoint", type=str, default=None)
    p.add_argument("--dataset", type=str, default="edfx")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--kernel_size", type=int, default=7)
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--max_windows", type=int, default=512)
    return p


def _load_test_windows(args):
    from sleepgen.data import load_split
    from sleepgen.data.transforms import center_crop_valid

    ds = load_split(args.path_test_ids, args.path_pre_processed, args.dataset)
    w = center_crop_valid(ds.epoch_windows(np.random.default_rng(args.seed)))
    return w[: args.max_windows]


def _load_samples(args):
    from sleepgen.data.transforms import to_blc

    files = sorted(glob(f"{args.sample_dir}/sample_*.npy"))[: args.max_windows]
    return to_blc(np.concatenate([np.load(f) for f in files], axis=0))


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    import jax.numpy as jnp

    from sleepgen.eval import EEG_BANDS, filter_band, ms_ssim_1d

    args = build_parser().parse_args(argv)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # assemble the (a, b) pair sets per mode
    if args.mode == "test_pairs":
        w = _load_test_windows(args)
        a, b = w[:-1], w[1:]
    elif args.mode == "sample_pairs":
        s = _load_samples(args)
        a, b = s[:-1], s[1:]
    elif args.mode == "sample_vs_test":
        w = _load_test_windows(args)
        s = _load_samples(args)
        k = min(len(w), len(s))
        a, b = s[:k], w[:k]
    else:  # reconstruction
        import jax

        from sleepgen.config import Config
        from sleepgen.data.transforms import center_crop_valid
        from sleepgen.nn import AutoencoderKL
        from sleepgen.train.train_aekl import init_state
        from sleepgen.utils import CheckpointManager

        cfg = Config.from_yaml(Path(args.best_model_path) / "config.yaml")
        from sleepgen.data import load_split

        ds = load_split(args.path_test_ids, args.path_pre_processed, args.dataset)
        wins = ds.epoch_windows(np.random.default_rng(args.seed))[: args.max_windows]
        state0, ae, *_ = init_state(cfg, jax.random.PRNGKey(0),
                                    window=ds.padded_window)
        ckpt = CheckpointManager(args.best_model_path)
        params = ckpt.restore_best(jax.device_get(state0.params_g))
        ckpt.close()
        recon = np.asarray(jax.device_get(ae.apply(
            {"params": params}, jnp.asarray(wins),
            method=AutoencoderKL.reconstruct)))
        a, b = center_crop_valid(wins), center_crop_valid(recon)

    results = {}
    bands = {"all": None, **EEG_BANDS}
    for band, rng_hz in bands.items():
        if rng_hz is None:
            fa, fb = jnp.asarray(a), jnp.asarray(b)
        else:
            fa, fb = filter_band(jnp.asarray(a), rng_hz), filter_band(jnp.asarray(b), rng_hz)
        entry = {}
        if args.metric in ("ms_ssim", "both"):
            # band-passed signals lose the [0,1] range; use per-pair range
            dr = float(max(np.asarray(fa).max() - np.asarray(fa).min(), 1e-6))
            ms = np.asarray(ms_ssim_1d(fa, fb, kernel_size=args.kernel_size,
                                       data_range=dr))
            entry["ms_ssim_mean"] = float(ms.mean())
            entry["ms_ssim_std"] = float(ms.std())
        if args.metric in ("fid", "both"):
            from sleepgen.cli.compute_fid import load_usleep
            from sleepgen.eval import compute_fid

            m, variables = load_usleep(args.usleep_checkpoint, args.seed)
            entry["fid"] = compute_fid(m, variables, np.asarray(fb), np.asarray(fa))
        results[band] = entry
        print(band, entry)

    out = out_dir / f"band_eval_{args.mode}_{args.metric}_{args.dataset}.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
