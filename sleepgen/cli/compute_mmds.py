"""CLI: MS-SSIM evaluation (reference ``src/compute_mmds.py`` — AE
reconstruction quality; ``compute_mmds_train_test.py`` — test-pair
diversity floor). Writes the same TSV contract."""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--best_model_path", type=str, required=True, help="AEKL run dir")
    p.add_argument("--path_test_ids", type=str, required=True)
    p.add_argument("--path_pre_processed", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--dataset", type=str, default="edfx")
    p.add_argument("--spe", type=str, default="no-spectral")
    p.add_argument("--latent_channels", type=int, default=None)
    p.add_argument("--mode", type=str, default="reconstruction",
                   choices=["reconstruction", "test_pairs"])
    p.add_argument("--batch_size", type=int, default=64)
    return p


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from sleepgen.config import Config
    from sleepgen.data import load_split
    from sleepgen.data.transforms import center_crop_valid
    from sleepgen.eval import ms_ssim_1d
    from sleepgen.nn import AutoencoderKL
    from sleepgen.train.train_aekl import init_state
    from sleepgen.utils import CheckpointManager

    args = build_parser().parse_args(argv)
    cfg = Config.from_yaml(Path(args.best_model_path) / "config.yaml")
    if args.latent_channels is not None:
        cfg.aekl.latent_channels = args.latent_channels

    ds = load_split(args.path_test_ids, args.path_pre_processed, args.dataset)
    rng = np.random.default_rng(cfg.train.seed)
    windows = ds.epoch_windows(rng)  # (N, 3072, 1)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    lc = cfg.aekl.latent_channels

    if args.mode == "reconstruction":
        state0, ae, *_ = init_state(cfg, jax.random.PRNGKey(0),
                                    window=ds.padded_window)
        ckpt = CheckpointManager(args.best_model_path)
        params = ckpt.restore_best(jax.device_get(state0.params_g))
        ckpt.close()

        @jax.jit
        def recon_fn(x):
            return ae.apply({"params": params}, x, method=AutoencoderKL.reconstruct)

        scores = []
        for i in range(0, len(windows), args.batch_size):
            x = jnp.asarray(windows[i : i + args.batch_size])
            r = recon_fn(x)
            s = ms_ssim_1d(jnp.asarray(center_crop_valid(np.asarray(x))),
                           jnp.asarray(center_crop_valid(np.asarray(r))),
                           kernel_size=7)
            scores.append(np.asarray(s))
        scores = np.concatenate(scores)
        df = pd.DataFrame({"filename": ds.names, "ms_ssim": scores})
        out = out_dir / f"ms_ssim_reconstruction_{args.dataset}_{args.spe}_{lc}.tsv"
    else:
        # diversity floor: MS-SSIM between different test recordings
        x = center_crop_valid(windows)
        a = jnp.asarray(x[:-1])
        b = jnp.asarray(x[1:])
        scores = np.asarray(ms_ssim_1d(a, b, kernel_size=7))
        df = pd.DataFrame({"pair": np.arange(len(scores)), "ms_ssim": scores})
        out = out_dir / f"ms_ssim_test_pairs_{args.dataset}.tsv"

    df.to_csv(out, index=False, sep="\t")
    print(f"Mean MS-SSIM: {scores.mean():.6f} -> {out}")
    return float(scores.mean())


if __name__ == "__main__":
    main()
