"""CLI: AE-only sample generation — reconstruct training windows through
the stage-1 AutoencoderKL and save them as artifacts.

Parity target: reference ``src/testing/sample_trials_autoencoder.py:63-118``
(load AEKL best_model, iterate the train loader, ``recon, _, _ = stage1(x)``,
save ``samples/{channels}/synthetic_trial_eeg_{i}.npy`` per batch plus an
original-vs-reconstruction figure). TPU redesign: one jitted reconstruct
over device-sized batches instead of the per-batch eager loop.
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--stage1_path", type=str, required=True,
                   help="AEKL run dir (config.yaml + best_model)")
    p.add_argument("--path_train_ids", type=str, required=True)
    p.add_argument("--path_pre_processed", type=str, required=True)
    p.add_argument("--dataset", type=str, default=None,
                   help="defaults to the run config's dataset")
    p.add_argument("--num_channels", type=str, default=None,
                   help="override AE channels, e.g. '[32,32,64]'")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--no_figures", action="store_true")
    return p


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    import ast
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sleepgen.config import Config
    from sleepgen.data import load_split
    from sleepgen.nn import AutoencoderKL
    from sleepgen.train.train_aekl import init_state
    from sleepgen.utils import CheckpointManager

    args = build_parser().parse_args(argv)
    cfg = Config.from_yaml(Path(args.stage1_path) / "config.yaml")
    if args.num_channels is not None:
        cfg.aekl.num_channels = list(ast.literal_eval(args.num_channels))
    dataset = args.dataset or cfg.dataset

    ds = load_split(args.path_train_ids, args.path_pre_processed, dataset)
    np_rng = np.random.default_rng(cfg.train.seed)
    windows = ds.epoch_windows(np_rng)  # (N, 3072, 1)

    state0, ae, *_ = init_state(cfg, jax.random.PRNGKey(0),
                                window=ds.padded_window)
    ckpt = CheckpointManager(args.stage1_path)
    params = ckpt.restore_best(jax.device_get(state0.params_g))
    ckpt.close()

    @jax.jit
    def recon_fn(x):
        return ae.apply({"params": params}, x, method=AutoencoderKL.reconstruct)

    # reference artifact layout: samples/{channels-joined}/synthetic_trial_eeg_{i}.npy
    channels_tag = "-".join(str(c) for c in cfg.aekl.num_channels)
    out = Path(args.output_dir) / "samples" / channels_tag
    out.mkdir(parents=True, exist_ok=True)

    n_batches = 0
    for i, start in enumerate(range(0, len(windows), args.batch_size)):
        x = jnp.asarray(windows[start : start + args.batch_size])
        r = np.asarray(jax.device_get(recon_fn(x)))
        # (B, L, 1) -> reference (B, 1, L) layout
        np.save(out / f"synthetic_trial_eeg_{i}.npy", r.transpose(0, 2, 1))
        if i == 0 and not args.no_figures:
            from sleepgen.eval.reports import save_reconstruction_figure

            save_reconstruction_figure(out, 0,
                                       np.asarray(x).transpose(0, 2, 1),
                                       r.transpose(0, 2, 1))
        n_batches = i + 1
    print(f"wrote {n_batches} reconstruction batches to {out}")


if __name__ == "__main__":
    main()
