"""CLI: stage-2 LDM training (reference ``src/train_ldm.py`` flags:
--config_file, --autoencoderkl_config_file_path, --best_model_path, ids,
--num_channels, --latent_channels, --spe, --dataset)."""
from __future__ import annotations

import argparse

from sleepgen.cli.train_autoencoderkl import parse_list


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_file", type=str, required=True)
    p.add_argument("--autoencoderkl_config_file_path", type=str, required=True)
    p.add_argument("--best_model_path", type=str, required=True,
                   help="AEKL run dir containing best_model/")
    p.add_argument("--path_train_ids", type=str, required=True)
    p.add_argument("--path_valid_ids", type=str, required=True)
    p.add_argument("--path_pre_processed", type=str, required=True)
    p.add_argument("--num_channels", type=parse_list, default=None)
    p.add_argument("--latent_channels", type=int, default=None)
    p.add_argument("--spe", type=str, default="no-spectral")
    p.add_argument("--dataset", type=str, default="edfx")
    p.add_argument("--dtype", type=str, default="bfloat16")
    return p


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    import jax

    from sleepgen.config import load_config
    from sleepgen.data import load_split
    from sleepgen.train.train_aekl import init_state
    from sleepgen.train.train_ldm import train_ldm
    from sleepgen.utils import CheckpointManager

    args = build_parser().parse_args(argv)
    cfg = load_config(args.config_file)
    aekl_cfg = load_config(args.autoencoderkl_config_file_path)
    if args.num_channels is not None:
        aekl_cfg.aekl.num_channels = list(args.num_channels)
    if args.latent_channels is not None:
        aekl_cfg.aekl.latent_channels = args.latent_channels
    cfg.spectral = args.spe == "spectral"
    cfg.dataset = args.dataset
    cfg.dtype = args.dtype

    train_ds = load_split(args.path_train_ids, args.path_pre_processed, args.dataset)
    valid_ds = load_split(args.path_valid_ids, args.path_pre_processed, args.dataset)

    state0, *_ = init_state(aekl_cfg, jax.random.PRNGKey(0),
                            window=train_ds.padded_window)
    ckpt = CheckpointManager(args.best_model_path)
    stage1_params = ckpt.restore_best(jax.device_get(state0.params_g))
    ckpt.close()

    result = train_ldm(cfg, train_ds, valid_ds, stage1_params, aekl_cfg=aekl_cfg)
    print(f"run_dir={result.run_dir} best_loss={result.best_loss:.6f} "
          f"scale_factor={result.scale_factor:.6f}")
    return result


if __name__ == "__main__":
    main()
