"""CLI: stage-1 AEKL training.

Flag parity with reference ``src/train_autoencoderkl.py:43-103``:
--config_file, --path_train_ids, --path_valid_ids, --path_pre_processed,
--num_channels (python-literal list), --spe {spectral,no-spectral},
--latent_channels, --dataset {edfx,shhs,shhsh}.

Usage: python -m sleepgen.cli.train_autoencoderkl --config_file ... --dataset edfx
"""
from __future__ import annotations

import argparse
import ast


def parse_list(s):
    return ast.literal_eval(s) if isinstance(s, str) else s


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_file", type=str, required=True)
    p.add_argument("--path_train_ids", type=str, required=True)
    p.add_argument("--path_valid_ids", type=str, required=True)
    p.add_argument("--path_pre_processed", type=str, required=True)
    p.add_argument("--num_channels", type=parse_list, default=None)
    p.add_argument("--spe", type=str, default="no-spectral",
                   choices=["spectral", "no-spectral"])
    p.add_argument("--latent_channels", type=int, default=None)
    p.add_argument("--dataset", type=str, default="edfx",
                   choices=["edfx", "shhs", "shhsh"])
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    return p


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    from sleepgen.config import load_config
    from sleepgen.data import load_split
    from sleepgen.train.train_aekl import train_aekl

    args = build_parser().parse_args(argv)
    cfg = load_config(args.config_file)
    if args.num_channels is not None:
        cfg.aekl.num_channels = list(args.num_channels)
    if args.latent_channels is not None:
        cfg.aekl.latent_channels = args.latent_channels
    cfg.spectral = args.spe == "spectral"
    cfg.dataset = args.dataset
    cfg.dtype = args.dtype

    train_ds = load_split(args.path_train_ids, args.path_pre_processed, args.dataset)
    valid_ds = load_split(args.path_valid_ids, args.path_pre_processed, args.dataset)
    result = train_aekl(cfg, train_ds, valid_ds)
    print(f"run_dir={result.run_dir} best_loss={result.best_loss:.6f} "
          f"nan_stop={result.stopped_on_nan}")
    return result


if __name__ == "__main__":
    main()
