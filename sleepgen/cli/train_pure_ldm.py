"""CLI: signal-space diffusion training (reference ``src/train_pure_ldm.py``
flags; spectral flag enables the 1e-6 Jukebox term on predicted noise)."""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_file", type=str, required=True)
    p.add_argument("--path_train_ids", type=str, required=True)
    p.add_argument("--path_valid_ids", type=str, required=True)
    p.add_argument("--path_pre_processed", type=str, required=True)
    p.add_argument("--spe", type=str, default="no-spectral")
    p.add_argument("--dataset", type=str, default="edfx")
    p.add_argument("--dtype", type=str, default="bfloat16")
    return p


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    from sleepgen.config import load_config
    from sleepgen.data import load_split
    from sleepgen.train.train_dm import train_dm

    args = build_parser().parse_args(argv)
    cfg = load_config(args.config_file)
    cfg.spectral = args.spe == "spectral"
    cfg.dataset = args.dataset
    cfg.dtype = args.dtype

    train_ds = load_split(args.path_train_ids, args.path_pre_processed, args.dataset)
    valid_ds = load_split(args.path_valid_ids, args.path_pre_processed, args.dataset)
    result = train_dm(cfg, train_ds, valid_ds)
    print(f"run_dir={result.run_dir} best_loss={result.best_loss:.6f}")
    return result


if __name__ == "__main__":
    main()
