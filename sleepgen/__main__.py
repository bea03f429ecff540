"""Umbrella CLI: ``python -m sleepgen <command> [args...]``."""
from __future__ import annotations

import sys

COMMANDS = {
    "train-aekl": "sleepgen.cli.train_autoencoderkl",
    "train-ldm": "sleepgen.cli.train_ldm",
    "train-dm": "sleepgen.cli.train_pure_ldm",
    "sample": "sleepgen.cli.sample_trials",
    "sample-dm": "sleepgen.cli.sample_trials_ddpm",
    "sample-ae": "sleepgen.cli.sample_trials_autoencoder",
    "compute-mmds": "sleepgen.cli.compute_mmds",
    "compute-fid": "sleepgen.cli.compute_fid",
    "band-eval": "sleepgen.cli.band_eval",
    "decode": "sleepgen.cli.run_sleep_decode",
    "convert-edfx": "sleepgen.cli.convert_edfx",
    "convert-shhs": "sleepgen.cli.convert_shhs",
    "split-ids": "sleepgen.cli.split_ids",
    "serve": "sleepgen.cli.serve",
    "warm-cache": "sleepgen.cli.warm_cache",
    "impute": "sleepgen.cli.impute",
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m sleepgen <command> [args...]\ncommands:")
        for k in COMMANDS:
            print(f"  {k}")
        return 0 if len(sys.argv) >= 2 else 2
    cmd = sys.argv.pop(1)
    if cmd not in COMMANDS:
        print(f"unknown command '{cmd}'", file=sys.stderr)
        return 2
    import importlib

    mod = importlib.import_module(COMMANDS[cmd])
    return mod.main()


if __name__ == "__main__":
    sys.exit(main())
