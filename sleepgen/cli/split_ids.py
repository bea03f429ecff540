"""CLI: subject-level 60/20/20 split (reference
``src/preprocessing/split_train_valid_test_sleep_edfx.py``)."""
from __future__ import annotations

import argparse


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    from sleepgen.data.splits import write_splits

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ids_csv", type=str, required=True)
    args = p.parse_args(argv)
    write_splits(args.ids_csv)
    print("Done")


if __name__ == "__main__":
    main()
