"""CLI: downstream sleep-stage decoding (reference
``src/testing/run_sleep_decode.py`` + _b/_c variants):
  * variant a: TimeDistributed Chambon2018 over 3-window sequences
  * variant b: plain single-window Chambon2018 (run_sleep_decode_b.py)
  * variant c: DeepSleepNet single-window (run_sleep_decode_c.py)
Consumes per-recording .npy + annotation .npy files produced by
cli.convert_edfx (the braindecode SleepPhysionet fetch is replaced by the
local MNE-free ingest)."""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", type=str, required=True,
                   help="dir with <rec>-<ch>.npy and <rec>-annotation.npy")
    p.add_argument("--channel", type=str, default="Fpz-Cz")
    p.add_argument("--variant", type=str, default="a", choices=["a", "b", "c"])
    p.add_argument("--n_epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--output_dir", type=str, default="decode_out")
    p.add_argument("--seed", type=int, default=None,
                   help="overrides the config seed (reference default 1996)")
    p.add_argument("--config_file", type=str, default=None,
                   help="sleep_stage{,_b,_c}.yaml — sets seed and the "
                        "run-dir name (reference run_sleep_decode.py:56-90)")
    return p


def load_staged_dataset(data_dir: Path, channel: str):
    """Assemble (windows, labels, rec_ids) from ingest outputs."""
    from sleepgen.data.staging import standard_scale_windows, windows_from_annotations

    xs, ys, rids = [], [], []
    rid = 0
    for ann_path in sorted(data_dir.glob("*-annotation.npy")):
        stem = ann_path.name.replace("-annotation.npy", "")
        sig_path = data_dir / f"{stem}-{channel}.npy"
        if not sig_path.exists():
            continue
        sig = np.load(sig_path).reshape(-1) * 1e6  # volts -> uV (reference scale)
        anns = [tuple(a) for a in np.load(ann_path, allow_pickle=True)]
        anns = [(float(o), float(d), str(t)) for o, d, t in anns]
        x, y = windows_from_annotations(sig, 100, anns)
        if len(x) == 0:
            continue
        xs.append(standard_scale_windows(x))
        ys.append(y)
        rids.append(np.full(len(y), rid))
        rid += 1
    return (np.concatenate(xs), np.concatenate(ys), np.concatenate(rids))


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    import json

    from sleepgen.data.staging import center_label, sequence_indices
    from sleepgen.nn.chambon import SleepStagerChambon2018, TimeDistributedStager
    from sleepgen.nn.deepsleepnet import DeepSleepNet
    from sleepgen.train.decode import train_decoder

    args = build_parser().parse_args(argv)
    out = Path(args.output_dir)
    seed = args.seed
    if args.config_file:
        from sleepgen.config import Config

        cfg = Config.from_yaml(args.config_file)
        if seed is None:
            seed = cfg.train.seed
        out = out / cfg.train.run_dir
    if seed is None:
        seed = 2
    x, y, rids = load_staged_dataset(Path(args.data_dir), args.channel)

    # subject-level split by recording id (60/20/20)
    recs = np.unique(rids)
    rng = np.random.RandomState(42)
    perm = rng.permutation(len(recs))
    n_test = int(np.ceil(len(recs) * 0.2))
    test_r, rest = recs[perm[:n_test]], recs[perm[n_test:]]
    n_val = int(np.ceil(len(rest) * 0.25))
    valid_r, train_r = rest[:n_val], rest[n_val:]

    def take(rs):
        m = np.isin(rids, rs)
        return x[m], y[m], rids[m]

    xtr, ytr, rtr = take(train_r)
    xva, yva, rva = take(valid_r)

    if args.variant == "a":
        str_, sva = sequence_indices(rtr, 3, 3), sequence_indices(rva, 3, 3)
        train_xy = (xtr[str_], center_label(ytr, str_))
        valid_xy = (xva[sva], center_label(yva, sva))
        model = TimeDistributedStager(n_chans=1, sfreq=100)
    elif args.variant == "b":
        train_xy, valid_xy = (xtr, ytr), (xva, yva)
        model = SleepStagerChambon2018(n_chans=1, sfreq=100, dropout=0.5)
    else:
        train_xy, valid_xy = (xtr, ytr), (xva, yva)
        model = DeepSleepNet(n_outputs=5, sfreq=100)

    res = train_decoder(model, train_xy, valid_xy, n_epochs=args.n_epochs,
                        batch_size=args.batch_size, seed=seed)

    out.mkdir(parents=True, exist_ok=True)
    (out / "history.json").write_text(json.dumps(res.history, indent=1))
    np.save(out / "confusion_matrix.npy", res.confusion)
    print(f"best valid balanced accuracy: {res.best_valid_bal_acc:.4f}")
    print("confusion matrix (rows=true Wake/N1/N2/N3/REM):")
    print(res.confusion)


if __name__ == "__main__":
    main()
