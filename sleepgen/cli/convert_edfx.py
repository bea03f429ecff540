"""CLI: Sleep-EDFx ingest (reference ``src/preprocessing/convert_edfx.py``)
— EDF -> cropped (±30 min around sleep), 18 Hz low-passed, per-channel
(1, T) .npy files + annotations. MNE-free: uses sleepgen's own EDF reader
and FIR DSP. Expects PSG/hypnogram pairs already on disk (the reference
fetches from PhysioNet; this environment has no network egress)."""
from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", type=str, required=True,
                   help="dir of *-PSG.edf and *-Hypnogram.edf files")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--h_freq", type=float, default=18.0)
    p.add_argument("--crop_wake_mins", type=float, default=30.0)
    return p


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    from sleepgen.data.ingest import convert_edfx_recording

    args = build_parser().parse_args(argv)
    data_dir = Path(args.data_dir)
    psgs = sorted(data_dir.glob("*PSG.edf"))
    if not psgs:
        psgs = sorted(data_dir.glob("*.edf"))
    for psg in psgs:
        stem = psg.stem.replace("-PSG", "")
        hyps = list(data_dir.glob(f"{stem[:7]}*Hypnogram*.edf"))
        hyp = hyps[0] if hyps else None
        written = convert_edfx_recording(
            psg, hyp, args.out_dir, args.h_freq, args.crop_wake_mins)
        print(f"{psg.name}: wrote {sorted(written)}")


if __name__ == "__main__":
    main()
