"""CLI: SHHS ingest (reference ``src/preprocessing/convert_shhs.py``):
EDF + profusion XML labels -> stage-mapped (N4->N3, REM->4), 18 Hz
low-pass, resample to 100 Hz, crop ±30 min around non-wake epochs,
save C4-A1 / C3-A2 .npy arrays."""
from __future__ import annotations

import argparse
import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np


def parse_profusion_stages(xml_path: str | Path) -> np.ndarray:
    """SleepStages from a profusion XML (convert_shhs.py:86-99)."""
    root = ET.parse(xml_path).getroot()
    stages = root.find("SleepStages")
    if stages is None:  # reference indexes r[4]
        stages = list(root)[4]
    return np.asarray([int(s.text) for s in stages], np.int64)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--edf_dir", type=str, required=True)
    p.add_argument("--ann_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--ids_csv", type=str, required=True,
                   help="CSV with an nsrrid column")
    p.add_argument("--target_sfreq", type=float, default=100.0)
    p.add_argument("--h_freq", type=float, default=18.0)
    return p


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    import pandas as pd

    from sleepgen.data.edf import read_edf
    from sleepgen.data.ingest import lowpass_fir, map_shhs_stages, resample_fft

    args = build_parser().parse_args(argv)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ids = pd.read_csv(args.ids_csv)["nsrrid"].astype(str).tolist()

    for nsrrid in ids:
        edf_path = Path(args.edf_dir) / f"shhs1-{nsrrid}.edf"
        xml_path = Path(args.ann_dir) / f"shhs1-{nsrrid}-profusion.xml"
        if not edf_path.exists() or not xml_path.exists():
            print(f"missing {nsrrid}")
            continue
        labels = parse_profusion_stages(xml_path)
        if labels.max() > 5:
            print(f"faulty labels in {nsrrid}")
            continue
        y = map_shhs_stages(labels)

        # crop window in 30 s epochs around non-wake (convert_shhs.py:104-113)
        nw = np.flatnonzero(y != 0)
        if len(nw) == 0:
            print(f"no sleep epochs in {nsrrid}, skipping")
            continue
        start_ep = max(nw[0] - 60, 0)  # 30 min = 60 epochs
        end_ep = min(nw[-1] + 60, len(y) - 1)

        edf = read_edf(edf_path)
        eeg_idx = sorted(
            i for i, l in enumerate(edf.labels) if "EEG" in l)
        real_names = ["C4-A1", "C3-A2"]
        for k, i in enumerate(eeg_idx[:2]):
            sf = edf.sfreq(i)
            x = lowpass_fir(edf.data[i], args.h_freq, sf)
            x = resample_fft(x, sf, args.target_sfreq)
            sf2 = args.target_sfreq
            seg = x[int(start_ep * sf2 * 30): int((end_ep + 1) * sf2 * 30)]
            np.save(out_dir / f"shhs1-{nsrrid}-{real_names[k]}.npy", seg)
        np.save(out_dir / f"shhs1-{nsrrid}-stages.npy", y[start_ep : end_ep + 1])
        print(f"converted {nsrrid}")


if __name__ == "__main__":
    main()
