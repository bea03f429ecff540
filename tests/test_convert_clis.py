"""End-to-end tests for the dataset-conversion CLIs on synthesized files.

These are the real-data on-ramps (reference ``src/preprocessing/
convert_edfx.py`` / ``convert_shhs.py``); no PhysioNet/NSRR data exists in
this environment, so the EDFs and profusion XML are synthesized and the
full CLI main() is exercised: file matching, channel selection, stage
mapping, crop geometry, filtering, resampling, and the on-disk .npy
contract the loaders consume.
"""
from pathlib import Path

import numpy as np

from test_ingest import _write_edf


def test_convert_edfx_cli_e2e(tmp_path):
    sfreq = 100
    dur_s = 300
    t = np.arange(dur_s * sfreq) / sfreq
    eeg1 = 80 * np.sin(2 * np.pi * 4 * t)
    eeg2 = 40 * np.sin(2 * np.pi * 9 * t)
    resp = 10 * np.sin(2 * np.pi * 0.3 * t)

    data_dir = tmp_path / "edfx"
    data_dir.mkdir()
    # PSG carries no annotations; the hypnogram file must supply them
    _write_edf(data_dir / "SC4001E0-PSG.edf",
               [eeg1, eeg2, resp],
               ["EEG Fpz-Cz", "EEG Pz-Oz", "Resp oro-nasal"], sfreq)
    anns = [(0.0, 60.0, "Sleep stage W"),
            (60.0, 60.0, "Sleep stage 2"),
            (120.0, 60.0, "Sleep stage R"),
            (180.0, 120.0, "Sleep stage W")]
    _write_edf(data_dir / "SC4001EC-Hypnogram.edf",
               [np.zeros(10 * sfreq)], ["Marker"], sfreq, anns)

    out_dir = tmp_path / "npy"
    from sleepgen.cli.convert_edfx import main
    main(["--data_dir", str(data_dir), "--out_dir", str(out_dir),
          "--crop_wake_mins", "0.5"])

    written = sorted(p.name for p in out_dir.glob("*.npy"))
    assert written == ["SC4001E0-PSG-Fpz-Cz.npy", "SC4001E0-PSG-Pz-Oz.npy",
                       "SC4001E0-PSG-annotation.npy"]  # non-EEG excluded

    x = np.load(out_dir / "SC4001E0-PSG-Fpz-Cz.npy")
    assert x.ndim == 2 and x.shape[0] == 1  # loader contract: (1, T)
    # crop: [first sleep onset - 30 s, last sleep onset + 30 s]
    t0, t1 = 60.0 - 30.0, 120.0 + 30.0
    assert x.shape[1] == int((t1 - t0) * sfreq) + 1
    # 4 Hz tone passes the 18 Hz low-pass intact (interior, edges ring)
    want = eeg1[int(t0 * sfreq): int(t1 * sfreq) + 1]
    mid = slice(200, -200)
    assert np.corrcoef(x[0, mid], want[mid])[0, 1] > 0.99

    anns_npy = np.load(out_dir / "SC4001E0-PSG-annotation.npy",
                       allow_pickle=True)
    assert any("Sleep stage R" in str(a[2]) for a in anns_npy)


def test_convert_shhs_cli_e2e(tmp_path):
    sfreq = 125  # SHHS native rate; the CLI resamples to 100 Hz
    n_epochs = 10
    dur_s = n_epochs * 30
    t = np.arange(dur_s * sfreq) / sfreq
    c4 = 60 * np.sin(2 * np.pi * 4 * t)
    c3 = 30 * np.sin(2 * np.pi * 7 * t)

    edf_dir = tmp_path / "edf"
    ann_dir = tmp_path / "ann"
    out_dir = tmp_path / "npy"
    edf_dir.mkdir(); ann_dir.mkdir()

    _write_edf(edf_dir / "shhs1-200001.edf", [c4, c3],
               ["EEG C4-A1", "EEG C3-A2"], sfreq)
    # profusion stages incl. an N4 (-> N3) and a REM (5 -> 4)
    stages = [0, 0, 2, 3, 4, 5, 2, 0, 0, 0]
    xml = ("<CMPStudyConfig><SleepStages>"
           + "".join(f"<SleepStage>{s}</SleepStage>" for s in stages)
           + "</SleepStages></CMPStudyConfig>")
    (ann_dir / "shhs1-200001-profusion.xml").write_text(xml)

    # a second id with corrupt labels (>5) must be skipped, not crash
    _write_edf(edf_dir / "shhs1-200002.edf", [c4[:30 * sfreq]],
               ["EEG C4-A1"], sfreq)
    (ann_dir / "shhs1-200002-profusion.xml").write_text(
        "<CMPStudyConfig><SleepStages><SleepStage>9</SleepStage>"
        "</SleepStages></CMPStudyConfig>")

    ids_csv = tmp_path / "ids.csv"
    ids_csv.write_text("nsrrid\n200001\n200002\n200003\n")  # 200003 missing

    from sleepgen.cli.convert_shhs import main
    main(["--edf_dir", str(edf_dir), "--ann_dir", str(ann_dir),
          "--out_dir", str(out_dir), "--ids_csv", str(ids_csv)])

    written = sorted(p.name for p in out_dir.glob("*.npy"))
    assert written == ["shhs1-200001-C3-A2.npy", "shhs1-200001-C4-A1.npy",
                       "shhs1-200001-stages.npy"]

    # stage map: N4 -> N3 (5 -> 4 comes from REM=5 in profusion coding)
    y = np.load(out_dir / "shhs1-200001-stages.npy")
    # crop is +-60 epochs around non-wake -> whole recording here
    np.testing.assert_array_equal(y, [0, 0, 2, 3, 3, 4, 2, 0, 0, 0])

    x = np.load(out_dir / "shhs1-200001-C4-A1.npy")
    # 10 epochs * 30 s * 100 Hz after the 125 -> 100 Hz resample
    assert x.shape == (len(y) * 3000,)
    t2 = np.arange(len(x)) / 100.0
    want = 60 * np.sin(2 * np.pi * 4 * t2)
    mid = slice(500, -500)
    assert np.corrcoef(x[mid], want[mid])[0, 1] > 0.999
