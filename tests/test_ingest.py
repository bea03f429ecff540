"""EDF reader + ingest DSP tests (hermetic: the EDF file is synthesized)."""
import struct
from pathlib import Path

import numpy as np

from sleepgen.data.edf import read_edf, write_edf
from sleepgen.data.ingest import (
    crop_to_sleep_period,
    lowpass_fir,
    map_shhs_stages,
    resample_fft,
)


# the EDF+ writer lives in the package now (sleepgen.data.edf.write_edf,
# also used by scripts/demo_shhs_e2e.py); tests alias it to keep the
# historical fixture name
_write_edf = write_edf


def test_edf_roundtrip(tmp_path):
    sfreq = 100
    t = np.arange(10 * sfreq) / sfreq
    sig1 = 100 * np.sin(2 * np.pi * 3 * t)  # uV scale
    sig2 = 50 * np.cos(2 * np.pi * 7 * t)
    anns = [(2.0, 30.0, "Sleep stage 2"), (5.0, 30.0, "Sleep stage R")]
    p = tmp_path / "test.edf"
    _write_edf(p, [sig1, sig2], ["EEG Fpz-Cz", "EEG Pz-Oz"], sfreq, anns)

    edf = read_edf(p)
    assert edf.labels == ["EEG Fpz-Cz", "EEG Pz-Oz"]
    assert edf.sfreq(0) == 100.0
    # quantization error bound: gain = 500/4095 ~ 0.12 uV
    np.testing.assert_allclose(edf.get("EEG Fpz-Cz"), sig1, atol=0.13)
    np.testing.assert_allclose(edf.get("EEG Pz-Oz"), sig2, atol=0.13)
    # TAL round-trip must preserve onset/duration, not just the text
    # (crop_to_sleep_period's geometry depends on the onsets)
    assert edf.annotations == [(2.0, 30.0, "Sleep stage 2"),
                               (5.0, 30.0, "Sleep stage R")]

    # channel whitelist
    only = read_edf(p, include=["EEG Pz-Oz"])
    assert only.labels == ["EEG Pz-Oz"]


def test_lowpass_fir_response():
    sfreq = 100.0
    t = np.arange(4000) / sfreq
    lo = np.sin(2 * np.pi * 5 * t)
    hi = np.sin(2 * np.pi * 35 * t)
    y = lowpass_fir(lo + hi, h_freq=18.0, sfreq=sfreq)
    assert len(y) == len(t)
    mid = slice(500, 3500)
    # 5 Hz passes (~unity), 35 Hz strongly attenuated
    assert np.corrcoef(y[mid], lo[mid])[0, 1] > 0.99
    resid = y[mid] - lo[mid]
    assert np.std(resid) < 0.02 * np.std(hi)


def test_resample_fft():
    sfreq, target = 125.0, 100.0
    t = np.arange(int(10 * sfreq)) / sfreq
    x = np.sin(2 * np.pi * 4 * t)
    y = resample_fft(x, sfreq, target)
    assert len(y) == 1000
    t2 = np.arange(1000) / target
    want = np.sin(2 * np.pi * 4 * t2)
    np.testing.assert_allclose(y[50:-50], want[50:-50], atol=5e-3)


def test_crop_to_sleep_period():
    sfreq = 100.0
    x = np.arange(int(3 * 3600 * sfreq))  # 3 h
    anns = [(0.0, 30.0, "Sleep stage W"),
            (3600.0, 30.0, "Sleep stage 1"),
            (5400.0, 30.0, "Sleep stage R"),
            (9000.0, 30.0, "Sleep stage W")]
    cropped, tmin = crop_to_sleep_period(x, sfreq, anns, crop_wake_mins=30.0)
    assert tmin == 3600.0 - 1800.0
    assert cropped[0] == int(tmin * sfreq)
    # end = last sleep onset + 30 min
    assert len(cropped) == int((5400 + 1800 - tmin) * sfreq) + 1


def test_shhs_stage_map():
    labels = np.array([0, 1, 2, 3, 4, 5])
    np.testing.assert_array_equal(map_shhs_stages(labels), [0, 1, 2, 3, 3, 4])
