"""Figure/artifact report smoke tests."""
import numpy as np

from sleepgen.eval.reports import (
    save_confusion_matrix_figure,
    save_reconstruction_figure,
    save_sample_figure,
    save_spectral_figure,
)


def test_report_figures(tmp_path):
    rng = np.random.default_rng(0)
    orig = rng.normal(size=(2, 1, 3000)).astype(np.float32)
    recon = orig + 0.1 * rng.normal(size=orig.shape).astype(np.float32)

    p1 = save_reconstruction_figure(tmp_path, 5, orig, recon)
    assert p1.exists()
    assert (tmp_path / "original_RECONSTRUCTION_5.npy").exists()

    p2 = save_spectral_figure(tmp_path, 5, orig, recon)
    assert p2.exists()
    spe = np.load(tmp_path / "original_spe_SPECTRAL_RECONSTRUCTION_5.npy")
    assert spe.shape[0] == 2  # freqs + psd

    p3 = save_sample_figure(tmp_path, 5, recon)
    assert p3.exists()

    cm = np.array([[5, 1], [0, 4]])
    p4 = save_confusion_matrix_figure(tmp_path / "cm.png", cm, ("A", "B"))
    assert p4.exists()


def test_metrics_logger_tensorboard_optin(tmp_path, monkeypatch):
    """SLEEPGEN_TENSORBOARD=1 writes TB event files next to the JSONL."""
    monkeypatch.setenv("SLEEPGEN_TENSORBOARD", "1")
    from sleepgen.utils.logging import MetricsLogger

    lg = MetricsLogger(tmp_path, "train")
    lg.log(0, {"loss": 1.5})
    lg.log(1, {"loss": 1.0})
    lg.close()
    assert (tmp_path / "metrics_train.jsonl").exists()
    tb_dir = tmp_path / "tb_train"
    assert tb_dir.exists() and any(tb_dir.iterdir())
