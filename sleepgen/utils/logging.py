"""Run-dir management + metrics/artifact logging.

Replaces the reference's TensorBoard/MLflow stack (``src/util.py:29-222``)
with a dependency-free JSONL metrics stream plus the same .npy artifact
contract (``original_*.npy`` / ``reconstr_*.npy`` dumps, util.py:169-173)
so downstream tooling interops. PSD figures are produced by
sleepgen.eval.psd (matplotlib optional).
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict

import numpy as np


def setup_run_dir(output_dir: str | Path, run_name: str) -> tuple[Path, bool]:
    """Create (or resume) a run dir; resume iff checkpoints exist
    (reference util.py:29-45 semantics)."""
    run_dir = Path(output_dir) / run_name
    resume = (run_dir / "checkpoints").exists()
    run_dir.mkdir(parents=True, exist_ok=True)
    return run_dir, resume


class MetricsLogger:
    """Append-only JSONL scalar stream, one file per split.

    Set ``SLEEPGEN_TENSORBOARD=1`` to additionally emit TensorBoard event
    files under ``{run_dir}/tb_{split}`` — restores the reference's dual
    train/val writer surface (``src/train_autoencoderkl.py:116-117``)
    without making TB a hard dependency of the JSONL contract.
    """

    def __init__(self, run_dir: str | Path, split: str = "train"):
        self.path = Path(run_dir) / f"metrics_{split}.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a", buffering=1)
        self._tb = None
        import os

        if os.environ.get("SLEEPGEN_TENSORBOARD"):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(Path(run_dir) / f"tb_{split}"))
            except Exception:  # TB genuinely unavailable: JSONL still works
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


def log_reconstruction_arrays(
    run_dir: str | Path, step: int, original: np.ndarray, recon: np.ndarray,
    name: str = "RECONSTRUCTION",
) -> None:
    """npy artifact parity with reference util.py:156-173 (arrays are saved
    in the reference's (B, C, L) layout)."""
    run_dir = Path(run_dir)
    np.save(run_dir / f"original_{name}_{step}.npy", original)
    np.save(run_dir / f"reconstr_{name}_{step}.npy", recon)
