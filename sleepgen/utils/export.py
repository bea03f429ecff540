"""Run export — the mlflow surface of the reference, dependency-free.

Parity target: ``src/util.py:197-222`` (``log_mlflow``: artifacts + final
model into a tracking store) and ``src/testing/convert_mlflow_to_pytorch.py``
(the converter back to a load-able model). sleepgen's equivalent: a
portable export directory with a JSON manifest, all run artifacts, and the
final parameters as a flat .npz that loads anywhere (numpy, torch, jax)
without orbax.
"""
from __future__ import annotations

import json
import shutil
import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def flatten_params(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Pytree -> {'a/b/c': ndarray} (a stable, framework-neutral naming)."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in sorted(tree.items()):
            out.update(flatten_params(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return root


def export_run(
    run_dir: str | Path,
    export_dir: Optional[str | Path] = None,
    params: Any = None,
    metrics: Optional[Dict[str, float]] = None,
) -> Path:
    """Bundle a run: manifest.json + artifacts/ + final_model.npz."""
    run_dir = Path(run_dir)
    export_dir = Path(export_dir or (run_dir / "export"))
    export_dir.mkdir(parents=True, exist_ok=True)

    artifacts = export_dir / "artifacts"
    artifacts.mkdir(exist_ok=True)
    copied = []
    for p in run_dir.iterdir():
        if p.is_file() and p.suffix in (".yaml", ".jsonl", ".npy", ".pdf",
                                        ".tsv", ".json", ".png"):
            shutil.copy2(p, artifacts / p.name)
            copied.append(p.name)

    if params is not None:
        np.savez(export_dir / "final_model.npz", **flatten_params(params))

    manifest = {
        "run_dir": str(run_dir),
        "exported_at": time.time(),
        "artifacts": sorted(copied),
        "has_model": params is not None,
        "metrics": metrics or {},
    }
    (export_dir / "manifest.json").write_text(json.dumps(manifest, indent=1))
    return export_dir


def load_exported_params(export_dir: str | Path) -> Dict[str, Any]:
    """final_model.npz -> nested param pytree (convert_mlflow_to_pytorch
    analogue)."""
    with np.load(Path(export_dir) / "final_model.npz") as z:
        return unflatten_params({k: z[k] for k in z.files})
