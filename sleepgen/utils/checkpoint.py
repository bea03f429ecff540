"""Checkpointing — one canonical orbax format regardless of mesh size.

The reference has three checkpoint formats and a DataParallel
``module.``-prefix pitfall (SURVEY.md §4: compute_mmds.py:475-478 strips a
prefix that train_ldm.py:138-141 leaves commented out). sleepgen stores a
single pytree {step, state..., best_loss, meta} via orbax; sharded or
replicated arrays restore identically on any mesh.

Keep-last-K plus best-model retention implements the README's manual
"last model before the loss exploded" recovery (README.md:18) as an
automatic policy: the NaN guard in the trainers stops on non-finite loss
and the latest finite checkpoint is already on disk.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, run_dir: str | Path, max_to_keep: int = 3):
        self.run_dir = Path(run_dir).resolve()
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.run_dir / "checkpoints",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
            ),
        )
        # synchronous: the async StandardCheckpointer races interpreter
        # shutdown when the final save is the last thing a CLI does
        self._best = ocp.Checkpointer(ocp.StandardCheckpointHandler())

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore_latest(self, template: Any) -> Optional[Any]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def save_best(self, state: Any, name: str = "best_model") -> None:
        path = self.run_dir / name
        if path.exists():
            import shutil

            shutil.rmtree(path)
        self._best.save(path, args=ocp.args.StandardSave(state))

    def restore_best(self, template: Any, name: str = "best_model") -> Any:
        return self._best.restore(
            self.run_dir / name, args=ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.close()
