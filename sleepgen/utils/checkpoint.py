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
        try:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        except Exception:
            # checkpoint-format evolution: older checkpoints may lack newly
            # added state fields (e.g. ema_params). Restore the raw tree and
            # merge it over the template, keeping template defaults for
            # fields the checkpoint predates.
            raw = self._mgr.restore(step)
            return _merge_into(template, raw)

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


def _merge_into(template: Any, raw: Any) -> Any:
    """Overlay a restored raw pytree (dicts/arrays) onto a typed template,
    keeping template values for fields absent from the checkpoint."""
    if raw is None:
        return template
    if isinstance(raw, dict):
        if hasattr(template, "_fields"):  # NamedTuple (optax states)
            return type(template)(*[
                _merge_into(getattr(template, f), raw[f]) if f in raw
                else getattr(template, f)
                for f in template._fields
            ])
        if hasattr(template, "replace") and not isinstance(template, dict):
            # flax.struct dataclass
            updates = {
                k: _merge_into(getattr(template, k), v)
                for k, v in raw.items() if hasattr(template, k)
            }
            return template.replace(**updates)
        if isinstance(template, dict) or template is None or not raw:
            base = dict(template) if isinstance(template, dict) else {}
            for k, v in raw.items():
                base[k] = _merge_into(base.get(k), v)
            return base
    if isinstance(raw, (list, tuple)) and isinstance(template, (list, tuple)):
        return type(template)(
            _merge_into(t, r) for t, r in zip(template, raw))
    return raw
