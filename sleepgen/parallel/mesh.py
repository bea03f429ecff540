"""Device mesh + sharding: sleepgen's communication layer.

The reference's only parallelism is single-process
``torch.nn.DataParallel`` (replicate + scatter/gather each step;
``src/train_autoencoderkl.py:141-144``, ``src/train_ldm.py:190-192``,
``src/train_pure_ldm.py:119-120``) with NCCL hidden inside torch. The
TPU-native equivalent (SURVEY.md §2b) is a 1-D ``jax.sharding.Mesh`` over
the ``data`` axis: batches are sharded over devices, parameters are
replicated, and XLA inserts the psum gradient reduction over ICI. Models
here are small (≤ tens of M params) so tensor/pipeline parallelism is not
required for parity; the mesh API still accepts a ``model`` axis so larger
UNets can shard attention/conv channels later.

Multi-host: call :func:`initialize_distributed` first (wraps
``jax.distributed.initialize``), then the same code runs with DCN between
slices — no reference-style code changes.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up (optional; no-op on a single host)."""
    jax.distributed.initialize(**kwargs)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D (or 2-D) mesh over the available devices.

    Defaults to all devices on the data axis — the framework's equivalent
    of the reference's "wrap in DataParallel when >1 GPU".
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
        f"only {len(devices)} available")
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host pytree of arrays with batch-sharded leading axes."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(batch: np.ndarray, multiple: int) -> np.ndarray:
    """Pad the batch axis so it divides the data-axis size (drop_last=False
    parity with the reference loaders, dataset/dataset.py:76)."""
    b = batch.shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return batch
    pad = np.repeat(batch[-1:], rem, axis=0)
    return np.concatenate([batch, pad], axis=0)


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2, dtype=None):
    """Double-buffered host->device pipeline: keeps `size` batches in
    flight so device_put/H2D overlaps the running step (the TPU analogue
    of the reference's 25 DataLoader workers + pin_memory)."""
    import collections

    import jax.numpy as jnp

    queue = collections.deque()
    sh = batch_sharding(mesh)

    def put(batch):
        if isinstance(batch, tuple):
            # labeled batch (x, y, ...): dtype applies to x only; labels
            # keep their integer dtype. All elements share the batch axis.
            head = jnp.asarray(batch[0], dtype) if dtype is not None else jnp.asarray(batch[0])
            rest = tuple(jnp.asarray(b) for b in batch[1:])
            return tuple(jax.device_put(a, sh) for a in (head, *rest))
        arr = jnp.asarray(batch, dtype) if dtype is not None else jnp.asarray(batch)
        return jax.device_put(arr, sh)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
