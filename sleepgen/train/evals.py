"""Shared validation-reduction helpers.

The loaders pad short final batches up to the mesh size by repeating the
tail window (``sleepgen.parallel.pad_to_multiple``, drop_last=False parity
with the reference, dataset/dataset.py:76). Averaging per-batch means over
those padded batches would double-count the repeated tail and bias the
validation loss (and therefore best-model selection), so eval steps return
*per-sample* losses and this helper trims the padded rows before reducing.
"""
from __future__ import annotations

from typing import Callable, Iterable

import jax
import numpy as np


def masked_epoch_mean(
    n_total: int,
    batches: Iterable[np.ndarray],
    losses_fn: Callable[[int, np.ndarray], "jax.Array"],
    batch_size: int | None = None,
) -> float:
    """Exact mean of per-sample losses over one validation epoch.

    ``losses_fn(batch_index, batch) -> (B,) per-sample losses``; padded
    rows (introduced by pad_to_multiple, always appended at the batch
    tail) are excluded from the reduction.

    ``batch_size`` is the loader's REAL batch size: when it is not a
    multiple of the device count, pad_to_multiple pads EVERY batch (not
    just the final one), so the per-batch real-row count is
    ``min(batch_size, n_total - count)`` — without it, duplicated tail
    rows in non-final batches would be counted as real samples and real
    tail batches would be dropped once the count saturated early.
    """
    total, count = 0.0, 0
    for bi, batch in enumerate(batches):
        losses = np.asarray(jax.device_get(losses_fn(bi, batch)))
        n_valid = min(losses.shape[0], n_total - count)
        if batch_size is not None:
            n_valid = min(n_valid, batch_size)
        if n_valid <= 0:
            break
        total += float(losses[:n_valid].sum())
        count += n_valid
    return total / max(count, 1)
