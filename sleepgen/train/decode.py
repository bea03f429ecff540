"""Downstream sleep-stage classifier training harness.

Parity target: the skorch ``EEGClassifier`` setup of
``src/testing/run_sleep_decode.py:195-245``: AdamW(lr 1e-3, wd 1e-3),
class-balanced cross-entropy, cosine LR over n_epochs, batch 64,
balanced-accuracy scoring per epoch, confusion matrix at the end.
Re-designed as a jitted train step over the data mesh.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sleepgen.data.staging import balanced_class_weights
from sleepgen.parallel import make_mesh, shard_batch
from sleepgen.utils import jit_init


def weighted_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                           class_weights: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = jnp.take(class_weights, labels)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-8)


def balanced_accuracy(y_true: np.ndarray, y_pred: np.ndarray,
                      n_classes: int = 5) -> float:
    """Mean per-class recall (sklearn balanced_accuracy_score)."""
    recalls = []
    for c in range(n_classes):
        mask = y_true == c
        if mask.any():
            recalls.append(float((y_pred[mask] == c).mean()))
    return float(np.mean(recalls)) if recalls else 0.0


def confusion_matrix(y_true: np.ndarray, y_pred: np.ndarray,
                     n_classes: int = 5) -> np.ndarray:
    cm = np.zeros((n_classes, n_classes), np.int64)
    np.add.at(cm, (y_true, y_pred), 1)
    return cm


@dataclass
class DecodeResult:
    best_valid_bal_acc: float
    history: list
    confusion: np.ndarray
    params: Any
    # classify new windows with the trained (final-epoch) decoder — used by
    # the conditional-generation gate (scripts/demo_conditional.py) to
    # check sampled windows against their requested stage labels
    predict: Any = None


def train_decoder(
    model,
    train_xy: Tuple[np.ndarray, np.ndarray],
    valid_xy: Tuple[np.ndarray, np.ndarray],
    n_epochs: int = 10,
    batch_size: int = 64,
    lr: float = 1e-3,
    weight_decay: float = 1e-3,
    n_classes: int = 5,
    seed: int = 2,
    mesh=None,
    dtype=jnp.float32,
) -> DecodeResult:
    """Train any (B, ..., C)->logits flax classifier with the reference's
    optimization recipe. Inputs are pre-epoched numpy arrays."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    x_train, y_train = train_xy
    x_valid, y_valid = valid_xy

    rng = jax.random.PRNGKey(seed)
    variables = jit_init(model, {"params": rng, "dropout": rng},
                         jnp.asarray(x_train[:2], dtype), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    steps_per_epoch = max(1, len(x_train) // batch_size)
    schedule = optax.cosine_decay_schedule(lr, max(1, (n_epochs - 1) * steps_per_epoch))
    opt = optax.adamw(schedule, weight_decay=weight_decay)
    opt_state = opt.init(params)
    class_w = jnp.asarray(balanced_class_weights(y_train, n_classes))

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            # models without BatchNorm (e.g. Chambon without apply_batch_norm)
            # produce no batch_stats collection
            return (weighted_cross_entropy(out, y, class_w),
                    mut.get("batch_stats", {}))

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    @jax.jit
    def predict_step(params, batch_stats, x):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          x, train=False)
        return jnp.argmax(out, axis=-1)

    def predict(x):
        preds = []
        for i in range(0, len(x), batch_size):
            xb = x[i : i + batch_size]
            pad = (-len(xb)) % n_dev
            if pad:
                xb = np.concatenate([xb, np.repeat(xb[-1:], pad, 0)])
            xb = shard_batch(mesh, jnp.asarray(xb, dtype))
            p = np.asarray(jax.device_get(predict_step(params, batch_stats, xb)))
            preds.append(p[: len(x[i : i + batch_size])])
        return np.concatenate(preds)

    history = []
    best = 0.0
    np_rng = np.random.default_rng(seed)
    for epoch in range(n_epochs):
        order = np_rng.permutation(len(x_train))
        losses = []
        for i in range(0, len(order), batch_size):
            idx = order[i : i + batch_size]
            xb, yb = x_train[idx], y_train[idx]
            pad = (-len(xb)) % n_dev
            if pad:
                xb = np.concatenate([xb, np.repeat(xb[-1:], pad, 0)])
                yb = np.concatenate([yb, np.repeat(yb[-1:], pad, 0)])
            xb = shard_batch(mesh, jnp.asarray(xb, dtype))
            yb = shard_batch(mesh, jnp.asarray(yb))
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, xb, yb,
                jax.random.fold_in(rng, epoch * 10000 + i))
            losses.append(float(jax.device_get(loss)))
        yp = predict(x_valid)
        vacc = balanced_accuracy(y_valid, yp, n_classes)
        tacc = balanced_accuracy(y_train, predict(x_train), n_classes)
        history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                        "train_bal_acc": tacc, "valid_bal_acc": vacc})
        best = max(best, vacc)

    cm = confusion_matrix(y_valid, predict(x_valid), n_classes)
    return DecodeResult(best, history, cm, params, predict)
