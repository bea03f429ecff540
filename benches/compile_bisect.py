"""Bisect which op makes decode train-step compiles pathologically slow
on the TPU backend (measured: plain-Chambon step 382 s; USleep step fast).

Times AOT compilation (jit(...).lower().compile()) of ablated gradient
graphs — no execution — so one run localizes the slow lowering:
  fwd            forward only
  grad_nopool    grad, max_pool replaced by strided slicing
  grad_pool      grad, real max_pool (SelectAndScatter backward)
  grad_pool_bn   grad, max_pool + BatchNorm (the full variant-b step shape)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benches/compile_bisect.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sleepgen.nn.chambon import Im2ColConv1d


class Mini(nn.Module):
    pool: str = "max"  # "max" | "stride"
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        h = Im2ColConv1d(8, 50, padding=(10, 10), name="conv1")(x)
        if self.use_bn:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn1")(h)
        h = nn.relu(h)
        if self.pool == "max":
            h = nn.max_pool(h, (13,), strides=(13,), padding="VALID")
        else:
            h = h[:, ::13, :]
        h = Im2ColConv1d(8, 50, padding=(10, 10), name="conv2")(h)
        h = nn.relu(h)
        if self.pool == "max":
            h = nn.max_pool(h, (13,), strides=(13,), padding="VALID")
        else:
            h = h[:, ::13, :]
        return nn.Dense(5, name="fc")(h.reshape(x.shape[0], -1))


def time_compile(label, model, x, grad, train):
    rngs = {"params": jax.random.PRNGKey(0)}
    v = model.init(rngs, x, train=False)

    if grad:
        def loss(p):
            kwargs = {}
            if "batch_stats" in v:
                out, _ = model.apply(
                    {"params": p, "batch_stats": v["batch_stats"]}, x,
                    train=True, mutable=["batch_stats"])
            else:
                out = model.apply({"params": p}, x, train=train)
            return jnp.mean(out ** 2)

        fn = jax.jit(jax.grad(loss))
        arg = v["params"]
    else:
        fn = jax.jit(lambda p: model.apply(
            {"params": p, **({"batch_stats": v["batch_stats"]}
                             if "batch_stats" in v else {})}, x, train=False))
        arg = v["params"]

    t0 = time.perf_counter()
    lowered = fn.lower(arg)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    del compiled
    print(f"{label:14s} trace/lower {t1-t0:7.1f}s  compile {t2-t1:7.1f}s",
          flush=True)
    return t2 - t1


def main():
    x = jnp.asarray(np.random.default_rng(0).random((32, 3000, 1), np.float32))
    results = {}
    jax.jit(lambda: jnp.zeros(()))().block_until_ready()
    print("TPU_CONTACT_OK", flush=True)
    results["fwd"] = time_compile("fwd", Mini(), x, grad=False, train=False)
    results["grad_nopool"] = time_compile(
        "grad_nopool", Mini(pool="stride"), x, grad=True, train=False)
    results["grad_pool"] = time_compile(
        "grad_pool", Mini(), x, grad=True, train=False)
    results["grad_pool_bn"] = time_compile(
        "grad_pool_bn", Mini(use_bn=True), x, grad=True, train=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
