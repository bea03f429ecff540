"""Training-step throughput on the real chip (not the headline bench):
AEKL G/D fused step and LDM diffusion step at flagship configs.

Usage: python benches/bench_train.py [--batch N]
Prints one JSON line per workload.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from sleepgen.config import Config
from sleepgen.train.train_aekl import init_state, make_train_step
from sleepgen.train.train_ldm import (
    DiffusionState,
    build_unet,
    make_ldm_train_step,
    make_schedule,
)


def bench(fn, state, batch, rng, iters=10):
    # vary the rng per call: identical (executable, buffers) invocations
    # can be memoized by the execution relay and report impossible speeds
    state, m = fn(state, batch, jax.random.fold_in(rng, 999))
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = fn(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / iters, state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--spectral", action="store_true")
    args = p.parse_args()

    cfg = Config()
    cfg.aekl.num_channels = [32, 32, 64]
    cfg.aekl.latent_channels = 1
    cfg.spectral = args.spectral
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    # ---- AEKL G/D step at 3072 window
    state, ae, disc, opt_g, opt_d = init_state(cfg, rng, window=3072, dtype=dtype)
    step = make_train_step(ae, disc, opt_g, opt_d, cfg)
    batch = jax.random.uniform(rng, (args.batch, 3072, 1), dtype)
    dt, state = bench(step, state, batch, rng)
    print(json.dumps({"metric": "aekl_train_windows_per_sec",
                      "batch": args.batch, "value": round(args.batch / dt, 1),
                      "sec_per_step": round(dt, 4)}))

    # ---- LDM step (frozen encoder + UNet bwd)
    sched = make_schedule(cfg)
    unet = build_unet(cfg, 1, 1, dtype)
    z0 = jnp.zeros((2, 768, 1), jnp.float32)
    params = unet.init(rng, z0, jnp.zeros((2,), jnp.int32))["params"]
    import optax

    opt = optax.adam(1e-4)
    dstate = DiffusionState(
        step=jnp.zeros((), jnp.int32), params=params, opt=opt.init(params),
        best_loss=jnp.asarray(jnp.inf, jnp.float32),
        scale_factor=jnp.asarray(1.0, jnp.float32))
    ldm_step = make_ldm_train_step(unet, ae, state.params_g, sched, opt)
    dt, _ = bench(ldm_step, dstate, batch, rng)
    print(json.dumps({"metric": "ldm_train_windows_per_sec",
                      "batch": args.batch, "value": round(args.batch / dt, 1),
                      "sec_per_step": round(dt, 4)}))


if __name__ == "__main__":
    main()
