"""A/B: diffusion UNet with vs without the fused GN+SiLU+conv3 Pallas
resblock kernel (config.fused_resblock_sampling), measured where it counts:
one UNet forward and the full DDIM-200 sampler at the v5e-optimal batch 64.

The microbench (bench_fused_resblock.py) cannot arbitrate this — both of
its in-one-jit harnesses distort XLA's scheduling (scan-carry feedback
penalizes XLA >10x vs its own dispatch-pipelined floor). This end-to-end
A/B is the keep-or-reject gate (BASELINE.md round-3).

Usage: python benches/ab_fused_resblock.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from sleepgen.config import Config
from sleepgen.sample.sample_ldm import make_ldm_sampler, sampling_schedule
from sleepgen.train.train_aekl import build_models
from sleepgen.train.train_ldm import build_unet

STEPS = 200
LATENT_LEN = 768
LATENT_CH = 1
B = 64


def main():
    from sleepgen.utils.profiling import enable_compilation_cache, tpu_contact

    enable_compilation_cache()
    tpu_contact()
    cfg = Config()
    cfg.aekl.num_channels = [32, 32, 64]
    cfg.aekl.latent_channels = LATENT_CH
    cfg.unet.image_size = LATENT_LEN
    cfg.diffusion.num_inference_steps = STEPS

    dtype = jnp.bfloat16
    ae, _ = build_models(cfg, dtype)
    sched = sampling_schedule(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, LATENT_LEN * 4, 1), dtype)
    ae_params = ae.init({"params": rng}, x, rng)["params"]
    z0 = jnp.zeros((2, LATENT_LEN, LATENT_CH), dtype)
    sf = jnp.float32(1.0)

    base = build_unet(cfg, LATENT_CH, LATENT_CH, dtype)
    unet_params = base.clone(fast_math=True).init(
        rng, z0, jnp.zeros((2,), jnp.int32))["params"]

    results = {}
    for label, fused in (("xla", False), ("fused_pallas", True)):
        unet = base.clone(fast_math=True, use_fused_resblock=fused)

        # single UNet forward, batch 64 (pregenerated varied inputs;
        # identical args through the relay can be memoized)
        fwd = jax.jit(lambda p, z, t: unet.apply({"params": p}, z, t))
        zb = jnp.zeros((B, LATENT_LEN, LATENT_CH), dtype)
        tb = jnp.full((B,), 500, jnp.int32)
        cost = fwd.lower(unet_params, zb, tb).compile().cost_analysis()
        flops = cost.get("flops", float("nan"))
        inputs = [jax.random.normal(jax.random.fold_in(rng, 1000 + i),
                                    zb.shape, dtype) for i in range(21)]
        out = fwd(unet_params, inputs[-1], tb)
        out.block_until_ready()
        t0 = time.perf_counter()
        for i in range(20):
            out = fwd(unet_params, inputs[i], tb)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        results[f"unet_fwd_b64_{label}"] = {
            "ms": round(dt * 1e3, 3), "gflops": round(flops / 1e9, 1),
            "tflops_per_s": round(flops / dt / 1e12, 1)}
        print(json.dumps({label: results[f"unet_fwd_b64_{label}"]}),
              flush=True)

        # full sampler (200-step scan + decode + crop)
        sampler = make_ldm_sampler(unet, ae, sched, LATENT_LEN, LATENT_CH,
                                   STEPS)
        seeds = jnp.arange(B)
        out = sampler(unet_params, ae_params, sf,
                      jax.random.fold_in(rng, 999), seeds)
        out.block_until_ready()
        t0 = time.perf_counter()
        n = 3
        for i in range(n):
            out = sampler(unet_params, ae_params, sf,
                          jax.random.fold_in(rng, i), seeds)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        results[f"full_b64_{label}"] = {
            "sec": round(dt, 3), "windows_per_sec": round(B / dt, 2)}
        print(json.dumps({label: results[f"full_b64_{label}"]}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
