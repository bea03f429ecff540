"""Perf investigation: where does DDIM-200 sampling time go?

Measures (a) the full parity sampler (200-step scan + AEKL decode + crop)
across batch sizes, (b) the UNet-scan alone, (c) one UNet forward, to
locate headroom vs the v5e bf16 peak (~197 TFLOP/s).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from sleepgen.config import Config
from sleepgen.sample.sample_ldm import make_ldm_sampler, sampling_schedule
from sleepgen.sample.samplers import ddim_sample_loop, seed_noise
from sleepgen.train.train_aekl import build_models
from sleepgen.train.train_ldm import build_unet

STEPS = 200
LATENT_LEN = 768
LATENT_CH = 1


def timeit(fn, *args, n=4, key=None):
    out = fn(*args) if key is None else fn(*args, jax.random.fold_in(key, 999))
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args) if key is None else fn(*args, jax.random.fold_in(key, i))
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / n


def main():
    cfg = Config()
    cfg.aekl.num_channels = [32, 32, 64]
    cfg.aekl.latent_channels = LATENT_CH
    cfg.unet.image_size = LATENT_LEN
    cfg.diffusion.num_inference_steps = STEPS

    dtype = jnp.bfloat16
    ae, _ = build_models(cfg, dtype)
    # default sampling configuration (config.fast_sampling_math)
    unet = build_unet(cfg, LATENT_CH, LATENT_CH, dtype).clone(fast_math=True)
    sched = sampling_schedule(cfg)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, LATENT_LEN * 4, 1), dtype)
    ae_params = ae.init({"params": rng}, x, rng)["params"]
    z0 = jnp.zeros((2, LATENT_LEN, LATENT_CH), dtype)
    unet_params = unet.init(rng, z0, jnp.zeros((2,), jnp.int32))["params"]
    sf = jnp.float32(1.0)

    results = {}

    # (c) single UNet forward FLOPs + time at batch 64
    B = 64
    fwd = jax.jit(lambda p, z, t: unet.apply({"params": p}, z, t))
    zb = jnp.zeros((B, LATENT_LEN, LATENT_CH), dtype)
    tb = jnp.full((B,), 500, jnp.int32)
    lowered = fwd.lower(unet_params, zb, tb)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan"))
    # vary the input per iteration — identical args through the relay can
    # be memoized and report impossibly fast times (BASELINE.md caveat).
    # Inputs are pregenerated so the timed region is ONLY the UNet forward.
    inputs = [jax.random.normal(jax.random.fold_in(rng, 1000 + i),
                                zb.shape, dtype) for i in range(21)]
    out = fwd(unet_params, inputs[-1], tb)
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(20):
        out = fwd(unet_params, inputs[i], tb)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 20
    results["unet_fwd_b64"] = {"sec": dt, "gflops": flops / 1e9,
                               "tflops_per_s": flops / dt / 1e12}

    # (b) UNet scan only (no decode)
    @jax.jit
    def scan_only(p, base_key, seeds):
        x_T = seed_noise(base_key, seeds, (LATENT_LEN, LATENT_CH))
        return ddim_sample_loop(
            lambda z, t: unet.apply({"params": p}, z, t), sched, x_T, STEPS)

    seeds = jnp.arange(B)
    dt = timeit(lambda p, s: scan_only(p, s, seeds), unet_params, n=4, key=rng)
    results["scan_only_b64"] = {"sec": dt, "windows_per_sec": B / dt}

    # (a) full sampler across batches
    for batch in (32, 64, 96, 128):
        seeds = jnp.arange(batch)
        sampler = make_ldm_sampler(unet, ae, sched, LATENT_LEN, LATENT_CH, STEPS)
        dt = timeit(lambda p, k: sampler(p, ae_params, sf, k, seeds),
                    unet_params, n=4, key=rng)
        results[f"full_b{batch}"] = {"sec": dt, "windows_per_sec": batch / dt}

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
