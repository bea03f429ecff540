"""Int8 quantized DDIM-200 sampler throughput vs bf16 (v5e).

Same parity workload as bench.py (200-step DDIM + AEKL decode + crop);
the UNet convs run int8 (sleepgen.nn.quant). Quality is gated separately
by the FID harness (scripts/demo_synthetic_e2e.py --quant).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from sleepgen.config import Config
from sleepgen.nn.quant import quantize_unet_params
from sleepgen.sample.sample_ldm import make_ldm_sampler, sampling_schedule
from sleepgen.train.train_aekl import build_models
from sleepgen.train.train_ldm import build_unet

STEPS = 200
LATENT_LEN = 768
B = 64


def bench(sampler, unet_params, ae_params, rng, n=4):
    sf = jnp.float32(1.0)
    seeds = jnp.arange(B)
    out = sampler(unet_params, ae_params, sf, jax.random.fold_in(rng, 99), seeds)
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(n):
        out = sampler(unet_params, ae_params, sf, jax.random.fold_in(rng, i), seeds)
    out.block_until_ready()
    return B * n / (time.perf_counter() - t0)


def main():
    cfg = Config()
    cfg.aekl.num_channels = [32, 32, 64]
    cfg.unet.image_size = LATENT_LEN
    dtype = jnp.bfloat16
    ae, _ = build_models(cfg, dtype)
    sched = sampling_schedule(cfg)
    rng = jax.random.PRNGKey(0)

    x = jnp.zeros((2, LATENT_LEN * 4, 1), dtype)
    ae_params = ae.init({"params": rng}, x, rng)["params"]

    unet = build_unet(cfg, 1, 1, dtype)
    z0 = jnp.zeros((2, LATENT_LEN, 1), dtype)
    params = unet.init(rng, z0, jnp.zeros((2,), jnp.int32))["params"]

    results = {}
    sampler = make_ldm_sampler(unet, ae, sched, LATENT_LEN, 1, STEPS)
    results["bf16_windows_per_sec"] = bench(sampler, params, ae_params, rng)
    print("bf16:", results["bf16_windows_per_sec"], flush=True)

    qunet = unet.clone(quantized=True)
    qparams = quantize_unet_params(params)
    qsampler = make_ldm_sampler(qunet, ae, sched, LATENT_LEN, 1, STEPS)
    results["int8_windows_per_sec"] = bench(qsampler, qparams, ae_params, rng)
    print("int8:", results["int8_windows_per_sec"], flush=True)

    results["speedup"] = (results["int8_windows_per_sec"]
                          / results["bf16_windows_per_sec"])
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
