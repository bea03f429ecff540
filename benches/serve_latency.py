"""Serving latency: SamplerService request-level p50/p95 on one v5e.

The reference has no serving story (each sample_trials.py invocation
reloads + recompiles). sleepgen's process-resident SamplerService keeps
compiled samplers per batch shape; this bench measures steady-state
request latency for the production path (DPM++2M-20, the 10x-fewer-steps
sampler) across request batch sizes, plus the DDIM-200 parity path.

Usage: python benches/serve_latency.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from sleepgen.config import Config
from sleepgen.serve import SamplerService
from sleepgen.train.train_aekl import build_models
from sleepgen.train.train_ldm import build_unet

LATENT_LEN = 768
LATENT_CH = 1
REQUESTS = 20


def build_service(sampler: str, steps: int, batch: int) -> SamplerService:
    cfg = Config()
    cfg.aekl.num_channels = [32, 32, 64]
    cfg.aekl.latent_channels = LATENT_CH
    cfg.unet.image_size = LATENT_LEN
    cfg.diffusion.sampler = sampler
    cfg.diffusion.num_inference_steps = steps

    rng = jax.random.PRNGKey(0)
    ae, _ = build_models(cfg, jnp.bfloat16)
    x = jnp.zeros((2, LATENT_LEN * 4, 1), jnp.bfloat16)
    ae_params = jax.device_get(ae.init({"params": rng}, x, rng)["params"])
    unet = build_unet(cfg, LATENT_CH, LATENT_CH, jnp.bfloat16)
    z0 = jnp.zeros((2, LATENT_LEN, LATENT_CH), jnp.bfloat16)
    unet_params = jax.device_get(
        unet.init(rng, z0, jnp.zeros((2,), jnp.int32))["params"])
    return SamplerService(cfg=cfg, aekl_cfg=cfg, unet_params=unet_params,
                          ae_params=ae_params, scale_factor=1.0,
                          batch_size=batch)


def bench_service(svc: SamplerService, label: str):
    compile_s = svc.warmup()
    lat = []
    for i in range(REQUESTS):
        # fresh base_key per request — identical args through the relay can
        # be memoized and report impossibly fast times (BASELINE.md caveat)
        key = jax.random.PRNGKey(1000 + i)
        t0 = time.perf_counter()
        svc.sample(range(svc.batch_size), base_key=key)
        lat.append(time.perf_counter() - t0)
    lat_ms = np.sort(np.asarray(lat)) * 1e3

    # pipelined request stream (cli/serve.py --pipeline): one request held
    # in flight, so the device computes request k+1 while the host drains
    # request k — the round-4 answer to the 35% request-vs-bulk gap
    t0 = time.perf_counter()
    held = None
    for i in range(REQUESTS):
        nxt = svc.sample_async(range(svc.batch_size),
                               base_key=jax.random.PRNGKey(2000 + i))
        if held is not None:
            held.result()
        held = nxt
    held.result()
    pipe_dt = time.perf_counter() - t0

    row = {
        "service": label, "batch": svc.batch_size,
        "compile_s": round(compile_s, 1),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
        "windows_per_sec": round(svc.batch_size / float(np.median(lat)), 1),
        "pipelined_windows_per_sec": round(
            REQUESTS * svc.batch_size / pipe_dt, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    from sleepgen.utils.profiling import enable_compilation_cache, tpu_contact

    enable_compilation_cache()
    tpu_contact()
    for batch in (1, 8, 32, 64):
        bench_service(build_service("dpm++2m", 20, batch), "dpm++2m-20")
    bench_service(build_service("ddim", 200, 64), "ddim-200")


if __name__ == "__main__":
    main()
