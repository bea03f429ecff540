"""DPM++2M-20 ceiling diagnosis (round-3, VERDICT r2 weak #2).

Round 1/2 reported 453 windows/s at batch 256 and called the path "bound
elsewhere at large batch" without evidence. Hypothesis to test: there is
no DPM-specific ceiling at all — the UNet scan itself is less efficient
per window-step at batch 256 than at 64 (round-1 DDIM sweep: 52.6 w/s@64
vs 44.6@256, same per-call efficiency as 453 w/s * 20 steps), and the
20-step path simply amortizes per-batch fixed costs (decode, noise,
dispatch) over 10x fewer steps.

Measures, per batch in {64, 128, 256, 512}:
  dpm_full       20-step DPM++2M + AEKL decode + crop (the real path)
  dpm_scan_only  20-step DPM++2M scan, no decode
  ddim20_full    20-step DDIM + decode (solver-overhead control)
and derives window-steps/s (batch * steps / sec) so all rows are
comparable with the DDIM-200 numbers (57 w/s @64 = 11400 window-steps/s).

Usage: python benches/ablate_dpm.py [--batches 64,128,256,512]
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
from sleepgen.diffusion.dpm_solver import dpm_solver_pp_2m_sample_loop
from sleepgen.sample.sample_ldm import make_ldm_sampler, sampling_schedule
from sleepgen.sample.samplers import ddim_sample_loop, seed_noise
from sleepgen.train.train_aekl import build_models
from sleepgen.train.train_ldm import build_unet

LATENT_LEN = 768
LATENT_CH = 1
STEPS = 20


def timeit(fn, key, n=6):
    out = fn(jax.random.fold_in(key, 999))
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(jax.random.fold_in(key, i))
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="64,128,256,512")
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from sleepgen.utils.profiling import tpu_contact

    tpu_contact()

    cfg = Config()
    cfg.aekl.num_channels = [32, 32, 64]
    cfg.aekl.latent_channels = LATENT_CH
    cfg.unet.image_size = LATENT_LEN

    dtype = jnp.bfloat16
    ae, _ = build_models(cfg, dtype)
    unet = build_unet(cfg, LATENT_CH, LATENT_CH, dtype).clone(fast_math=True)
    sched = sampling_schedule(cfg)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, LATENT_LEN * 4, 1), dtype)
    ae_params = ae.init({"params": rng}, x, rng)["params"]
    z0 = jnp.zeros((2, LATENT_LEN, LATENT_CH), dtype)
    unet_params = unet.init(rng, z0, jnp.zeros((2,), jnp.int32))["params"]
    sf = jnp.float32(1.0)

    def emit(name, b, steps, dt):
        print(json.dumps({
            "variant": name, "batch": b, "steps": steps,
            "windows_per_sec": round(b / dt, 1),
            "window_steps_per_sec": round(b * steps / dt, 0),
            "sec_per_batch": round(dt, 4)}), flush=True)

    for b in batches:
        seeds = jnp.arange(b)

        dpm = make_ldm_sampler(unet, ae, sched, LATENT_LEN, LATENT_CH, STEPS,
                               sampler="dpm++2m")
        dt = timeit(lambda k: dpm(unet_params, ae_params, sf, k, seeds), rng)
        emit("dpm_full", b, STEPS, dt)

        @jax.jit
        def scan_only(base_key, seeds=seeds):
            x_T = seed_noise(base_key, seeds, (LATENT_LEN, LATENT_CH))
            return dpm_solver_pp_2m_sample_loop(
                lambda z, t: unet.apply({"params": unet_params}, z, t),
                sched, x_T, STEPS)

        dt = timeit(scan_only, rng)
        emit("dpm_scan_only", b, STEPS, dt)

        ddim20 = make_ldm_sampler(unet, ae, sched, LATENT_LEN, LATENT_CH,
                                  STEPS, sampler="ddim")
        dt = timeit(lambda k: ddim20(unet_params, ae_params, sf, k, seeds), rng)
        emit("ddim20_full", b, STEPS, dt)


if __name__ == "__main__":
    main()
