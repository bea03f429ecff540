"""Long-window (beyond-parity) capability: signal-space diffusion sampling
at 4x the reference's fixed 3072-sample window, with and without blockwise
attention (config.unet.kv_block_size — SURVEY.md §5 long-context stretch).

At window 12288 the UNet's attention length is 3072 tokens; full softmax
materializes a (B, 3072, 3072) fp32 logits tensor per block, blockwise
streams KV in fixed tiles with an online softmax.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benches/long_window.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from sleepgen.config import Config
from sleepgen.sample.samplers import ddim_sample_loop, seed_noise
from sleepgen.train.train_ldm import build_unet
from sleepgen.utils.profiling import tpu_contact

WINDOW = 12288
STEPS = 50
B = 16


def main():
    tpu_contact()

    cfg = Config()
    cfg.unet.image_size = WINDOW
    sched_cfg = cfg.diffusion
    from sleepgen.diffusion import NoiseSchedule
    sched = NoiseSchedule.create(
        sched_cfg.sample_schedule, sched_cfg.timesteps,
        sched_cfg.sample_beta_start, sched_cfg.sample_beta_end,
        prediction_type=sched_cfg.sample_prediction_type)

    rng = jax.random.PRNGKey(0)
    results = {}
    for kv_block in (0, 512):
        cfg.unet.kv_block_size = kv_block
        unet = build_unet(cfg, 1, 1, jnp.bfloat16).clone(fast_math=True)
        z0 = jnp.zeros((2, WINDOW, 1), jnp.bfloat16)
        params = unet.init(rng, z0, jnp.zeros((2,), jnp.int32))["params"]

        @jax.jit
        def sample(p, base_key, seeds):
            x_T = seed_noise(base_key, seeds, (WINDOW, 1))
            return ddim_sample_loop(
                lambda z, t: unet.apply({"params": p}, z, t), sched, x_T, STEPS)

        seeds = jnp.arange(B)
        t_c = time.perf_counter()
        out = sample(params, jax.random.fold_in(rng, 99), seeds)
        out.block_until_ready()
        compile_s = time.perf_counter() - t_c
        t0 = time.perf_counter()
        for i in range(3):
            out = sample(params, jax.random.fold_in(rng, i), seeds)
        out.block_until_ready()
        w = B * 3 / (time.perf_counter() - t0)
        assert jnp.isfinite(out.astype(jnp.float32)).all()
        results[f"kv_block_{kv_block}"] = {
            "windows_per_sec": w, "compile_s": compile_s}
        print(kv_block, results[f"kv_block_{kv_block}"], flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
