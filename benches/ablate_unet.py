"""Ablation bench: what does each UNet component cost inside the DDIM scan?

Monkeypatches (bench-only, never in the library) isolate the cost of
GroupNorm fp32 casts, attention blocks, the time-embedding MLP, and scan
unrolling, to direct optimization work at the real bottleneck.
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

import sleepgen.nn.layers as layers
import sleepgen.sample.samplers as samplers
from sleepgen.config import Config
from sleepgen.diffusion import ddim_step, ddim_timesteps
from sleepgen.sample.sample_ldm import sampling_schedule
from sleepgen.sample.samplers import seed_noise
from sleepgen.train.train_ldm import build_unet

STEPS = 200
LATENT_LEN = 768
B = 64


def measure(make_fn, unet_params, rng, n=4):
    seeds = jnp.arange(B)
    fn = make_fn()
    out = fn(unet_params, jax.random.fold_in(rng, 999), seeds)
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(unet_params, jax.random.fold_in(rng, i), seeds)
    out.block_until_ready()
    return B * n / (time.perf_counter() - t0)


def main():
    cfg = Config()
    cfg.unet.image_size = LATENT_LEN
    dtype = jnp.bfloat16
    sched = sampling_schedule(cfg)
    rng = jax.random.PRNGKey(0)

    def scan_sampler(unet, unroll=1):
        @jax.jit
        def sample(params, base_key, seeds):
            x_T = seed_noise(base_key, seeds, (LATENT_LEN, 1))
            ts = jnp.asarray(ddim_timesteps(sched.num_timesteps, STEPS))
            ts_prev = ts - sched.num_timesteps // STEPS

            def body(x, tp):
                t, t_prev = tp
                t_b = jnp.full((x.shape[0],), t, jnp.int32)
                out = unet.apply({"params": params}, x, t_b)
                x, _ = ddim_step(sched, out.astype(jnp.float32), t, t_prev, x)
                return x, None

            x, _ = jax.lax.scan(body, x_T, (ts, ts_prev), unroll=unroll)
            return x

        return sample

    results = {}
    unet = build_unet(cfg, 1, 1, dtype)
    z0 = jnp.zeros((2, LATENT_LEN, 1), dtype)
    params = unet.init(rng, z0, jnp.zeros((2,), jnp.int32))["params"]

    results["baseline"] = measure(lambda: scan_sampler(unet), params, rng)
    print("baseline", results["baseline"], flush=True)

    results["unroll2"] = measure(lambda: scan_sampler(unet, unroll=2), params, rng)
    print("unroll2", results["unroll2"], flush=True)

    # -- GN in bf16 (skip fp32 cast; keeps stats in bf16) ------------------
    orig_gn = layers.GroupNorm32.__call__

    def gn_bf16(self, x):
        y = layers.nn.GroupNorm(num_groups=self.num_groups,
                                epsilon=self.epsilon,
                                dtype=x.dtype, param_dtype=jnp.float32)(x)
        return layers.nn.silu(y) if self.fuse_silu else y

    layers.GroupNorm32.__call__ = gn_bf16
    results["gn_bf16"] = measure(lambda: scan_sampler(unet), params, rng)
    layers.GroupNorm32.__call__ = orig_gn
    print("gn_bf16", results["gn_bf16"], flush=True)

    # -- GN identity (upper bound of any GN optimization) ------------------
    def gn_identity(self, x):
        # keep the params so the tree matches
        layers._GNParams(x.shape[-1], name="GroupNorm_0")()
        return x

    has_gnparams = hasattr(layers, "_GNParams")
    if has_gnparams:
        layers.GroupNorm32.__call__ = gn_identity
        results["gn_identity"] = measure(lambda: scan_sampler(unet), params, rng)
        layers.GroupNorm32.__call__ = orig_gn
        print("gn_identity", results["gn_identity"], flush=True)

    # -- attention identity -------------------------------------------------
    orig_attn = layers.AttentionBlock1d.__call__

    def attn_identity(self, x):
        layers.GroupNorm32(self.num_groups)(x)
        layers.SelfAttention1d(num_heads=self.num_heads, dtype=self.dtype)(x)
        return x

    layers.AttentionBlock1d.__call__ = attn_identity
    results["attn_identity"] = measure(lambda: scan_sampler(unet), params, rng)
    layers.AttentionBlock1d.__call__ = orig_attn
    print("attn_identity", results["attn_identity"], flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
