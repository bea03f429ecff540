"""Ablation bench: what does each UNet component cost inside the DDIM scan?

Bench-only module swaps (proper nn.Module subclasses, params re-initialized
per variant — throughput does not depend on weight values) isolate the cost
of GroupNorm fp32 casts, attention blocks, and scan unrolling, to direct
optimization work at the real bottleneck.
"""
from __future__ import annotations

import contextlib
import json
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

import sleepgen.nn.layers as layers
import sleepgen.nn.unet1d as unet1d_mod
from sleepgen.config import Config
from sleepgen.diffusion import ddim_step, ddim_timesteps
from sleepgen.sample.sample_ldm import sampling_schedule
from sleepgen.sample.samplers import seed_noise
from sleepgen.train.train_ldm import build_unet

STEPS = 200
LATENT_LEN = 768
B = 64


class GNbf16(layers.GroupNorm32):
    """GroupNorm with stats in the compute dtype (no fp32 casts)."""

    @nn.compact
    def __call__(self, x):
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon,
                         dtype=x.dtype, param_dtype=jnp.float32)(x)
        return nn.silu(y) if self.fuse_silu else y


class GNIdentity(layers.GroupNorm32):
    """Upper bound of any GroupNorm optimization (keeps a dummy affine)."""

    @nn.compact
    def __call__(self, x):
        layers._GNParams(x.shape[-1], name="GroupNorm_0")()
        return x


class AttnIdentity(layers.AttentionBlock1d):
    """Attention block replaced by a parameterless passthrough — params are
    re-initialized per variant in measure(), so the tree need not match."""

    @nn.compact
    def __call__(self, x):
        return x


@contextlib.contextmanager
def swapped(gn=None, attn=None):
    orig_gn, orig_attn = layers.GroupNorm32, layers.AttentionBlock1d
    try:
        if gn is not None:
            layers.GroupNorm32 = gn
            unet1d_mod.GroupNorm32 = gn
        if attn is not None:
            layers.AttentionBlock1d = attn
            unet1d_mod.AttentionBlock1d = attn
        yield
    finally:
        layers.GroupNorm32 = orig_gn
        unet1d_mod.GroupNorm32 = orig_gn
        layers.AttentionBlock1d = orig_attn
        unet1d_mod.AttentionBlock1d = orig_attn


def scan_sampler(unet, sched, unroll=1):
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


def measure(cfg, sched, rng, unroll=1, gn=None, attn=None, n=4):
    with swapped(gn=gn, attn=attn):
        unet = build_unet(cfg, 1, 1, jnp.bfloat16)
        z0 = jnp.zeros((2, LATENT_LEN, 1), jnp.bfloat16)
        params = unet.init(rng, z0, jnp.zeros((2,), jnp.int32))["params"]
        fn = scan_sampler(unet, sched, unroll)
        seeds = jnp.arange(B)
        out = fn(params, jax.random.fold_in(rng, 999), seeds)
        out.block_until_ready()
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(params, jax.random.fold_in(rng, i), seeds)
        out.block_until_ready()
        return B * n / (time.perf_counter() - t0)


def main():
    cfg = Config()
    cfg.unet.image_size = LATENT_LEN
    sched = sampling_schedule(cfg)
    rng = jax.random.PRNGKey(0)

    results = {}
    for key, kw in [
        ("baseline", {}),
        ("unroll2", {"unroll": 2}),
        ("unroll4", {"unroll": 4}),
        ("gn_bf16", {"gn": GNbf16}),
        ("gn_identity", {"gn": GNIdentity}),
        ("attn_identity", {"attn": AttnIdentity}),
    ]:
        results[key] = measure(cfg, sched, rng, **kw)
        print(key, results[key], flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
