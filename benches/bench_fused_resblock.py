"""Fused GN+SiLU+conv3 Pallas kernel vs XLA, at the UNet's real shapes.

CAUTION — this microbench is NOT the arbiter and its XLA column is NOT
representative: any in-one-jit repetition harness (output->input chains
or scans over independent slices alike) slows the XLA chain >10x vs its
own dispatch-pipelined floor (scan-boundary relayouts), while single
dispatches sit at the relay's ~0.12 ms floor. It is kept only to measure
the Pallas kernel's own per-op device time. The keep-or-reject verdict
comes from the end-to-end A/B (benches/ab_fused_resblock.py): XLA wins
56.9 vs 37-40 windows/s (BASELINE.md round-3).

Shapes: the diffusion UNet's three levels at the sampling batch (64) and
the training batch (256); bf16 activations/weights, fp32 stats and
accumulation in both contenders.

Usage: python benches/bench_fused_resblock.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from sleepgen.pallas_kernels.fused_resblock import (fused_gn_silu_conv3,
                                                    fused_gn_silu_conv3_tiled,
                                                    gn_silu_conv3_reference)

SHAPES = [
    # (B, L, C_in, C_out, groups)  — UNet levels, mc=128, groups=32
    (64, 768, 128, 128, 32),
    (64, 384, 256, 256, 32),
    (64, 192, 512, 512, 32),
    (256, 768, 128, 128, 32),
    (256, 192, 512, 512, 32),
]


def timeit(fn, args, n=30):
    out = fn(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    from sleepgen.utils.profiling import tpu_contact

    tpu_contact()
    rng = jax.random.PRNGKey(0)
    xla = jax.jit(gn_silu_conv3_reference, static_argnames=("num_groups",))

    for (b, l, cin, cout, g) in SHAPES:
        ks = jax.random.split(jax.random.fold_in(rng, b * l), 5)
        x = jax.random.normal(ks[0], (b, l, cin), jnp.bfloat16)
        scale = jax.random.normal(ks[1], (cin,), jnp.float32)
        bias = jax.random.normal(ks[2], (cin,), jnp.float32)
        w = jax.random.normal(ks[3], (3, cin, cout), jnp.bfloat16) * 0.1
        bb = jax.random.normal(ks[4], (cout,), jnp.float32)

        # single dispatches sit at the relay's ~0.12 ms floor at these op
        # sizes, so run REPS applications inside ONE jit and divide. Each
        # iteration reads an INDEPENDENT input slice from HBM and writes its
        # output (realistic memory behavior); feeding output back into input
        # was tried first and penalizes XLA >10x with scan-carry relayouts,
        # contradicting its own dispatch-pipelined floor — not a fair chain.
        REPS = 32
        xs = jax.random.normal(ks[0], (REPS, b, l, cin), jnp.bfloat16)

        def make_chain(op):
            @jax.jit
            def chain(xs):
                def body(_, xi):
                    return None, op(xi, scale, bias, w, bb, g)
                _, ys = jax.lax.scan(body, None, xs)
                return ys
            return chain

        chain_xla = make_chain(
            lambda xi, s, bi, wi, bbi, gi:
                gn_silu_conv3_reference(xi, s, bi, wi, bbi, num_groups=gi))
        chain_pal = make_chain(fused_gn_silu_conv3)
        chain_til = make_chain(fused_gn_silu_conv3_tiled)

        def bench(run):
            out = run(xs)
            out.block_until_ready()
            t0 = time.perf_counter()
            for i in range(4):
                out = run(xs + jnp.bfloat16(i * 1e-3))
            out.block_until_ready()
            return (time.perf_counter() - t0) / (4 * REPS)

        t_x = bench(chain_xla)
        t_p = bench(chain_pal)
        t_t = bench(chain_til)
        print(json.dumps({
            "shape": [b, l, cin, cout], "groups": g,
            "xla_in_scan_ms": round(t_x * 1e3, 4),
            "pallas_ms": round(t_p * 1e3, 4),
            "pallas_tiled_ms": round(t_t * 1e3, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
