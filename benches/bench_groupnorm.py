"""GroupNorm(+SiLU) on v5e: XLA fusion vs one-pass Pallas vs L-tiled
two-pass Pallas (VERDICT r1 item 8). Shapes = the AE's G=1 stage and the
UNet's G=32 stage, plus a long-window case where O(L*C) VMEM residency of
the one-pass kernel stops fitting comfortably."""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from sleepgen.pallas_kernels.group_norm import (
    fused_group_norm_silu, group_norm_silu_tiled, group_norm_silu_reference)


def timeit(fn, *args, n=50):
    out = fn(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    from sleepgen.utils.profiling import tpu_contact

    tpu_contact(enable_cache=False)  # measuring runtimes, keep compiles honest
    results = {}
    for (b, l, c, g) in [(256, 3072, 32, 1), (256, 768, 128, 32),
                         (16, 49152, 32, 1)]:
        key = f"b{b}_l{l}_c{c}_g{g}"
        x = jax.random.normal(jax.random.PRNGKey(0), (b, l, c), jnp.bfloat16)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)

        xla = jax.jit(lambda x: group_norm_silu_reference(x, scale, bias, g))
        one = jax.jit(lambda x: fused_group_norm_silu(x, scale, bias, g))
        til = jax.jit(lambda x: group_norm_silu_tiled(x, scale, bias, g))
        res = {}
        for name, fn in [("xla_ms", xla), ("pallas_onepass_ms", one),
                         ("pallas_tiled_ms", til)]:
            try:
                res[name] = timeit(fn, x) * 1e3
            except Exception as e:  # e.g. one-pass VMEM OOM at long windows
                res[name] = f"FAILED: {str(e).splitlines()[0][:120]}"
        results[key] = res
        print(key, results[key], flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
