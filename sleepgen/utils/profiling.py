"""Tracing / profiling — the rebuild of SURVEY.md §5's observability gap.

The reference's only instrumentation is a pynvml memory print
(``src/util.py:56-63``) and a thop FLOP hook (``src/models/unet.py:77-94``).
Here: a jax.profiler trace context, a step timer with proper
block_until_ready semantics, analytic FLOP counts via XLA cost analysis,
device-memory stats, and a NaN-debug toggle for the fragile spectral loss.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_of(fn: Callable, *args, **kwargs) -> Optional[float]:
    """Analytic FLOP count from XLA's cost analysis of the jitted fn."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(cost.get("flops")) if cost and "flops" in cost else None


def time_step(fn: Callable, *args, iters: int = 10, warmup: int = 2,
              **kwargs) -> Dict[str, float]:
    """Wall-clock a jitted step (dispatch-pipelined, sync at the end)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"sec_per_step": dt, "steps_per_sec": 1.0 / dt}


def device_memory_report() -> Dict[str, Any]:
    """Per-device live-buffer stats (the print_gpu_memory_report analogue)."""
    report = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            report[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
                "pct": round(100 * stats.get("bytes_in_use", 0)
                             / max(stats.get("bytes_limit", 1), 1), 1),
            }
    return report


def enable_nan_debugging(enable: bool = True) -> None:
    """config.debug_nans: every jit output checked for NaN (slow; use to
    localize spectral-loss explosions, README.md:18)."""
    jax.config.update("jax_debug_nans", enable)


def _host_isa_fingerprint() -> str:
    """Short stable hash of the host CPU's identity. The persistent cache
    outlives driver sessions, which can land on machines with different
    microarchitectures — XLA:CPU AOT results embed the compile machine's
    target features and loading them elsewhere risks SIGILL (the
    cpu_aot_loader logs exactly that). Namespacing the cache dir by host
    identity gives each host population its own cache.

    The hash covers vendor/family/model/stepping *in addition to* the
    flag set: XLA:CPU derives tuning features from the CPU *model*, not
    just its flags (e.g. ``prefer-no-gather``/``prefer-no-scatter`` on
    gather-slow Intel models), so two hosts with identical cpuinfo flags
    but different models write mutually unloadable AOT results — observed
    live as every cache load failing with "Machine type used for XLA:CPU
    compilation doesn't match the machine type for execution"."""
    import hashlib
    import platform

    keys = ("vendor_id", "cpu family", "model", "model name", "stepping",
            "flags")
    ident = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                k, _, v = line.partition(":")
                if k.strip() in keys:
                    ident.append(f"{k.strip()}={' '.join(sorted(v.split()))}")
                if line.strip() == "" and len(ident) > 1:
                    break  # first core only; all cores are identical
    except OSError:
        pass
    return hashlib.sha256("|".join(ident).encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache — cuts cold-start compiles for the
    big graphs (200-step sampler scan, fused G/D step) across processes."""
    import os

    if cache_dir is None:
        cache_dir = os.path.expanduser(
            f"~/.cache/sleepgen/jax_cache_{_host_isa_fingerprint()}")
        # NO migration from older/other fingerprint dirs: fingerprinted
        # dirs keep genuinely-foreign AOT artifacts (real SIGILL risk)
        # from traveling between host populations; a new host identity
        # pays one cold recompile.
        #
        # Do NOT chase the cpu_aot_loader.cc:210 "machine type doesn't
        # match" error spam as cache poisoning: on this jaxlib (0.9.0)
        # BOTH feature lists in that message are derived live at load
        # time — the compile list from LLVM's tuned target config (which
        # appends model-tuning features like +prefer-no-gather/-scatter)
        # and the host list from CPUID detection (which never contains
        # tuning features) — so every load of a scatter/gather-bearing
        # executable logs it, on entries THIS host wrote seconds ago.
        # Measured: the load still proceeds and the cache works (mini
        # sampler workload: 38 s uncached vs 17-25 s warm); patching the
        # feature strings inside entries changes nothing because the
        # entry contents are not what is compared.
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def tpu_contact(enable_cache: bool = True) -> None:
    """Standard preamble for long device jobs: persistent compile cache,
    one eager trivial jit as the first device contact, and the
    ``TPU_CONTACT_OK`` marker line that scripts/run_with_tpu_retry.sh
    watches for (the exact string is load-bearing — keep every entry
    point on this helper instead of inlining it)."""
    import jax.numpy as jnp

    if enable_cache:
        enable_compilation_cache()
    jax.jit(lambda: jnp.zeros(()))().block_until_ready()
    print("TPU_CONTACT_OK", flush=True)


def maybe_initialize_multihost() -> None:
    """jax.distributed.initialize when SLEEPGEN_MULTIHOST=1 — the multi-host
    entry used by scripts/launch_multihost.sh (TPU pods auto-discover the
    coordinator)."""
    import os

    if os.environ.get("SLEEPGEN_MULTIHOST") == "1":
        from sleepgen.parallel import initialize_distributed

        initialize_distributed()
