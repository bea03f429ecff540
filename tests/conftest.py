"""Test config: run on CPU with 8 virtual devices so the data-parallel
mesh/psum path is exercised without TPU hardware (SURVEY.md §4).

Note: this image's sitecustomize imports jax at interpreter start (to
register the axon TPU plugin), so env vars alone are too late — we must
update jax.config directly.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache (same dir the CLIs use): the suite's cost
# is dominated by CPU compiles of the same train/eval/sampler graphs on
# every invocation — cached, a repeat run of the heaviest e2e test drops
# ~4x. First run after a jaxlib change still pays full compiles.
from sleepgen.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
# Tests re-pay many 0.3-1 s CPU compiles every run (the production
# threshold of 1 s is tuned for TPU graphs); persist them too.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow (compile-heavy e2e) tests by default so the
    day-to-day suite stays fast. Run everything with RUN_SLOW=1, or just
    the slow set with -m slow."""
    if os.environ.get("RUN_SLOW") or config.option.markexpr:
        return
    skip = pytest.mark.skip(reason="slow e2e: set RUN_SLOW=1 (or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
