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
