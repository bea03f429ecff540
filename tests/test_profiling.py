"""Profiling utility tests."""
import jax
import jax.numpy as jnp
import numpy as np

from sleepgen.utils.profiling import device_memory_report, flops_of, time_step


def test_flops_of_matmul():
    a = jnp.zeros((64, 128))
    b = jnp.zeros((128, 32))
    f = flops_of(lambda x, y: x @ y, a, b)
    if f is not None:  # some backends omit cost analysis
        assert abs(f - 2 * 64 * 128 * 32) / (2 * 64 * 128 * 32) < 0.5


def test_time_step_reports_rates():
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((128, 128))
    stats = time_step(f, x, iters=5, warmup=1)
    assert stats["sec_per_step"] > 0
    assert np.isclose(stats["steps_per_sec"], 1.0 / stats["sec_per_step"])


def test_device_memory_report_shape():
    rep = device_memory_report()
    assert isinstance(rep, dict)
