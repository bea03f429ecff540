"""DiffusionInferer parity tests."""
import jax
import jax.numpy as jnp
import numpy as np

from sleepgen.diffusion import NoiseSchedule
from sleepgen.diffusion.inferer import inferer_call, inferer_sample


def test_inferer_call_is_noise_then_predict():
    sched = NoiseSchedule.create("linear_beta", 100, 0.0015, 0.0195)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 16, 1)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(2, 16, 1)).astype(np.float32))
    t = jnp.asarray([3, 97])

    seen = {}

    def model_fn(x, tt):
        seen["x"] = x
        return x * 2.0

    out = inferer_call(sched, model_fn, x0, noise, t)
    want_noisy = sched.add_noise(x0, noise, t)
    np.testing.assert_allclose(np.asarray(seen["x"]), np.asarray(want_noisy))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_noisy) * 2.0)


def test_inferer_sample_runs_full_chain():
    sched = NoiseSchedule.create("linear_beta", 50, 0.0015, 0.0195)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 1))
    out = inferer_sample(sched, lambda x, t: jnp.zeros_like(x), x_T,
                         jax.random.PRNGKey(1))
    assert out.shape == x_T.shape
    assert np.all(np.isfinite(np.asarray(out)))
