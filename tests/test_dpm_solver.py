"""DPM-Solver++(2M) correctness: solves the same probability-flow ODE as
DDIM, to higher order. Oracle: an analytic Gaussian-prior model, whose
posterior mean is exact, referenced against 1000-step DDIM."""
import jax
import jax.numpy as jnp
import numpy as np

from sleepgen.diffusion import NoiseSchedule
from sleepgen.diffusion.dpm_solver import dpm_solver_pp_2m_sample_loop, dpm_timesteps
from sleepgen.sample.samplers import ddim_sample_loop


def _gaussian_setup(s2=0.25):
    sched = NoiseSchedule.create("scaled_linear_beta", 1000, 0.0015, 0.0205,
                                 prediction_type="v_prediction")

    def model_fn(x, t):
        a = jnp.sqrt(sched.alphas_cumprod)[t][:, None, None]
        sg = jnp.sqrt(1 - sched.alphas_cumprod)[t][:, None, None]
        x0 = (s2 * a / (s2 * a**2 + sg**2)) * x  # exact posterior mean
        return (a * x - x0) / sg  # as v-prediction

    x_T = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 1))
    return sched, model_fn, x_T


def test_dpm_beats_ddim_by_an_order_of_steps():
    sched, model_fn, x_T = _gaussian_setup()
    ref = np.asarray(ddim_sample_loop(model_fn, sched, x_T, 1000))

    def err(a):
        a = np.asarray(a)
        return float(np.sqrt(np.mean((a - ref) ** 2)) / np.sqrt(np.mean(ref**2)))

    e_dpm10 = err(dpm_solver_pp_2m_sample_loop(model_fn, sched, x_T, 10))
    e_dpm20 = err(dpm_solver_pp_2m_sample_loop(model_fn, sched, x_T, 20))
    e_ddim20 = err(ddim_sample_loop(model_fn, sched, x_T, 20))
    e_ddim80 = err(ddim_sample_loop(model_fn, sched, x_T, 80))

    assert np.isfinite(e_dpm10) and np.isfinite(e_dpm20)
    assert e_dpm20 < 0.15 * e_ddim20  # >6x better at equal budget
    assert e_dpm10 < e_ddim80        # 10 steps beat 80 DDIM steps
    assert e_dpm20 < e_dpm10         # converging


def test_dpm_timestep_grid_properties():
    sched = NoiseSchedule.create("scaled_linear_beta", 1000, 0.0015, 0.0205)
    for n in (5, 10, 40, 100):
        ts = dpm_timesteps(sched, n)
        assert len(ts) == n
        assert ts[-1] == 0
        assert (np.diff(ts) < 0).all()
        assert 0 <= ts[0] <= 999
