"""Scheduler parity tests against independently-written closed-form math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleepgen.diffusion import (
    NoiseSchedule,
    ddim_step,
    ddim_timesteps,
    ddpm_step,
    make_betas,
)


def test_beta_tables_closed_form():
    T = 1000
    lin = make_betas("linear_beta", T, 0.0015, 0.0195)
    np.testing.assert_allclose(lin, np.linspace(0.0015, 0.0195, T))
    sc = make_betas("scaled_linear_beta", T, 0.0015, 0.0205)
    np.testing.assert_allclose(
        sc, np.linspace(0.0015**0.5, 0.0205**0.5, T) ** 2
    )
    cos = make_betas("cosine", T)
    assert cos.min() >= 0 and cos.max() <= 0.999
    sq = make_betas("sqrt", T, 1e-4, 2e-2)
    np.testing.assert_allclose(sq, np.linspace(1e-4, 2e-2, T) ** 0.5)


def test_add_noise_and_velocity():
    sched = NoiseSchedule.create("linear_beta", 1000, 0.0015, 0.0195)
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 16, 1)).astype(np.float32)
    eps = rng.normal(size=(4, 16, 1)).astype(np.float32)
    t = np.array([0, 1, 500, 999])

    acp = np.cumprod(1 - np.linspace(0.0015, 0.0195, 1000))
    sa = np.sqrt(acp[t])[:, None, None]
    sb = np.sqrt(1 - acp[t])[:, None, None]

    got = sched.add_noise(jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(got), sa * x0 + sb * eps, rtol=2e-5, atol=1e-6)

    v = sched.velocity(jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(v), sa * eps - sb * x0, rtol=2e-5, atol=1e-6)


def test_ddim_timesteps_monai_parity():
    ts = ddim_timesteps(1000, 200)
    assert ts.shape == (200,)
    assert ts[0] == 995 and ts[-1] == 0
    assert np.all(np.diff(ts) == -5)


def _numpy_ddim_step(acp, model_out, t, t_prev, x_t, prediction_type):
    """Hand-written MONAI DDIMScheduler.step math (eta=0, no clip)."""
    a_t = acp[t]
    a_prev = acp[t_prev] if t_prev >= 0 else 1.0
    b_t = 1 - a_t
    if prediction_type == "epsilon":
        x0 = (x_t - b_t**0.5 * model_out) / a_t**0.5
        eps = model_out
    else:  # v_prediction
        x0 = a_t**0.5 * x_t - b_t**0.5 * model_out
        eps = a_t**0.5 * model_out + b_t**0.5 * x_t
    direction = (1 - a_prev) ** 0.5 * eps
    return a_prev**0.5 * x0 + direction, x0


@pytest.mark.parametrize("pred_type", ["epsilon", "v_prediction"])
def test_ddim_step_matches_reference_math(pred_type):
    sched = NoiseSchedule.create(
        "scaled_linear_beta", 1000, 0.0015, 0.0205, prediction_type=pred_type
    )
    acp = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    rng = np.random.default_rng(1)
    x_t = rng.normal(size=(2, 8, 1)).astype(np.float32)
    out = rng.normal(size=(2, 8, 1)).astype(np.float32)

    for t, t_prev in [(995, 990), (5, 0), (0, -5)]:
        got, got_x0 = ddim_step(
            sched, jnp.asarray(out), jnp.asarray(t), jnp.asarray(t_prev), jnp.asarray(x_t)
        )
        want, want_x0 = _numpy_ddim_step(acp, out, t, t_prev, x_t, pred_type)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_x0), want_x0, rtol=1e-4, atol=1e-5)


def test_ddim_exact_recovery():
    """If the model returns the exact eps used to noise x0, a single DDIM
    step from t to -1 recovers x0 exactly."""
    sched = NoiseSchedule.create("scaled_linear_beta", 1000, 0.0015, 0.0205)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(3, 32, 2)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(3, 32, 2)).astype(np.float32))
    t = jnp.asarray(400)
    x_t = sched.add_noise(x0, eps, t)
    x_rec, pred_x0 = ddim_step(sched, eps, t, jnp.asarray(-1), x_t)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x0), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_ddpm_step_matches_reference_math():
    sched = NoiseSchedule.create("linear_beta", 1000, 0.0015, 0.0195)
    betas = np.linspace(0.0015, 0.0195, 1000)
    acp = np.cumprod(1 - betas)
    rng = np.random.default_rng(3)
    x_t = rng.normal(size=(2, 8, 1)).astype(np.float32)
    eps_hat = rng.normal(size=(2, 8, 1)).astype(np.float32)
    noise = rng.normal(size=(2, 8, 1)).astype(np.float32)

    for t in [999, 1, 0]:
        got, _ = ddpm_step(
            sched,
            jnp.asarray(eps_hat),
            jnp.asarray(t),
            jnp.asarray(x_t),
            jnp.asarray(noise),
            clip_sample=True,
        )
        a_t, b_t = acp[t], betas[t]
        a_prev = acp[t - 1] if t > 0 else 1.0
        x0 = (x_t - (1 - a_t) ** 0.5 * eps_hat) / a_t**0.5
        x0 = np.clip(x0, -1, 1)
        coef1 = a_prev**0.5 * b_t / (1 - a_t)
        coef2 = (1 - b_t) ** 0.5 * (1 - a_prev) / (1 - a_t)
        mean = coef1 * x0 + coef2 * x_t
        var = max(b_t * (1 - a_prev) / (1 - a_t), 1e-20)
        want = mean + (var**0.5 * noise if t > 0 else 0)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_schedule_is_jit_and_scan_friendly():
    sched = NoiseSchedule.create("scaled_linear_beta", 1000, 0.0015, 0.0205,
                                 prediction_type="v_prediction")
    ts = ddim_timesteps(1000, 20)
    ts_prev = ts - (1000 // 20)

    @jax.jit
    def run(x):
        def body(x, tp):
            t, t_prev = tp
            # stand-in "model": predict zeros
            x, _ = ddim_step(sched, jnp.zeros_like(x), t, t_prev, x)
            return x, None

        x, _ = jax.lax.scan(body, x, (jnp.asarray(ts), jnp.asarray(ts_prev)))
        return x

    out = run(jnp.ones((2, 16, 1)))
    assert out.shape == (2, 16, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dm_sampling_schedule_table_length_semantics():
    """Reference quirk (src/sample_trials_ddpm.py:40,83-92): the DM sampler
    flag sets the scheduler's num_train_timesteps (beta-table length), with
    the DDIM loop fixed at 200 steps. Default 1000 == the LDM sampling
    table; 200 gives a ratio-1 trajectory with a much larger terminal
    alpha_cumprod."""
    from sleepgen.cli.sample_trials_ddpm import dm_sampling_schedule
    from sleepgen.config import Config
    from sleepgen.sample.sample_ldm import sampling_schedule

    cfg = Config()
    full = dm_sampling_schedule(cfg, 1000)
    assert full.alphas_cumprod.shape[0] == 1000
    np.testing.assert_allclose(
        np.asarray(full.alphas_cumprod),
        np.asarray(sampling_schedule(cfg).alphas_cumprod))

    short = dm_sampling_schedule(cfg, 200)
    assert short.alphas_cumprod.shape[0] == 200
    # ratio-1 stepping touches every entry
    np.testing.assert_array_equal(ddim_timesteps(200, 200),
                                  np.arange(199, -1, -1))
    # terminal noise level differs by orders of magnitude — the quirk is real
    assert float(short.alphas_cumprod[-1]) > 0.05
    assert float(full.alphas_cumprod[-1]) < 1e-4
