"""Mixed-precision policy tests: bf16 compute must not corrupt sampling,
and the v_prediction target path must train."""
import jax
from sleepgen.utils import jit_init
import jax.numpy as jnp
import numpy as np
import optax

from sleepgen.diffusion import NoiseSchedule
from sleepgen.nn import UNet1d
from sleepgen.sample.samplers import ddim_sample_loop, seed_noise


def _mini_unet(dtype):
    return UNet1d(in_channels=1, out_channels=1, model_channels=16,
                  channel_mult=(1, 2), attention_resolutions=(2,),
                  num_groups=8, dtype=dtype)


def test_bf16_sampler_tracks_fp32():
    """Same params, same seeds: the bf16 sampler's output must correlate
    strongly with the fp32 one (schedule math stays fp32 by design)."""
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 64, 1))
    t0 = jnp.zeros((2,), jnp.int32)
    m32 = _mini_unet(jnp.float32)
    params = jit_init(m32, rng, x0, t0)["params"]
    m16 = _mini_unet(jnp.bfloat16)

    sched = NoiseSchedule.create("scaled_linear_beta", 1000, 0.0015, 0.0205,
                                 prediction_type="v_prediction")
    seeds = jnp.arange(4)
    x_T = seed_noise(rng, seeds, (64, 1))

    def run(model):
        def fn(x, t):
            return model.apply({"params": params}, x, t)
        return np.asarray(ddim_sample_loop(fn, sched, x_T, 20))

    y32, y16 = run(m32), run(m16)
    assert np.all(np.isfinite(y16))
    # zero-init out conv means both start as pure schedule transport of the
    # same noise; with random-ish mid layers they stay close
    corr = np.corrcoef(y32.ravel(), y16.ravel())[0, 1]
    assert corr > 0.99
    np.testing.assert_allclose(y16, y32, atol=0.15)


def test_v_prediction_training_path():
    """cfg.diffusion.prediction_type='v_prediction' wires get_velocity as
    the target (training.py:432-434) and the loss decreases on a fixed
    batch."""
    from sleepgen.config import Config
    from sleepgen.train.train_dm import make_dm_train_step
    from sleepgen.train.train_ldm import DiffusionState, make_schedule

    cfg = Config()
    cfg.diffusion.prediction_type = "v_prediction"
    sched = make_schedule(cfg)
    assert sched.prediction_type == "v_prediction"

    rng = jax.random.PRNGKey(0)
    unet = _mini_unet(jnp.float32)
    params = jit_init(unet, rng, jnp.zeros((2, 64, 1)), jnp.zeros((2,), jnp.int32))["params"]
    opt = optax.adam(1e-3)
    state = DiffusionState(step=jnp.zeros((), jnp.int32), params=params,
                           opt=opt.init(params),
                           best_loss=jnp.asarray(jnp.inf, jnp.float32),
                           scale_factor=jnp.asarray(1.0, jnp.float32))
    step = make_dm_train_step(unet, sched, opt, spectral=False)
    batch = jnp.asarray(np.random.default_rng(0).random((8, 64, 1)), jnp.float32)

    losses = []
    for _ in range(30):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_ema_tracking():
    """cfg.diffusion.ema_decay > 0 maintains an EMA of UNet params that
    lags raw params toward the init."""
    from sleepgen.train.train_ldm import DiffusionState, make_schedule
    from sleepgen.train.train_dm import make_dm_train_step
    from sleepgen.train.train_ldm import make_ldm_train_step
    from sleepgen.config import Config
    from sleepgen.train.train_aekl import init_state

    cfg = Config()
    cfg.aekl.num_channels = [2, 2, 4]
    sched = make_schedule(cfg)
    rng = jax.random.PRNGKey(0)
    state_ae, ae, *_ = init_state(cfg, rng, window=256)
    unet = _mini_unet(jnp.float32)
    z0 = jnp.zeros((2, 64, 1))
    params = jit_init(unet, rng, z0, jnp.zeros((2,), jnp.int32))["params"]
    opt = optax.adam(1e-2)
    state = DiffusionState(
        step=jnp.zeros((), jnp.int32), params=params, opt=opt.init(params),
        best_loss=jnp.asarray(jnp.inf, jnp.float32),
        scale_factor=jnp.asarray(1.0, jnp.float32),
        ema_params=jax.tree_util.tree_map(jnp.copy, params))
    step = make_ldm_train_step(unet, ae, state_ae.params_g, sched, opt,
                               ema_decay=0.9)
    k = ("time_dense_1", "kernel")
    init = np.asarray(params[k[0]][k[1]]).copy()  # before donation
    batch = jnp.asarray(np.random.default_rng(0).random((4, 256, 1)), jnp.float32)
    for _ in range(5):
        state, _ = step(state, batch, jax.random.PRNGKey(1))

    # EMA must differ from raw params and sit between init and raw
    raw = np.asarray(state.params[k[0]][k[1]])
    ema = np.asarray(state.ema_params[k[0]][k[1]])
    assert not np.allclose(raw, ema)
    d_ema = np.abs(ema - init).mean()
    d_raw = np.abs(raw - init).mean()
    assert d_ema < d_raw  # EMA lags behind


def test_fast_math_sampler_tracks_strict():
    """Inference fast-math (bf16 GroupNorm compute + bf16 attention matmuls,
    fp32 stats/softmax) must share the strict bf16 path's param tree and
    track its output closely — it is the default sampling configuration
    (config.fast_sampling_math)."""
    rng = jax.random.PRNGKey(1)
    x0 = jnp.zeros((2, 64, 1))
    t0 = jnp.zeros((2,), jnp.int32)
    strict = _mini_unet(jnp.bfloat16)
    params = jit_init(strict, rng, x0, t0)["params"]
    fast = strict.clone(fast_math=True)

    # identical param trees: trained checkpoints load into either path
    fast_params = jit_init(fast, rng, x0, t0)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(fast_params)

    sched = NoiseSchedule.create("scaled_linear_beta", 1000, 0.0015, 0.0205,
                                 prediction_type="v_prediction")
    seeds = jnp.arange(4)
    x_T = seed_noise(rng, seeds, (64, 1))

    def run(model):
        def fn(x, t):
            return model.apply({"params": params}, x, t)
        return np.asarray(ddim_sample_loop(fn, sched, x_T, 20))

    y_strict, y_fast = run(strict), run(fast)
    assert np.all(np.isfinite(y_fast))
    corr = np.corrcoef(y_strict.ravel(), y_fast.ravel())[0, 1]
    assert corr > 0.99
    np.testing.assert_allclose(y_fast, y_strict, atol=0.15)


def test_fast_math_training_grads_track_strict():
    """Gradients through the fast-math UNet (bf16 GN compute + attention
    matmuls) must align with the strict-path gradients on the same params —
    the contract behind using fast-math inside the *training* step
    (benches/ablate_train.py; TPU-side quality gate in the demo runs)."""
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 64, 1))
    t0 = jnp.zeros((2,), jnp.int32)
    strict = _mini_unet(jnp.bfloat16)
    params = jit_init(strict, rng, x0, t0)["params"]
    fast = strict.clone(fast_math=True)

    sched = NoiseSchedule.create("linear_beta", 1000, 0.0015, 0.0195)
    z = jax.random.normal(jax.random.PRNGKey(1), (16, 64, 1), jnp.float32)
    t = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 1000)
    noise = jax.random.normal(jax.random.PRNGKey(3), z.shape, jnp.float32)
    noisy = sched.add_noise(z, noise, t)

    def loss(model, p):
        pred = model.apply({"params": p}, noisy, t)
        return jnp.mean((pred.astype(jnp.float32) - noise) ** 2)

    # jit the grad computations: eager op-by-op dispatch of the UNet VJP
    # took ~60 s/run on 1 CPU and is invisible to the persistent compile
    # cache; jitted, warm runs load both executables from disk
    l_s, g_s = jax.jit(jax.value_and_grad(lambda p: loss(strict, p)))(params)
    l_f, g_f = jax.jit(jax.value_and_grad(lambda p: loss(fast, p)))(params)
    np.testing.assert_allclose(float(l_f), float(l_s), rtol=1e-2)

    vs = np.concatenate([np.asarray(l, np.float64).ravel()
                         for l in jax.tree_util.tree_leaves(g_s)])
    vf = np.concatenate([np.asarray(l, np.float64).ravel()
                         for l in jax.tree_util.tree_leaves(g_f)])
    cos = vs @ vf / (np.linalg.norm(vs) * np.linalg.norm(vf) + 1e-30)
    assert cos > 0.999, cos
