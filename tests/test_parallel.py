"""Data-parallel correctness: the mesh is sleepgen's communication layer
(SURVEY.md §2b), so training must be host-count-invariant — the same
global batch gives bitwise-comparable losses/params on a 1-device and an
8-device mesh."""
import jax
from sleepgen.utils import jit_init
import jax.numpy as jnp
import numpy as np

from sleepgen.config import Config
from sleepgen.parallel import make_mesh, pad_to_multiple, replicate, shard_batch


def _tiny_cfg():
    cfg = Config()
    cfg.dtype = "float32"
    cfg.aekl.num_channels = [2, 2, 4]
    cfg.aekl.latent_channels = 1
    cfg.unet.model_channels = 16
    cfg.unet.norm_num_groups = 8
    cfg.unet.channel_mult = [1, 2]
    cfg.unet.attention_resolutions = [2]
    return cfg


def test_pad_to_multiple():
    x = np.arange(10).reshape(5, 2)
    y = pad_to_multiple(x, 4)
    assert y.shape == (8, 2)
    np.testing.assert_array_equal(y[5:], np.tile(x[-1:], (3, 1)))
    np.testing.assert_array_equal(pad_to_multiple(x, 5), x)


def test_ldm_step_device_count_invariant():
    import optax

    from sleepgen.train.train_aekl import init_state
    from sleepgen.train.train_ldm import (
        DiffusionState,
        build_unet,
        make_ldm_train_step,
        make_schedule,
    )

    cfg = _tiny_cfg()
    rng = jax.random.PRNGKey(0)
    window = 256
    state_ae, ae, *_ = init_state(cfg, rng, window=window)
    sched = make_schedule(cfg)
    unet = build_unet(cfg, 1, 1, jnp.float32)
    z0 = jnp.zeros((2, window // 4, 1), jnp.float32)
    params0 = jit_init(unet, rng, z0, jnp.zeros((2,), jnp.int32))["params"]
    opt = optax.adam(1e-4)

    batch_np = np.random.default_rng(0).random((8, window, 1)).astype(np.float32)

    losses = {}
    final_params = {}
    for n_dev in (1, 8):
        mesh = make_mesh(devices=jax.devices()[:n_dev])
        stage1 = replicate(mesh, state_ae.params_g)
        state = DiffusionState(
            step=jnp.zeros((), jnp.int32), params=jax.device_get(params0),
            opt=opt.init(params0),
            best_loss=jnp.asarray(jnp.inf, jnp.float32),
            scale_factor=jnp.asarray(1.0, jnp.float32))
        state = replicate(mesh, state)
        step_fn = make_ldm_train_step(unet, ae, stage1, sched, opt)
        batch = shard_batch(mesh, jnp.asarray(batch_np))
        for _ in range(2):
            state, metrics = step_fn(state, batch, rng)
        losses[n_dev] = float(jax.device_get(metrics["loss"]))
        final_params[n_dev] = jax.device_get(state.params)

    np.testing.assert_allclose(losses[1], losses[8], rtol=1e-5)
    a = jax.tree_util.tree_leaves(final_params[1])
    b = jax.tree_util.tree_leaves(final_params[8])
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-6)


def test_batch_actually_sharded():
    mesh = make_mesh()
    x = shard_batch(mesh, jnp.zeros((16, 32, 1)))
    assert not x.sharding.is_fully_replicated
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(2, 32, 1)}  # 16 / 8 devices


def test_sharded_sampling_device_count_invariant():
    """Data-parallel sampling (params replicated, seeds sharded) must give
    bitwise-identical samples on a 1-device and an 8-device mesh — each
    seed's trajectory comes from fold_in, independent of placement
    (sample_ldm.make_ldm_sampler mesh=...)."""
    from sleepgen.diffusion import NoiseSchedule
    from sleepgen.sample.sample_ldm import make_ldm_sampler
    from sleepgen.train.train_aekl import build_models
    from sleepgen.train.train_ldm import build_unet

    cfg = _tiny_cfg()
    cfg.diffusion.num_inference_steps = 4
    window, latent_len = 256, 64
    cfg.unet.image_size = latent_len

    ae, _ = build_models(cfg, jnp.float32)
    unet = build_unet(cfg, 1, 1, jnp.float32)
    sched = NoiseSchedule.create("scaled_linear_beta", 1000, 0.0015, 0.0205,
                                 prediction_type="v_prediction")
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, window, 1))
    ae_params = jit_init(ae, {"params": rng}, x, rng)["params"]
    z0 = jnp.zeros((2, latent_len, 1))
    unet_params = jit_init(unet, rng, z0, jnp.zeros((2,), jnp.int32))["params"]
    sf = jnp.float32(1.0)
    seeds = jnp.arange(16)

    outs = {}
    for n_dev in (1, 8):
        mesh = make_mesh(devices=jax.devices()[:n_dev])
        sampler = make_ldm_sampler(unet, ae, sched, latent_len, 1,
                                   num_inference_steps=4, border_pad=4,
                                   mesh=mesh)
        up = replicate(mesh, unet_params)
        ap = replicate(mesh, ae_params)
        out = sampler(up, ap, sf, rng, shard_batch(mesh, seeds))
        if n_dev == 8:
            assert not out.sharding.is_fully_replicated
        outs[n_dev] = np.asarray(jax.device_get(out))

    assert outs[1].shape == (16, window - 8, 1)
    np.testing.assert_allclose(outs[1], outs[8], rtol=1e-6, atol=1e-6)
