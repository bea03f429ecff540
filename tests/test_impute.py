"""Diffusion imputation (RePaint masked sampling) — beyond parity.

The reference has no imputation path (its DM checkpoints only draw
unconditional windows, ``src/sample_trials_ddpm.py``); sleepgen repairs
masked signal regions with the same trained weights
(``samplers.ddpm_inpaint_loop`` / ``impute_dm`` / ``cli.impute``).
"""
from pathlib import Path

import numpy as np
import pytest

import jax
from sleepgen.utils import jit_init
import jax.numpy as jnp

from sleepgen.config import Config
from sleepgen.sample.samplers import impute_dm
from sleepgen.train.train_ldm import build_unet, make_schedule

WINDOW = 256


@pytest.fixture(scope="module")
def small_dm():
    cfg = Config()
    cfg.dtype = "float32"
    cfg.unet.model_channels = 16
    cfg.unet.norm_num_groups = 8
    cfg.unet.channel_mult = [1, 2]
    cfg.unet.attention_resolutions = [2]
    cfg.unet.image_size = WINDOW
    cfg.diffusion.timesteps = 8  # tiny chain: the loop runs all T steps
    unet = build_unet(cfg, 1, 1, jnp.float32)
    params = jit_init(unet, jax.random.PRNGKey(1),
                       jnp.zeros((2, WINDOW, 1), jnp.float32),
                       jnp.zeros((2,), jnp.int32))["params"]
    # perturb: zero-init out conv would make the model input-independent
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.01 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    return cfg, unet, params, make_schedule(cfg)


def _mask(start, stop):
    m = np.ones((1, WINDOW, 1), np.float32)
    m[:, start:stop, :] = 0.0
    return jnp.asarray(m)


def test_impute_preserves_known_and_fills_masked(small_dm):
    cfg, unet, params, sched = small_dm
    x = jnp.asarray(np.sin(np.linspace(0, 20, WINDOW, dtype=np.float32))
                    )[None, :, None].repeat(3, 0)
    mask = _mask(100, 180)
    out = impute_dm(unet, params, sched, x, mask, jax.random.PRNGKey(0))
    out = np.asarray(out)
    # observed region is returned exactly; masked region was regenerated
    np.testing.assert_array_equal(out[:, :100], np.asarray(x)[:, :100])
    np.testing.assert_array_equal(out[:, 180:], np.asarray(x)[:, 180:])
    assert not np.allclose(out[:, 100:180], np.asarray(x)[:, 100:180])
    assert np.isfinite(out).all()


def test_impute_deterministic_and_context_dependent(small_dm):
    cfg, unet, params, sched = small_dm
    mask = _mask(64, 192)
    key = jax.random.PRNGKey(3)
    x1 = jnp.ones((2, WINDOW, 1), jnp.float32) * 0.5
    x2 = -x1
    a = np.asarray(impute_dm(unet, params, sched, x1, mask, key))
    b = np.asarray(impute_dm(unet, params, sched, x1, mask, key))
    c = np.asarray(impute_dm(unet, params, sched, x2, mask, key))
    np.testing.assert_array_equal(a, b)
    # the DM denoises the masked span IN CONTEXT: different observed
    # signal must produce a different repair (same key, same mask)
    assert not np.allclose(a[:, 64:192], c[:, 64:192])


def test_impute_resampling_and_conditional(small_dm):
    cfg, unet, params, sched = small_dm
    mask = _mask(0, 128)
    x = jnp.zeros((2, WINDOW, 1), jnp.float32)
    r2 = impute_dm(unet, params, sched, x, mask, jax.random.PRNGKey(0),
                   num_resample=2)
    assert np.isfinite(np.asarray(r2)).all()

    cfg2 = Config()
    cfg2.dtype = "float32"
    cfg2.unet.model_channels = 16
    cfg2.unet.norm_num_groups = 8
    cfg2.unet.channel_mult = [1, 2]
    cfg2.unet.attention_resolutions = [2]
    cfg2.unet.num_classes = 5
    cfg2.diffusion.timesteps = 8
    unet_c = build_unet(cfg2, 1, 1, jnp.float32)
    params_c = jit_init(unet_c, jax.random.PRNGKey(1),
                           jnp.zeros((2, WINDOW, 1), jnp.float32),
                           jnp.zeros((2,), jnp.int32),
                           jnp.zeros((2,), jnp.int32))["params"]
    # perturb: zero-init out conv would make cond == guided trivially
    leaves, treedef = jax.tree_util.tree_flatten(params_c)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params_c = jax.tree_util.tree_unflatten(
        treedef, [l + 0.01 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    sched_c = make_schedule(cfg2)
    y = jnp.array([0, 3], jnp.int32)
    rc = impute_dm(unet_c, params_c, sched_c, x, mask, jax.random.PRNGKey(0),
                   labels=y)
    assert np.isfinite(np.asarray(rc)).all()
    # classifier-free-guided repair: same key, different score -> a
    # different (finite) fill, exact on the observed region
    rg = impute_dm(unet_c, params_c, sched_c, x, mask, jax.random.PRNGKey(0),
                   labels=y, guidance_scale=2.0)
    rg = np.asarray(rg)
    assert np.isfinite(rg).all()
    assert not np.allclose(rg[:, :128], np.asarray(rc)[:, :128])
    np.testing.assert_array_equal(rg[:, 128:], np.asarray(x)[:, 128:])


@pytest.fixture(scope="module")
def small_ldm_dirs(tmp_path_factory):
    """Unconditional AEKL+LDM run dirs with a tiny diffusion chain, plus
    the live modules/params for direct impute_ldm calls."""
    from sleepgen.train.train_aekl import build_models, init_state
    from sleepgen.utils import CheckpointManager

    tmp_path = tmp_path_factory.mktemp("impute_ldm")
    acfg = Config()
    acfg.dtype = "float32"
    acfg.aekl.num_channels = [2, 2, 4]
    acfg.aekl.latent_channels = 1
    arun = tmp_path / "aekl"
    arun.mkdir()
    acfg.to_yaml(arun / "config.yaml")
    st, *_ = init_state(acfg, jax.random.PRNGKey(0), window=WINDOW)
    ae_params = jax.device_get(st.params_g)
    ck = CheckpointManager(arun)
    ck.save_best(ae_params)
    ck.close()
    ae, _ = build_models(acfg, jnp.float32)

    cfg = Config()
    cfg.dtype = "float32"
    cfg.unet.model_channels = 16
    cfg.unet.norm_num_groups = 8
    cfg.unet.channel_mult = [1, 2]
    cfg.unet.attention_resolutions = [2]
    cfg.unet.image_size = WINDOW // 4  # two stride-2 downsamples
    cfg.diffusion.timesteps = 8  # the RePaint loop runs all T steps
    lrun = tmp_path / "ldm"
    lrun.mkdir()
    cfg.to_yaml(lrun / "config.yaml")
    unet = build_unet(cfg, 1, 1, jnp.float32)
    params = jit_init(unet, jax.random.PRNGKey(1),
                       jnp.zeros((2, WINDOW // 4, 1), jnp.float32),
                       jnp.zeros((2,), jnp.int32))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.01 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    ck = CheckpointManager(lrun)
    ck.save_best({"params": jax.device_get(params),
                  "scale_factor": jnp.float32(1.0)})
    ck.close()
    return arun, lrun, ae, ae_params, unet, params, make_schedule(cfg)


def test_latent_observed_mask_semantics():
    """Conservative downsample + erosion: a latent is an anchor only if
    every signal sample it covers is observed AND it sits >= erode
    positions away from any generated latent."""
    from sleepgen.sample.samplers import latent_observed_mask

    m = np.ones((1, 64, 1), np.float32)
    m[:, 17:31, :] = 0.0  # straddles latent groups 4..7 (factor 4)
    out = np.asarray(latent_observed_mask(m, 16, erode=0))[0, :, 0]
    expect = np.ones(16, np.float32)
    expect[4:8] = 0.0  # group 4 (samples 16-19) is partially masked
    np.testing.assert_array_equal(out, expect)
    out2 = np.asarray(latent_observed_mask(m, 16, erode=2))[0, :, 0]
    expect2 = np.ones(16, np.float32)
    expect2[2:10] = 0.0  # eroded 2 positions each side
    np.testing.assert_array_equal(out2, expect2)
    # erosion only widens the generated region
    assert (out2 <= out).all()


def test_impute_ldm_preserves_known_and_fills_masked(small_ldm_dirs):
    from sleepgen.sample.samplers import impute_ldm

    _, _, ae, ae_params, unet, params, sched = small_ldm_dirs
    x = jnp.asarray(np.sin(np.linspace(0, 20, WINDOW, dtype=np.float32))
                    )[None, :, None].repeat(3, 0) * 0.4 + 0.5
    mask = _mask(100, 180)
    key = jax.random.PRNGKey(0)
    out = np.asarray(impute_ldm(unet, ae, params, ae_params,
                                jnp.float32(1.0), sched, x, mask, key))
    # observed region is EXACT (signal-space splice), masked regenerated
    np.testing.assert_array_equal(out[:, :100], np.asarray(x)[:, :100])
    np.testing.assert_array_equal(out[:, 180:], np.asarray(x)[:, 180:])
    assert not np.allclose(out[:, 100:180], np.asarray(x)[:, 100:180])
    assert np.isfinite(out).all()
    # deterministic under the same key
    out_b = np.asarray(impute_ldm(unet, ae, params, ae_params,
                                  jnp.float32(1.0), sched, x, mask, key))
    np.testing.assert_array_equal(out, out_b)
    # context-dependent: a different observed signal changes the repair
    out_c = np.asarray(impute_ldm(unet, ae, params, ae_params,
                                  jnp.float32(1.0), sched, 1.0 - x, mask,
                                  key))
    assert not np.allclose(out[:, 100:180], out_c[:, 100:180])


def test_impute_cli_latent_mode(small_ldm_dirs, tmp_path):
    """--best_model_path switches the CLI to LDM latent-space repair."""
    from sleepgen.cli.impute import main as impute_main

    arun, lrun, *_ = small_ldm_dirs
    length = WINDOW - 72  # CLI pads by BORDER_PAD=36 per side
    rng = np.random.default_rng(0)
    windows = rng.standard_normal((5, 1, length)).astype(np.float32)
    inp = tmp_path / "in.npy"
    np.save(inp, windows)
    out = tmp_path / "fixed"
    impute_main(["--input", str(inp), "--diffusion_path", str(lrun),
                 "--best_model_path", str(arun),
                 "--output_dir", str(out), "--mask_start", "60",
                 "--mask_len", "50", "--batch_size", "4",
                 "--latent_erode", "2"])
    fixed = np.load(out / "imputed.npy")
    mask = np.load(out / "mask.npy")
    assert fixed.shape == (5, 1, length) and np.isfinite(fixed).all()
    assert mask.shape == (length,) and (~mask[60:110]).all() and mask[:60].all()
    np.testing.assert_array_equal(fixed[:, 0, :60], windows[:, 0, :60])
    assert not np.allclose(fixed[:, 0, 60:110], windows[:, 0, 60:110])


def test_impute_cli(small_dm, tmp_path):
    """Drive the CLI end to end on a random-init checkpoint."""
    from sleepgen.cli.impute import main as impute_main
    from sleepgen.utils import CheckpointManager

    cfg, unet, params, sched = small_dm
    run = tmp_path / "dm"
    run.mkdir()
    cfg.to_yaml(run / "config.yaml")
    ck = CheckpointManager(run)
    ck.save_best({"params": jax.device_get(params)}, name="final_model")
    ck.close()

    length = WINDOW - 72  # CLI pads by BORDER_PAD=36 per side
    rng = np.random.default_rng(0)
    windows = rng.standard_normal((5, 1, length)).astype(np.float32)
    inp = tmp_path / "in.npy"
    np.save(inp, windows)
    out = tmp_path / "fixed"
    impute_main(["--input", str(inp), "--diffusion_path", str(run),
                 "--output_dir", str(out), "--mask_start", "60",
                 "--mask_len", "50", "--batch_size", "4"])
    fixed = np.load(out / "imputed.npy")
    mask = np.load(out / "mask.npy")
    assert fixed.shape == (5, 1, length) and np.isfinite(fixed).all()
    assert mask.shape == (length,) and (~mask[60:110]).all() and mask[:60].all()
    np.testing.assert_array_equal(fixed[:, 0, :60], windows[:, 0, :60])
    assert not np.allclose(fixed[:, 0, 60:110], windows[:, 0, 60:110])
