"""End-to-end slice: synthetic data -> AEKL training -> LDM training ->
batched DDIM sampling -> artifacts + metrics. Runs on the 8-device CPU
mesh so the data-parallel path is exercised (SURVEY.md §4)."""
import json
from pathlib import Path

import jax
from sleepgen.utils import jit_init
import jax.numpy as jnp
import numpy as np
import pytest

from sleepgen.config import Config
from sleepgen.data import WindowDataset, make_synthetic_dataset


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    cfg = Config()
    cfg.dtype = "float32"  # CPU test
    cfg.dataset = "edfx"
    cfg.train.batch_size = 8
    cfg.train.n_epochs = 2
    cfg.train.val_interval = 2
    cfg.train.output_dir = str(tmp_path_factory.mktemp("runs"))
    cfg.aekl.num_channels = [2, 2, 4]
    cfg.aekl.latent_channels = 1
    cfg.unet.model_channels = 16
    cfg.unet.norm_num_groups = 8
    cfg.unet.channel_mult = [1, 2]
    cfg.unet.attention_resolutions = [2]
    cfg.unet.image_size = 64
    cfg.diffusion.num_inference_steps = 4
    return cfg


@pytest.fixture(scope="module")
def tiny_ds():
    raws = make_synthetic_dataset(n_recordings=8, duration_s=30.0)
    # small windows: 248 + 2*4 pad = 256 -> latent 64
    train = WindowDataset.from_raw(raws[:6], window=248, pad=4)
    valid = WindowDataset.from_raw(raws[6:], window=248, pad=4)
    return train, valid


@pytest.mark.slow
def test_end_to_end_aekl_ldm_sample(tiny_cfg, tiny_ds):
    from sleepgen.train.train_aekl import train_aekl
    from sleepgen.train.train_ldm import train_ldm
    from sleepgen.sample.sample_ldm import sample_ldm_trials
    from sleepgen.utils.checkpoint import CheckpointManager
    from sleepgen.parallel import make_mesh

    train, valid = tiny_ds
    mesh = make_mesh()
    assert mesh.devices.size == 8, "CPU mesh must have 8 virtual devices"

    # ---- stage 1
    res = train_aekl(tiny_cfg, train, valid, run_name="aekl_test", mesh=mesh)
    assert not res.stopped_on_nan
    assert np.isfinite(res.best_loss)
    run_dir = Path(res.run_dir)
    assert (run_dir / "best_model").exists()
    assert (run_dir / "config.yaml").exists()
    train_log = [json.loads(l) for l in (run_dir / "metrics_train.jsonl").read_text().splitlines()]
    assert len(train_log) == 2
    assert all(np.isfinite(r["g_loss"]) for r in train_log)
    # figure logging is wired into the val interval (reference
    # train_autoencoderkl.py:262-283 cadence): waveform + PSD overlay at
    # epoch 1 (val_interval=2)
    assert (run_dir / "reconstruction_RECONSTRUCTION_1.pdf").exists()
    assert (run_dir / "compare_SPECTRAL_RECONSTRUCTION_1.pdf").exists()
    assert (run_dir / "original_RECONSTRUCTION_1.npy").exists()

    # checkpoint/resume: re-entering the same run dir with a higher epoch
    # budget resumes from the saved step instead of restarting
    import dataclasses
    cfg_resume = dataclasses.replace(tiny_cfg)
    cfg_resume.train = dataclasses.replace(tiny_cfg.train, n_epochs=3)
    res_resume = train_aekl(cfg_resume, train, valid, run_name="aekl_test",
                            mesh=mesh)
    assert res_resume.last_epoch == 2  # continued, not restarted
    log2 = (run_dir / "metrics_train.jsonl").read_text().splitlines()
    assert len(log2) == 3  # exactly one more epoch appended

    # restore stage-1 params through the canonical checkpoint
    from sleepgen.train.train_aekl import init_state
    state0, ae, *_ = init_state(tiny_cfg, jax.random.PRNGKey(0),
                                window=train.padded_window)
    ckpt = CheckpointManager(run_dir)
    stage1_params = ckpt.restore_best(jax.device_get(state0.params_g))
    ckpt.close()

    # ---- stage 2 (4 epochs so the every-2x-val-interval in-training
    # sampler fires at epoch 3, covering its figure artifacts too)
    cfg_ldm = dataclasses.replace(tiny_cfg)
    cfg_ldm.train = dataclasses.replace(tiny_cfg.train, n_epochs=4)
    res2 = train_ldm(cfg_ldm, train, valid, stage1_params,
                     run_name="ldm_test", mesh=mesh)
    assert not res2.stopped_on_nan
    assert np.isfinite(res2.scale_factor) and res2.scale_factor > 0
    ldm_dir = Path(res2.run_dir)
    assert (ldm_dir / "best_model").exists() or (ldm_dir / "final_model").exists()
    # in-training unconditioned sample artifacts + figures (util.py:226-258)
    assert (ldm_dir / "sample_unconditioned_3.npy").exists()
    assert (ldm_dir / "ldm_samples_3.pdf").exists()
    assert (ldm_dir / "compare_SAMPLE_VS_NOSCALE_3.pdf").exists()

    # ---- sampling with per-seed determinism + artifact contract
    from sleepgen.train.train_ldm import DiffusionState
    ckpt2 = CheckpointManager(ldm_dir)
    from sleepgen.train.train_ldm import build_unet
    unet = build_unet(tiny_cfg, 1, 1, jnp.float32)
    z0 = jnp.zeros((2, 64, 1))
    template = {"params": jax.device_get(
        jit_init(unet, jax.random.PRNGKey(0), z0, jnp.zeros((2,), jnp.int32))["params"]),
        "scale_factor": np.zeros((), np.float32)}
    best = ckpt2.restore_best(template, name="final_model")
    ckpt2.close()

    out_dir = ldm_dir / "samples"
    sigs = sample_ldm_trials(
        tiny_cfg, best["params"], stage1_params, float(best["scale_factor"]),
        out_dir, start_seed=0, stop_seed=6, batch_size=4, compute_psd=True,
        border_pad=4)
    assert sigs.shape == (6, 248, 1)
    assert np.all(np.isfinite(sigs))
    assert (out_dir / "sample_0.npy").exists() and (out_dir / "sample_5.npy").exists()
    assert (out_dir / "psd_list_0.npy").exists()
    s0 = np.load(out_dir / "sample_0.npy")
    assert s0.shape == (1, 1, 248)  # reference (B, C, L) layout

    # per-seed determinism: same seed in a different batch split -> same signal
    sigs_again = sample_ldm_trials(
        tiny_cfg, best["params"], stage1_params, float(best["scale_factor"]),
        ldm_dir / "samples2", start_seed=0, stop_seed=2, batch_size=2,
        compute_psd=False, border_pad=4)
    np.testing.assert_allclose(sigs_again[0], sigs[0], rtol=1e-4, atol=1e-5)

    # ---- metrics over the artifacts
    from sleepgen.eval import ms_ssim_1d
    real = valid.epoch_windows(np.random.default_rng(0))[:, 4:-4, :][:, :248, :]
    k = min(len(real), len(sigs))
    ms = np.asarray(ms_ssim_1d(jnp.asarray(sigs[:k]), jnp.asarray(real[:k]),
                               kernel_size=7))
    assert ms.shape == (k,)
    assert np.all(np.isfinite(ms))


def test_checkpoint_forward_compat_merge(tmp_path):
    """Old checkpoints (missing newly added state fields) restore via the
    merge fallback: restored fields come from disk, new fields keep
    template defaults — incl. optax NamedTuple states."""
    import optax
    from flax import struct
    from sleepgen.utils.checkpoint import CheckpointManager

    @struct.dataclass
    class OldState:
        step: jnp.ndarray
        params: dict
        opt: object

    @struct.dataclass
    class NewState:
        step: jnp.ndarray
        params: dict
        opt: object
        extra: object = None

    params = {"w": jnp.arange(4.0)}
    opt = optax.adam(1e-3).init(params)
    old = OldState(step=jnp.asarray(7), params=params, opt=opt)
    ckpt = CheckpointManager(tmp_path / "run")
    ckpt.save(7, jax.device_get(old))

    new_tpl = NewState(step=jnp.asarray(0),
                       params={"w": jnp.zeros(4)},
                       opt=optax.adam(1e-3).init({"w": jnp.zeros(4)}),
                       extra={"e": jnp.ones(2)})
    restored = ckpt.restore_latest(jax.device_get(new_tpl))
    ckpt.close()
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(4.0))
    # optax state typing preserved through the merge
    assert type(restored.opt[0]).__name__ == type(opt[0]).__name__
    # field absent from the old checkpoint keeps the template default
    np.testing.assert_array_equal(np.asarray(restored.extra["e"]), np.ones(2))
