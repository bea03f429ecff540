"""SamplerService tests: run-dir loading, warm sampling, per-seed
determinism across requests."""
import jax
import numpy as np
import pytest

from sleepgen.config import Config
from sleepgen.data import WindowDataset, make_synthetic_dataset


@pytest.fixture(scope="module")
def trained_dirs(tmp_path_factory):
    """Tiny trained AEKL+LDM run dirs to serve from."""
    from sleepgen.train.train_aekl import init_state, train_aekl
    from sleepgen.train.train_ldm import train_ldm
    from sleepgen.utils import CheckpointManager

    cfg = Config()
    cfg.dtype = "float32"
    cfg.train.batch_size = 8
    cfg.train.n_epochs = 1
    cfg.train.val_interval = 1
    cfg.train.output_dir = str(tmp_path_factory.mktemp("serve_runs"))
    cfg.aekl.num_channels = [2, 2, 4]
    cfg.unet.model_channels = 16
    cfg.unet.norm_num_groups = 8
    cfg.unet.channel_mult = [1, 2]
    cfg.unet.attention_resolutions = [2]
    cfg.unet.image_size = 64
    cfg.diffusion.num_inference_steps = 4

    raws = make_synthetic_dataset(6, duration_s=30.0)
    train = WindowDataset.from_raw(raws[:4], window=248, pad=4)
    valid = WindowDataset.from_raw(raws[4:], window=248, pad=4)
    r1 = train_aekl(cfg, train, valid, run_name="srv_aekl")
    state0, *_ = init_state(cfg, jax.random.PRNGKey(0), window=256)
    ckpt = CheckpointManager(r1.run_dir)
    stage1 = ckpt.restore_best(jax.device_get(state0.params_g))
    ckpt.close()
    r2 = train_ldm(cfg, train, valid, stage1, run_name="srv_ldm")
    return r1.run_dir, r2.run_dir


@pytest.mark.slow
def test_sampler_service(trained_dirs):
    from sleepgen.serve import SamplerService

    aekl_dir, ldm_dir = trained_dirs
    svc = SamplerService.from_run_dirs(aekl_dir, ldm_dir, batch_size=4,
                                       border_pad=4)
    svc.warmup()
    out = svc.sample(range(6))
    assert out.shape == (6, 248, 1)
    assert np.all(np.isfinite(out))
    assert svc.stats["last_windows_per_sec"] > 0

    # per-seed determinism across independent requests and batch splits
    again = svc.sample([3])
    np.testing.assert_allclose(again[0], out[3], rtol=1e-5, atol=1e-6)

    sigs, psds, freqs = svc.sample_with_psd(range(2))
    assert psds.shape[0] == 2 and freqs.max() <= 18.0


@pytest.mark.slow
def test_sampler_service_pipelined(trained_dirs):
    """sample_async double-buffering returns the same per-seed windows as
    synchronous sample() — overlap must not change results or ordering."""
    from sleepgen.serve import SamplerService

    aekl_dir, ldm_dir = trained_dirs
    svc = SamplerService.from_run_dirs(aekl_dir, ldm_dir, batch_size=4,
                                       border_pad=4)
    svc.warmup()
    sync = [svc.sample(range(4 * i, 4 * i + 4)) for i in range(3)]

    held, got = None, []
    for i in range(3):
        nxt = svc.sample_async(range(4 * i, 4 * i + 4))
        if held is not None:
            got.append(held.result())
        held = nxt
    got.append(held.result())
    for a, b in zip(sync, got):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    assert svc.stats["last_windows_per_sec"] > 0

    # validation errors surface at dispatch time, not at result()
    with pytest.raises(ValueError):
        svc.sample_async(range(4), stage=3)  # unconditional checkpoint


@pytest.mark.slow
def test_sampler_service_mesh(trained_dirs):
    """Mesh-sharded serving returns the same per-seed windows as the
    single-device service (data-parallel serving contract)."""
    from sleepgen.parallel import make_mesh
    from sleepgen.serve import SamplerService

    aekl_dir, ldm_dir = trained_dirs
    svc = SamplerService.from_run_dirs(aekl_dir, ldm_dir, batch_size=8,
                                       border_pad=4)
    svc_mesh = SamplerService.from_run_dirs(
        aekl_dir, ldm_dir, batch_size=8, border_pad=4,
        mesh=make_mesh(devices=jax.devices()[:8]))
    a = svc.sample(range(8))
    b = svc_mesh.sample(range(8))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
