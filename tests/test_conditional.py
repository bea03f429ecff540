"""Class-conditional diffusion (beyond-parity).

The reference's UNet carries a ``num_classes`` field it never trains
(``src/models/unet.py:379-380, 531-533``); sleepgen wires the conditional
path end-to-end: labeled batches in ``train_dm``, a label-closured
sampler (``sample_dm_conditional``), and a decode-harness quality gate
(scripts/demo_conditional.py). These tests pin the mechanics on a CPU
mesh; the quality gate runs on TPU (DEMO_COND_r3.json).
"""
from pathlib import Path

import numpy as np
import pytest

import jax
from sleepgen.utils import jit_init
import jax.numpy as jnp

from sleepgen.config import Config
from sleepgen.data.staging import LabeledEpochDataset, make_synthetic_staged
from sleepgen.sample.samplers import sample_dm_conditional
from sleepgen.train.train_dm import train_dm
from sleepgen.train.train_ldm import build_unet, make_schedule


N_CLASSES = 5
WINDOW = 248  # + 2*4 pad = 256 = 4 * 2**(levels-1) for channel_mult [1,2]


@pytest.fixture(scope="module")
def cond_cfg(tmp_path_factory):
    cfg = Config()
    cfg.dtype = "float32"
    cfg.train.batch_size = 16
    cfg.train.n_epochs = 2
    cfg.train.val_interval = 1
    cfg.train.output_dir = str(tmp_path_factory.mktemp("cond_runs"))
    cfg.unet.model_channels = 16
    cfg.unet.norm_num_groups = 8
    cfg.unet.channel_mult = [1, 2]
    cfg.unet.attention_resolutions = [2]
    cfg.unet.num_classes = N_CLASSES
    cfg.unet.image_size = WINDOW + 8
    cfg.diffusion.num_inference_steps = 4
    # short chain: the trainers' in-training samplers run the FULL
    # ancestral loop at val intervals — at the parity T=1000 that alone
    # cost the two e2e tests here ~400 s of CPU (the full-T loop is
    # covered by tests/test_schedules.py closed-form checks)
    cfg.diffusion.timesteps = 32
    return cfg


@pytest.fixture(scope="module")
def cond_ds():
    x, y, rids = make_synthetic_staged(n_recordings=4, n_epochs_per_rec=10)
    # crop the 3000-sample fixture epochs to a CPU-sized window
    x = x[:, :WINDOW, :]
    train = LabeledEpochDataset(x[rids < 3], y[rids < 3], pad=4)
    valid = LabeledEpochDataset(x[rids >= 3], y[rids >= 3], pad=4)
    return train, valid


def test_labeled_epoch_dataset_contract(cond_ds):
    train, _ = cond_ds
    assert train.padded_window == WINDOW + 8
    # the tiny fixture may not draw every one of the 5 stages
    assert 1 < train.num_classes <= N_CLASSES
    rng = np.random.default_rng(0)
    xb, yb = next(train.epoch_batches(8, rng, pad_multiple=8))
    assert xb.shape == (8, WINDOW + 8, 1) and xb.dtype == np.float32
    assert yb.shape == (8,) and yb.dtype == np.int32
    # pad_multiple pads labels alongside windows
    xb2, yb2 = next(train.epoch_batches(5, rng, pad_multiple=8))
    assert xb2.shape[0] == 8 and yb2.shape[0] == 8


def test_conditional_train_dm_end_to_end(cond_cfg, cond_ds):
    """train_dm with num_classes>0: labeled batches, finite losses,
    label_emb parameters created, checkpoints written."""
    train, valid = cond_ds
    res = train_dm(cond_cfg, train, valid, run_name="cond_dm")
    assert np.isfinite(res.best_loss)
    assert not res.stopped_on_nan

    from sleepgen.utils import CheckpointManager

    unet = build_unet(cond_cfg, 1, 1, jnp.float32)
    tpl = {"params": jax.device_get(jit_init(unet,
        jax.random.PRNGKey(0),
        jnp.zeros((2, train.padded_window, 1), jnp.float32),
        jnp.zeros((2,), jnp.int32),
        jnp.zeros((2,), jnp.int32)))["params"]}
    assert "label_emb" in tpl["params"], "conditional init must create the embedding"
    ck = CheckpointManager(res.run_dir)
    best = ck.restore_best(tpl, name="final_model")
    # best_loss must be PERSISTED into the periodic checkpoint state: a
    # resume that restores best_loss=inf would let the first post-resume
    # validation overwrite the true best_model with a worse one
    import optax

    from sleepgen.train.train_ldm import DiffusionState

    state_tpl = jax.device_get(DiffusionState(
        step=jnp.zeros((), jnp.int32), params=tpl["params"],
        opt=optax.adam(cond_cfg.train.base_lr).init(tpl["params"]),
        best_loss=jnp.asarray(jnp.inf, jnp.float32),
        scale_factor=jnp.asarray(1.0, jnp.float32)))
    latest = ck.restore_latest(state_tpl)
    ck.close()
    assert best is not None and "label_emb" in best["params"]
    assert np.isfinite(float(latest.best_loss)), \
        "train_dm never wrote best_loss into the checkpointed state"


def test_conditioning_changes_samples_and_is_seed_deterministic(cond_cfg):
    unet = build_unet(cond_cfg, 1, 1, jnp.float32)
    window = WINDOW + 8
    params = jit_init(unet, jax.random.PRNGKey(1),
                       jnp.zeros((2, window, 1), jnp.float32),
                       jnp.zeros((2,), jnp.int32),
                       jnp.zeros((2,), jnp.int32))["params"]
    # the output conv is zero-init (diffusion convention), which makes the
    # untrained UNet label-independent — perturb every leaf so the label
    # embedding actually reaches the output
    k = jax.random.PRNGKey(2)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(k, len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.01 * jax.random.normal(kk, l.shape, l.dtype)
                  for l, kk in zip(leaves, keys)])
    sched = make_schedule(cond_cfg)
    key = jax.random.PRNGKey(0)
    seeds = jnp.arange(3)

    y0 = jnp.zeros((3,), jnp.int32)
    y2 = jnp.full((3,), 2, jnp.int32)
    s0 = sample_dm_conditional(unet, params, sched, y0, key, seeds, window,
                               num_steps=4)
    s0b = sample_dm_conditional(unet, params, sched, y0, key, seeds, window,
                                num_steps=4)
    s2 = sample_dm_conditional(unet, params, sched, y2, key, seeds, window,
                               num_steps=4)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s0b))
    assert not np.allclose(np.asarray(s0), np.asarray(s2)), (
        "different labels must change samples (even at random init the "
        "label embedding feeds every resblock)")


def test_ddpm_cli_conditional_stage(cond_cfg, tmp_path):
    """`sample_trials_ddpm --stage k` drives a conditional checkpoint end to
    end: stage-suffixed artifact dir, per-seed .npy files, and hard errors
    when --stage disagrees with the checkpoint's num_classes."""
    from sleepgen.cli.sample_trials_ddpm import main as ddpm_main
    from sleepgen.utils import CheckpointManager

    window = WINDOW + 8
    run_dir = tmp_path / "cond_ckpt"
    run_dir.mkdir()
    cfg = cond_cfg
    cfg.unet.image_size = window
    cfg.to_yaml(run_dir / "config.yaml")
    unet = build_unet(cfg, 1, 1, jnp.float32)
    params = jit_init(unet, jax.random.PRNGKey(0),
                       jnp.zeros((2, window, 1), jnp.float32),
                       jnp.zeros((2,), jnp.int32),
                       jnp.zeros((2,), jnp.int32))["params"]
    ck = CheckpointManager(run_dir)
    ck.save_best({"params": jax.device_get(params)})
    ck.close()

    out = tmp_path / "cli_out"
    ddpm_main(["--output_dir", str(out), "--diffusion_path", str(run_dir),
               "--stop_seed", "3", "--batch_size", "3",
               "--num_inference_steps", "8", "--num_ddim_steps", "4",
               "--stage", "2", "--no_psd"])
    art = out / "samples_ddpm_no-spectral_edfx_stage2"
    assert art.is_dir()
    sig = np.load(art / "sample_0.npy")
    # the CLI crops the production BORDER_PAD=36 per side (3072->3000
    # contract), regardless of this test's smaller window
    assert sig.shape[-1] == window - 72 and np.isfinite(sig).all()

    with pytest.raises(SystemExit):  # conditional ckpt needs --stage
        ddpm_main(["--output_dir", str(out), "--diffusion_path", str(run_dir),
                   "--stop_seed", "1", "--no_psd"])


def _perturbed_params(unet, window, key=2):
    params = jit_init(unet, jax.random.PRNGKey(1),
                       jnp.zeros((2, window, 1), jnp.float32),
                       jnp.zeros((2,), jnp.int32),
                       jnp.zeros((2,), jnp.int32))["params"]
    # zero-init output conv makes the untrained UNet label-independent;
    # perturb every leaf so conditioning reaches the output
    def perturb(params_, key_):
        leaves, treedef = jax.tree_util.tree_flatten(params_)
        keys = jax.random.split(key_, len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef, [l + 0.01 * jax.random.normal(kk, l.shape, l.dtype)
                      for l, kk in zip(leaves, keys)])

    # one jitted graph instead of ~300 eager per-leaf dispatches
    return jax.jit(perturb)(params, jax.random.PRNGKey(key))


def test_cfg_null_label_masks_embedding(cond_cfg):
    """y = -1 is the CFG null label: the label_emb table must not reach the
    output at all — scrambling it leaves the null output bitwise unchanged,
    while real labels see the change."""
    unet = build_unet(cond_cfg, 1, 1, jnp.float32)
    window = WINDOW + 8
    params = _perturbed_params(unet, window)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, window, 1))
    t = jnp.array([5, 50, 500], jnp.int32)

    y_null = jnp.full((3,), -1, jnp.int32)
    apply = jax.jit(unet.apply)  # one cached graph for all four calls
    out_null = apply({"params": params}, x, t, y_null)
    out_c = apply({"params": params}, x, t, jnp.zeros((3,), jnp.int32))
    assert not np.allclose(np.asarray(out_null), np.asarray(out_c))

    scrambled = jax.tree_util.tree_map_with_path(
        lambda p, l: l + 7.0 if "label_emb" in str(p) else l, params)
    out_null2 = apply({"params": scrambled}, x, t, y_null)
    out_c2 = apply({"params": scrambled}, x, t, jnp.zeros((3,), jnp.int32))
    np.testing.assert_array_equal(np.asarray(out_null), np.asarray(out_null2))
    assert not np.allclose(np.asarray(out_c), np.asarray(out_c2))


def test_cfg_guided_sampling_deterministic_and_distinct(cond_cfg):
    unet = build_unet(cond_cfg, 1, 1, jnp.float32)
    window = WINDOW + 8
    params = _perturbed_params(unet, window)
    sched = make_schedule(cond_cfg)
    key, seeds = jax.random.PRNGKey(0), jnp.arange(2)
    y = jnp.array([1, 3], jnp.int32)

    plain = sample_dm_conditional(unet, params, sched, y, key, seeds, window,
                                  num_steps=4)
    g3 = sample_dm_conditional(unet, params, sched, y, key, seeds, window,
                               num_steps=4, guidance_scale=3.0)
    g3b = sample_dm_conditional(unet, params, sched, y, key, seeds, window,
                                num_steps=4, guidance_scale=3.0)
    np.testing.assert_array_equal(np.asarray(g3), np.asarray(g3b))
    assert not np.allclose(np.asarray(plain), np.asarray(g3))
    assert np.isfinite(np.asarray(g3)).all()


def test_cond_dropout_train_step(cond_cfg):
    """cond_dropout_prob > 0 trains with dropped (-1) labels: step runs,
    loss finite, and the dropout actually changes the loss vs p=0."""
    import optax

    from sleepgen.train.train_dm import make_dm_train_step
    from sleepgen.train.train_ldm import DiffusionState

    unet = build_unet(cond_cfg, 1, 1, jnp.float32)
    window = WINDOW + 8
    params = _perturbed_params(unet, window)
    sched = make_schedule(cond_cfg)
    opt = optax.adam(1e-4)

    def state():
        # fresh buffers per call: the train step donates its state arg
        p = jax.tree_util.tree_map(jnp.copy, params)
        return DiffusionState(step=jnp.zeros((), jnp.int32), params=p,
                              opt=opt.init(p),
                              best_loss=jnp.asarray(jnp.inf, jnp.float32),
                              scale_factor=jnp.asarray(1.0, jnp.float32))

    x = jax.random.normal(jax.random.PRNGKey(4), (8, window, 1))
    y = jnp.arange(8, dtype=jnp.int32) % N_CLASSES
    rng = jax.random.PRNGKey(5)
    step_p0 = make_dm_train_step(unet, sched, opt, False, conditional=True)
    step_p9 = make_dm_train_step(unet, sched, opt, False, conditional=True,
                                 cond_dropout_prob=0.9)
    _, m0 = step_p0(state(), (x, y), rng)
    _, m9 = step_p9(state(), (x, y), rng)
    l0, l9 = float(m0["loss"]), float(m9["loss"])
    assert np.isfinite(l0) and np.isfinite(l9)
    assert l0 != l9, "p=0.9 must route most labels through the null branch"


def test_conditional_train_ldm_and_guided_mesh_sampler(cond_cfg, cond_ds, tmp_path):
    """Latent-space conditional: train_ldm with labeled batches + CFG
    dropout, then guided sampling through make_ldm_sampler — mesh output
    bitwise equal to single-device."""
    from sleepgen.parallel import make_mesh
    from sleepgen.sample.sample_ldm import make_ldm_sampler, sampling_schedule
    from sleepgen.train.train_aekl import build_models
    from sleepgen.train.train_ldm import train_ldm

    train, valid = cond_ds
    cfg = Config()
    cfg.dtype = "float32"
    cfg.train.batch_size = 16
    cfg.train.n_epochs = 2
    cfg.train.val_interval = 1
    cfg.train.cond_dropout_prob = 0.2
    cfg.train.output_dir = str(tmp_path)
    cfg.aekl.num_channels = [2, 2, 4]
    cfg.aekl.latent_channels = 1
    cfg.unet.model_channels = 16
    cfg.unet.norm_num_groups = 8
    cfg.unet.channel_mult = [1, 2]
    cfg.unet.attention_resolutions = [2]
    cfg.unet.num_classes = N_CLASSES
    cfg.unet.image_size = (WINDOW + 8) // 4  # latent length
    cfg.diffusion.num_inference_steps = 4
    # short chain for the in-training ancestral sampler (same rationale as
    # cond_cfg: at the parity T=1000 the val-time sample loop alone costs
    # tens of seconds of CPU; full-T covered by test_schedules closed forms)
    cfg.diffusion.timesteps = 32

    ae, _ = build_models(cfg, jnp.float32)
    x0 = jnp.zeros((2, WINDOW + 8, 1), jnp.float32)
    stage1 = jit_init(ae, {"params": jax.random.PRNGKey(0)}, x0,
                     jax.random.PRNGKey(1))["params"]

    res = train_ldm(cfg, train, valid, stage1, run_name="cond_ldm")
    assert np.isfinite(res.best_loss) and not res.stopped_on_nan
    # in-training sampler wrote the per-class conditional artifact
    assert (Path(res.run_dir) / "sample_conditional_1.npy").exists()

    # guided sampling: mesh vs single-device bitwise
    unet = build_unet(cfg, 1, 1, jnp.float32)
    params = jit_init(unet, jax.random.PRNGKey(1),
                       jnp.zeros((2, cfg.unet.image_size, 1), jnp.float32),
                       jnp.zeros((2,), jnp.int32),
                       jnp.zeros((2,), jnp.int32))["params"]
    sched = sampling_schedule(cfg)
    seeds = jnp.arange(8)
    labels = jnp.asarray(np.arange(8) % N_CLASSES, jnp.int32)
    kw = dict(latent_len=cfg.unet.image_size, latent_channels=1,
              num_inference_steps=4, border_pad=4, conditional=True,
              guided=True)
    gs = jnp.float32(2.0)
    s1 = make_ldm_sampler(unet, ae, sched, **kw)(
        params, stage1, jnp.float32(1.0), jax.random.PRNGKey(0), seeds,
        labels, gs)
    s8 = make_ldm_sampler(unet, ae, sched, mesh=make_mesh(), **kw)(
        params, stage1, jnp.float32(1.0), jax.random.PRNGKey(0), seeds,
        labels, gs)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s8))


@pytest.fixture(scope="module")
def cond_serve_dirs(tmp_path_factory):
    """Conditional AEKL+LDM run dirs (config.yaml + best checkpoints)."""
    from sleepgen.train.train_aekl import init_state
    from sleepgen.utils import CheckpointManager

    tmp_path = tmp_path_factory.mktemp("cond_serve")
    acfg = Config()
    acfg.dtype = "float32"
    acfg.aekl.num_channels = [2, 2, 4]
    acfg.aekl.latent_channels = 1
    arun = tmp_path / "aekl"
    arun.mkdir()
    acfg.to_yaml(arun / "config.yaml")
    st, *_ = init_state(acfg, jax.random.PRNGKey(0), window=256)
    ck = CheckpointManager(arun)
    ck.save_best(jax.device_get(st.params_g))
    ck.close()

    cfg = Config()
    cfg.dtype = "float32"
    cfg.unet.model_channels = 16
    cfg.unet.norm_num_groups = 8
    cfg.unet.channel_mult = [1, 2]
    cfg.unet.attention_resolutions = [2]
    cfg.unet.num_classes = N_CLASSES
    cfg.unet.image_size = 64
    cfg.diffusion.num_inference_steps = 4
    lrun = tmp_path / "ldm"
    lrun.mkdir()
    cfg.to_yaml(lrun / "config.yaml")
    unet = build_unet(cfg, 1, 1, jnp.float32)
    p = _perturbed_params(unet, 64)  # zero-init out conv would mask labels
    ck = CheckpointManager(lrun)
    ck.save_best({"params": jax.device_get(p),
                  "scale_factor": jnp.float32(1.0)})
    ck.close()
    return arun, lrun


def test_serve_conditional(cond_serve_dirs):
    """SamplerService on a conditional LDM checkpoint: stage-routed,
    guidance-keyed sampler cache, per-seed+stage determinism, error paths."""
    from sleepgen.serve import SamplerService

    arun, lrun = cond_serve_dirs
    svc = SamplerService.from_run_dirs(arun, lrun, batch_size=4, border_pad=4)
    with pytest.raises(ValueError):  # conditional service needs a stage
        svc.sample(range(4))
    out = svc.sample(range(4), stage=2)
    assert out.shape == (4, 248, 1) and np.isfinite(out).all()
    # same (seed, stage) -> same sample; different stage -> different
    np.testing.assert_array_equal(svc.sample([1], stage=2)[0], out[1])
    guided = svc.sample(range(4), stage=2, guidance_scale=2.0)
    assert not np.allclose(guided, out)
    guided3 = svc.sample(range(4), stage=2, guidance_scale=3.0)
    assert not np.allclose(guided3, guided)
    # guidance_scale is traced: sweeping scales must reuse ONE compiled
    # guided sampler (bounded cache: plain + guided per batch shape)
    assert set(svc._samplers) == {(4, False), (4, True)}
    # stage range is validated — a negative stage would silently sample
    # the CFG null branch, an overlarge one would clamp to the last class
    with pytest.raises(ValueError):
        svc.sample(range(4), stage=-1)
    with pytest.raises(ValueError):
        svc.sample(range(4), stage=N_CLASSES)


def test_serve_cli_conditional(cond_serve_dirs, tmp_path, monkeypatch, capsys):
    """The serve CLI end-to-end on a conditional checkpoint: per-request
    'stage'/'guidance_scale' JSON fields route through, and a request
    without a stage reports an error line instead of killing the loop
    (before round 3 the CLI had no way to pass a stage at all — every
    post-warmup request raised and crashed the service)."""
    import io
    import json

    from sleepgen.cli import serve as serve_cli

    arun, lrun = cond_serve_dirs
    out = tmp_path / "out"
    requests = "\n".join([
        json.dumps({"seeds": [0, 1], "stage": 2}),
        json.dumps({"seeds": [0, 1]}),  # no stage, no --stage: error line
        json.dumps({"seeds": [0, 1], "stage": 1, "guidance_scale": 2.0}),
    ]) + "\n"
    monkeypatch.setattr("sys.stdin", io.StringIO(requests))
    serve_cli.main(["--best_model_path", str(arun),
                    "--diffusion_path", str(lrun),
                    "--output_dir", str(out), "--batch_size", "2"])
    assert (out / "signals_0.npy").exists()
    assert not (out / "signals_1.npy").exists()  # errored, loop survived
    assert (out / "signals_2.npy").exists()
    lines = capsys.readouterr().out.strip().splitlines()
    assert any('"error"' in l and '"request": 1' in l for l in lines)


def test_serve_cli_pipelined(cond_serve_dirs, tmp_path, monkeypatch, capsys):
    """--pipeline double-buffering: every request's artifacts land (the
    held in-flight request is finalized at EOF), error requests are
    reported without disturbing the held-request ordering, and outputs
    match the strict request/response mode per seed."""
    import io
    import json

    import numpy as np

    from sleepgen.cli import serve as serve_cli

    arun, lrun = cond_serve_dirs
    requests = "\n".join([
        json.dumps({"seeds": [0, 1], "stage": 2}),
        json.dumps({"seeds": [0, 1]}),  # no stage: error line, no artifact
        json.dumps({"seeds": [2, 3], "stage": 1}),
        json.dumps({"seeds": [4, 5], "stage": 2}),
    ]) + "\n"
    outs = {}
    for mode, flags in [("strict", []), ("pipe", ["--pipeline"])]:
        out = tmp_path / mode
        monkeypatch.setattr("sys.stdin", io.StringIO(requests))
        serve_cli.main(["--best_model_path", str(arun),
                        "--diffusion_path", str(lrun),
                        "--output_dir", str(out), "--batch_size", "2"]
                       + flags)
        assert not (out / "signals_1.npy").exists()
        outs[mode] = [np.load(out / f"signals_{i}.npy") for i in (0, 2, 3)]
    for a, b in zip(outs["strict"], outs["pipe"]):
        np.testing.assert_array_equal(a, b)
    assert any('"request": 1' in l and '"error"' in l
               for l in capsys.readouterr().out.splitlines())


def test_validate_stage_contract():
    """Shared CLI/service validation: missing/out-of-range stages and
    guidance-on-unconditional are rejected instead of silently degrading
    (negative stage = CFG null branch, overlarge = Embed clamps to the
    last class, guidance without classes = no-op)."""
    from sleepgen.sample.samplers import validate_stage

    validate_stage(5, 0)
    validate_stage(5, 4, guidance_scale=2.0)
    validate_stage(0, None)
    for num_classes, stage, gs in [(5, None, 1.0), (5, -1, 1.0), (5, 5, 1.0),
                                   (0, 0, 1.0), (0, None, 2.0)]:
        with pytest.raises(ValueError):
            validate_stage(num_classes, stage, gs)


def test_unconditional_tree_has_no_label_params():
    cfg = Config()
    cfg.unet.model_channels = 16
    cfg.unet.norm_num_groups = 8
    cfg.unet.channel_mult = [1, 2]
    cfg.unet.attention_resolutions = [2]
    unet = build_unet(cfg, 1, 1, jnp.float32)
    params = jit_init(unet, jax.random.PRNGKey(0),
                       jnp.zeros((2, 256, 1), jnp.float32),
                       jnp.zeros((2,), jnp.int32))["params"]
    assert "label_emb" not in params, (
        "num_classes=0 must keep the reference-parity unconditional tree")
