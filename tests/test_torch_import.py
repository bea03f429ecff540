"""Numerical architecture-parity tests: load the reference's own torch
modules (read-only, as test oracles), convert their random-init weights
with sleepgen.utils.torch_import, and require matching forward outputs.
This is the strongest evidence that UNet1d / AutoencoderKLV1 reproduce the
reference architectures (src/models/unet.py, src/models/ae_kl.py)."""
import importlib.util
import sys
from pathlib import Path

import jax
from sleepgen.utils import jit_init
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF = Path("/root/reference/src")


def _load_ref_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_unet_mod():
    if not (REF / "models/unet.py").exists():
        pytest.skip("reference tree unavailable")
    return _load_ref_module("ref_unet", REF / "models/unet.py")


@pytest.fixture(scope="module")
def ref_aekl_mod():
    if not (REF / "models/ae_kl.py").exists():
        pytest.skip("reference tree unavailable")
    return _load_ref_module("ref_ae_kl", REF / "models/ae_kl.py")


def test_unet1d_matches_reference_torch(ref_unet_mod):
    from sleepgen.nn import UNet1d
    from sleepgen.utils.torch_import import import_unet1d

    torch.manual_seed(0)
    tm = ref_unet_mod.UNetModel(
        image_size=256, in_channels=1, out_channels=1, model_channels=32,
        num_res_blocks=2, attention_resolutions=[8, 4], channel_mult=(1, 2, 4),
        conv_resample=True, num_heads=1, use_scale_shift_norm=False,
        resblock_updown=True,
    ).eval()

    x = np.random.default_rng(0).normal(size=(2, 1, 256)).astype(np.float32)
    t = np.array([17, 431], dtype=np.int64)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), timesteps=torch.from_numpy(t)).numpy()

    fm = UNet1d(in_channels=1, out_channels=1, model_channels=32,
                channel_mult=(1, 2, 4), num_res_blocks=2,
                attention_resolutions=(8, 4), num_heads=1,
                use_scale_shift_norm=False, resblock_updown=True)
    variables = import_unet1d(tm.state_dict(), channel_mult=(1, 2, 4),
                              num_res_blocks=2, attention_resolutions=(8, 4))
    # validate the tree is complete against a fresh init — eval_shape
    # gives the same tree paths without compiling/running the init graph
    ref_init = jax.eval_shape(fm.init, jax.random.PRNGKey(0),
                              jnp.asarray(x.transpose(0, 2, 1)),
                              jnp.asarray(t))
    want_paths = set(jax.tree_util.tree_map(lambda _: 0, ref_init))
    flat_a = jax.tree_util.tree_leaves_with_path(ref_init)
    flat_b = jax.tree_util.tree_leaves_with_path(variables)
    paths_a = {jax.tree_util.keystr(p) for p, _ in flat_a}
    paths_b = {jax.tree_util.keystr(p) for p, _ in flat_b}
    assert paths_a == paths_b, (
        f"missing: {sorted(paths_a - paths_b)[:5]} extra: {sorted(paths_b - paths_a)[:5]}")

    got = np.asarray(jax.jit(fm.apply)(variables, jnp.asarray(x.transpose(0, 2, 1)),
                                        jnp.asarray(t)))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, rtol=2e-3, atol=2e-4)


def test_aekl_v1_matches_reference_torch(ref_aekl_mod):
    from sleepgen.nn.aekl_v1 import AutoencoderKLV1
    from sleepgen.utils.torch_import import import_aekl_v1

    torch.manual_seed(1)
    hparams = dict(in_channels=1, out_channels=1, n_channels=32, z_channels=3,
                   ch_mult=(1, 2), num_res_blocks=1, resolution=(256,),
                   attn_resolutions=(128,))
    tm = ref_aekl_mod.AutoencoderKL(embed_dim=3, hparams=hparams).eval()

    x = np.random.default_rng(1).normal(size=(2, 1, 256)).astype(np.float32)
    with torch.no_grad():
        mu_t, sigma_t = tm.encode(torch.from_numpy(x))
        dec_t = tm.decode(mu_t)

    fm = AutoencoderKLV1(embed_dim=3, n_channels=32, z_channels=3,
                         ch_mult=(1, 2), num_res_blocks=1, resolution=256,
                         attn_resolutions=(128,), num_groups=32)
    variables = import_aekl_v1(tm.state_dict(), ch_mult=(1, 2),
                               num_res_blocks=1, resolution=256,
                               attn_resolutions=(128,))
    x_f = jnp.asarray(x.transpose(0, 2, 1))
    mu_f, sigma_f = jax.jit(lambda v, a: fm.apply(v, a, method=AutoencoderKLV1.encode))(variables, x_f)
    np.testing.assert_allclose(np.asarray(mu_f).transpose(0, 2, 1),
                               mu_t.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sigma_f).transpose(0, 2, 1),
                               sigma_t.numpy(), rtol=2e-3, atol=2e-4)
    dec_f = jax.jit(lambda v, a: fm.apply(v, a, method=AutoencoderKLV1.decode))(variables, mu_f)
    np.testing.assert_allclose(np.asarray(dec_f).transpose(0, 2, 1),
                               dec_t.numpy(), rtol=2e-3, atol=2e-4)


def test_strip_module_prefix():
    from sleepgen.utils.torch_import import strip_module_prefix

    sd = {"module.a.weight": 1, "module.b.bias": 2}
    assert set(strip_module_prefix(sd)) == {"a.weight", "b.bias"}
    sd2 = {"a.weight": 1}
    assert strip_module_prefix(sd2) == sd2


def test_usleep_matches_reference_torch():
    """USleep forward parity: reference torch model (eval mode, random
    init incl. BN running stats) vs flax with imported weights."""
    if not (REF / "models/usleep.py").exists():
        pytest.skip("reference tree unavailable")
    mod = _load_ref_module("ref_usleep", REF / "models/usleep.py")
    from sleepgen.nn import USleep
    from sleepgen.utils.torch_import import import_usleep

    torch.manual_seed(2)
    depth = 4
    tm = mod.USleep(in_chans=2, sfreq=100, depth=depth, n_classes=5,
                    input_size_s=30).eval()
    # give BN stats non-trivial values
    with torch.no_grad():
        for m_ in tm.modules():
            if isinstance(m_, torch.nn.BatchNorm1d):
                m_.running_mean.uniform_(-0.5, 0.5)
                m_.running_var.uniform_(0.5, 1.5)

    x = np.random.default_rng(3).normal(size=(2, 2, 3000)).astype(np.float32)
    with torch.no_grad():
        y_t, dec_t, bottom_t = tm(torch.from_numpy(x))

    fm = USleep(in_chans=2, sfreq=100, depth=depth, n_classes=5,
                input_size_s=30)
    variables = import_usleep(tm.state_dict(), depth=depth)
    y_f, dec_f, bottom_f = jax.jit(lambda v, a: fm.apply(v, a, train=False))(
        variables, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(bottom_f).transpose(0, 2, 1),
                               bottom_t.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y_f), y_t.numpy(), rtol=2e-3,
                               atol=2e-4)


def test_chambon_matches_reference_checkpoint():
    """Forward parity against the reference's REAL trained checkpoint
    (outputs/sleep_stage_chambon_b/final_model.pth — n_chans=2,
    pad_size_s=0.1, apply_batch_norm=True): torch forward replayed with
    functional ops vs our flax model with imported weights."""
    ckpt = Path("/root/reference/outputs/sleep_stage_chambon_b/final_model.pth")
    if not ckpt.exists():
        pytest.skip("reference checkpoint unavailable")
    sd = torch.load(ckpt, map_location="cpu")

    import torch.nn.functional as F

    def torch_forward(x):  # x: (B, C, T)
        h = x.unsqueeze(1)  # (B,1,C,T)
        h = F.conv2d(h, sd["spatial_conv.weight"], sd["spatial_conv.bias"])
        h = h.transpose(1, 2)  # (B,1',V? ...) -> braindecode transposes to (B,1,V,T)
        h = F.conv2d(h, sd["feature_extractor.0.weight"],
                     sd["feature_extractor.0.bias"], padding=(0, 10))
        h = F.batch_norm(h, sd["feature_extractor.1.running_mean"],
                         sd["feature_extractor.1.running_var"],
                         sd["feature_extractor.1.weight"],
                         sd["feature_extractor.1.bias"], training=False)
        h = F.relu(h)
        h = F.max_pool2d(h, (1, 13))
        h = F.conv2d(h, sd["feature_extractor.4.weight"],
                     sd["feature_extractor.4.bias"], padding=(0, 10))
        h = F.batch_norm(h, sd["feature_extractor.5.running_mean"],
                         sd["feature_extractor.5.running_var"],
                         sd["feature_extractor.5.weight"],
                         sd["feature_extractor.5.bias"], training=False)
        h = F.relu(h)
        h = F.max_pool2d(h, (1, 13))
        h = h.flatten(start_dim=1)
        return h @ sd["final_layer.1.weight"].T + sd["final_layer.1.bias"]

    x = np.random.default_rng(4).normal(size=(2, 2, 3000)).astype(np.float32)
    with torch.no_grad():
        want = torch_forward(torch.from_numpy(x)).numpy()

    from sleepgen.nn.chambon import SleepStagerChambon2018
    from sleepgen.utils.torch_import import import_chambon

    fm = SleepStagerChambon2018(n_chans=2, sfreq=100, apply_batch_norm=True,
                                pad_size_s=0.1)
    variables = import_chambon(sd)
    got = np.asarray(jax.jit(lambda v, a: fm.apply(v, a, train=False))(
        variables, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_monai_aekl_name_map_roundtrip():
    """export_aekl_monai -> import_aekl_monai is the identity on the
    flagship AutoencoderKL param tree (pins the monai-generative name map
    and the full key coverage)."""
    from sleepgen.nn import AutoencoderKL
    from sleepgen.utils.torch_import import export_aekl_monai, import_aekl_monai

    m = AutoencoderKL(num_channels=(4, 4, 8), latent_channels=3)
    x = jnp.zeros((1, 256, 1))
    rng = jax.random.PRNGKey(0)
    variables = {"params": jax.device_get(
        jit_init(m, {"params": rng}, x, rng)["params"])}

    sd = export_aekl_monai(variables, num_channels=(4, 4, 8))
    back = import_aekl_monai(sd, num_channels=(4, 4, 8))

    flat_a = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(variables)}
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    assert set(flat_a) == set(flat_b), (
        sorted(set(flat_a) ^ set(flat_b))[:6])
    for k in flat_a:
        np.testing.assert_allclose(flat_a[k], flat_b[k], rtol=1e-6, err_msg=k)

    # the imported tree must run
    out = jax.jit(m.apply)(back, x, rng)
    assert out[0].shape == (1, 256, 1)


def test_unet1d_export_roundtrip_and_pth(tmp_path):
    """export_unet1d -> import_unet1d is the identity (pins the reference
    UNetModel name map both ways), and save_state_dict_pth writes a file
    torch.load can consume — the reference-tooling interop loop."""
    from sleepgen.nn import UNet1d
    from sleepgen.utils.torch_export import export_unet1d, save_state_dict_pth
    from sleepgen.utils.torch_import import import_unet1d

    m = UNet1d(in_channels=1, out_channels=1, model_channels=16,
               channel_mult=(1, 2), num_res_blocks=2,
               attention_resolutions=(2,), num_groups=8)
    variables = {"params": jax.device_get(jit_init(m,
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 1)),
        jnp.zeros((1,), jnp.int32))["params"])}

    sd = export_unet1d(variables, channel_mult=(1, 2), num_res_blocks=2,
                       attention_resolutions=(2,))
    back = import_unet1d(sd, channel_mult=(1, 2), num_res_blocks=2,
                         attention_resolutions=(2,))

    flat_a = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(variables)}
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    assert set(flat_a) == set(flat_b), sorted(set(flat_a) ^ set(flat_b))[:6]
    for k in flat_a:
        np.testing.assert_allclose(flat_a[k], flat_b[k], rtol=1e-6, err_msg=k)

    import torch

    p = save_state_dict_pth(sd, tmp_path / "best_model.pth")
    loaded = torch.load(p)
    assert set(loaded) == set(sd)
    np.testing.assert_allclose(loaded["out.2.weight"].numpy(), sd["out.2.weight"])


def test_import_aekl_monai_strict_guard():
    """A state_dict with extra (layout-drifted) keys must fail loudly
    instead of partially loading (ADVICE r1)."""
    from sleepgen.nn import AutoencoderKL
    from sleepgen.utils.torch_import import export_aekl_monai, import_aekl_monai

    m = AutoencoderKL(num_channels=(4, 4, 8), latent_channels=1)
    x = jnp.zeros((1, 256, 1))
    rng = jax.random.PRNGKey(0)
    variables = {"params": jax.device_get(
        jit_init(m, {"params": rng}, x, rng)["params"])}
    sd = export_aekl_monai(variables, num_channels=(4, 4, 8))

    sd_extra = dict(sd)
    sd_extra["encoder.blocks.99.conv.weight"] = np.zeros((1, 1, 3), np.float32)
    with pytest.raises(KeyError, match="not consumed"):
        import_aekl_monai(sd_extra, num_channels=(4, 4, 8))
    # non-strict keeps the old permissive behavior
    import_aekl_monai(sd_extra, num_channels=(4, 4, 8), strict=False)
    # missing keys raise regardless
    sd_missing = {k: v for k, v in sd.items() if k != "post_quant_conv.conv.weight"}
    with pytest.raises(KeyError):
        import_aekl_monai(sd_missing, num_channels=(4, 4, 8))


REF_DECODE_A = Path("/root/reference/outputs/sleep_stage_chambon/final_model.pth")


@pytest.mark.skipif(not REF_DECODE_A.exists(), reason="reference ckpt unavailable")
def test_chambon_sequence_real_checkpoint_runs():
    """The reference's real shipped variant-a decode checkpoint loads into
    TimeDistributedStager and produces finite 5-class logits (VERDICT r1
    item 3: exercise real reference checkpoints end-to-end)."""
    from sleepgen.nn.chambon import TimeDistributedStager
    from sleepgen.utils.torch_import import import_chambon_sequence

    sd = torch.load(REF_DECODE_A, map_location="cpu")
    variables = import_chambon_sequence(sd)
    m = TimeDistributedStager(n_chans=2, sfreq=100.0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 3000, 2)).astype(np.float32))
    logits = jax.jit(lambda v, a: m.apply(v, a, train=False))(variables, x)
    assert logits.shape == (2, 5)
    assert np.isfinite(np.asarray(logits)).all()
    # head dim must match the shipped (5, 720) Linear exactly
    assert variables["params"]["head"]["kernel"].shape == (720, 5)
