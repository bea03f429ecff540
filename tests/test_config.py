"""Config loader tests — including reading the reference repo's YAMLs
unchanged (the published configs must work as-is)."""
from pathlib import Path

import pytest

from sleepgen.config import Config, load_config

REF_CFG = Path("/root/reference/config")


def test_default_config_roundtrip(tmp_path):
    cfg = Config()
    cfg.aekl.num_channels = [4, 4, 16]
    cfg.spectral = True
    cfg.to_yaml(tmp_path / "c.yaml")
    back = Config.from_yaml(tmp_path / "c.yaml")
    assert back.aekl.num_channels == [4, 4, 16]
    assert back.spectral is True
    assert back.losses.kl_weight == cfg.losses.kl_weight


def test_sleepgen_shipped_configs_load():
    """Every shipped config loads; the set mirrors all 11 reference YAMLs."""
    base = Path(__file__).parent.parent / "sleepgen" / "configs"
    shipped = sorted(p.name for p in base.glob("*.yaml"))
    assert len(shipped) == 11, shipped
    for name in shipped:
        cfg = Config.from_yaml(base / name)
        assert cfg.train.batch_size > 0
    spec = Config.from_yaml(base / "aekl_eeg_2_2_4_spec.yaml")
    assert spec.train.n_epochs == 1000  # only diff vs aekl_eeg_2_2_4
    assert Config.from_yaml(base / "aekl_eeg_retraining.yaml").train.run_dir \
        == "aekl_eeg_retraining"
    for variant, suffix in (("", ""), ("_b", "_b"), ("_c", "_c")):
        ss = Config.from_yaml(base / f"sleep_stage{variant}.yaml")
        assert ss.train.seed == 1996
        assert ss.train.run_dir == f"sleep_stage_chambon{suffix}"
    ldm = Config.from_yaml(base / "ldm.yaml")
    assert ldm.unet.model_channels == 128
    assert ldm.diffusion.sample_prediction_type == "v_prediction"
    assert ldm.diffusion.sample_beta_end == 0.0205


@pytest.mark.skipif(not REF_CFG.exists(), reason="reference tree unavailable")
def test_reference_yaml_schema_loads():
    """The reference's own config files load with correct values
    (train_autoencoderkl.py:107 / train_ldm.py:108 equivalents)."""
    aekl = load_config(REF_CFG / "config_aekl_eeg.yaml")
    assert aekl.train.batch_size == 2048
    assert aekl.train.val_interval == 50
    assert aekl.losses.optimizer_g_lr == 0.005
    assert aekl.losses.spectral_weight == 1e4
    assert aekl.aekl.norm_num_groups == 1
    assert aekl.aekl.attention_levels == [False, False, False]

    ldm = load_config(REF_CFG / "config_ldm.yaml")
    assert ldm.train.batch_size == 1024
    assert ldm.train.val_interval == 50  # eval_freq mapped
    assert ldm.unet.model_channels == 128
    assert ldm.unet.channel_mult == [1, 2, 4]
    assert ldm.diffusion.linear_start == 0.0015
    assert ldm.diffusion.linear_end == 0.0195
    assert ldm.diffusion.prediction_type == "epsilon"

    small = load_config(REF_CFG / "config_aekl_eeg_2_2_4.yaml")
    assert small.aekl.num_channels == [2, 2, 4]
    assert small.train.batch_size == 16


def test_override_paths():
    cfg = load_config(
        Path(__file__).parent.parent / "sleepgen" / "configs" / "ldm.yaml",
        **{"train.batch_size": 64, "unet.model_channels": 32})
    assert cfg.train.batch_size == 64
    assert cfg.unet.model_channels == 32


def test_default_diffusion_config_preserves_reference_quirk():
    """The reference trains with eps/linear-beta 0.0015->0.0195
    (train_ldm.py:199-200) but samples with v-prediction/scaled-linear
    0.0015->0.0205 (sample_trials.py:136-143). SURVEY.md flags this
    mismatch as load-bearing for its FID; it must stay the default."""
    cfg = Config()
    assert cfg.diffusion.beta_schedule == "linear_beta"
    assert cfg.diffusion.prediction_type == "epsilon"
    assert cfg.diffusion.linear_end == 0.0195
    assert cfg.diffusion.sample_schedule == "scaled_linear_beta"
    assert cfg.diffusion.sample_prediction_type == "v_prediction"
    assert cfg.diffusion.sample_beta_end == 0.0205
    assert cfg.diffusion.num_inference_steps == 200
    assert cfg.diffusion.sampler == "ddim"  # parity default
