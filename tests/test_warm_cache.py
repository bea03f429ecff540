"""warm-cache CLI: the precompile targets build and lower the same graph
families training/sampling use (cold-start elimination story)."""
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_warm_cache_cli_smoke(tmp_path):
    from sleepgen.config import Config

    cfg = Config()
    cfg.dtype = "float32"
    cfg.train.batch_size = 4
    cfg.aekl.num_channels = [2, 2, 4]
    cfg.unet.model_channels = 16
    cfg.unet.norm_num_groups = 8
    cfg.unet.channel_mult = [1, 2]
    cfg.unet.attention_resolutions = [2]
    cfg.unet.image_size = 64
    cfg.diffusion.num_inference_steps = 4
    cfg_path = tmp_path / "cfg.yaml"
    cfg.to_yaml(cfg_path)

    proc = subprocess.run(
        [sys.executable, "-m", "sleepgen", "warm-cache",
         "--config_file", str(cfg_path),
         "--targets", "aekl,ldm,sampler,dpm",
         "--batch_sizes", "4", "--train_batch", "4",
         # env pinning alone is not reliably honored by this image's
         # sitecustomize; the CLI flag uses the in-process config update
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=600,
        # pin the subprocess to the virtual-CPU backend — conftest's CPU
        # forcing is in-process only and would not be inherited
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "JAX_COMPILATION_CACHE_DIR": str(tmp_path / "cache")})
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "TPU_CONTACT_OK" in out
    for label in ["aekl train step", "ldm train step",
                  "ddim-4 sampler batch 4", "dpm++2m-20 sampler batch 4"]:
        assert f"warmed {label}" in out, out


@pytest.mark.slow
def test_warm_cache_cli_conditional(tmp_path):
    """A conditional config (num_classes>0) warms the labeled train-step
    and conditional-sampler graphs its real jobs hit."""
    from sleepgen.config import Config

    cfg = Config()
    cfg.dtype = "float32"
    cfg.train.batch_size = 4
    cfg.train.cond_dropout_prob = 0.1
    cfg.aekl.num_channels = [2, 2, 4]
    cfg.unet.model_channels = 16
    cfg.unet.norm_num_groups = 8
    cfg.unet.channel_mult = [1, 2]
    cfg.unet.attention_resolutions = [2]
    cfg.unet.image_size = 64
    cfg.unet.num_classes = 5
    cfg.diffusion.num_inference_steps = 4
    cfg_path = tmp_path / "cfg.yaml"
    cfg.to_yaml(cfg_path)

    proc = subprocess.run(
        [sys.executable, "-m", "sleepgen", "warm-cache",
         "--config_file", str(cfg_path), "--targets", "ldm,sampler",
         "--batch_sizes", "4", "--train_batch", "4", "--platform", "cpu"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "JAX_COMPILATION_CACHE_DIR": str(tmp_path / "cache")})
    assert proc.returncode == 0, proc.stderr[-2000:]
    # the guided (CFG) graph is precompiled too — one traced-scale graph
    # covers every guidance_scale a client might request
    for label in ["ldm train step", "ddim-4 sampler batch 4",
                  "ddim-4 guided sampler batch 4"]:
        assert f"warmed {label}" in proc.stdout, proc.stdout
