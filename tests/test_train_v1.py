"""v1 trainer smoke tests: one jitted G/D step and one DDPM-v1 step."""
import pytest
import jax
from sleepgen.utils import jit_init
import jax.numpy as jnp
import numpy as np
import optax

from sleepgen.diffusion.ddpm_v1 import DDPMTables
from sleepgen.nn.aekl_v1 import AutoencoderKLV1
from sleepgen.nn.discriminator import DiscriminatorV1
from sleepgen.nn.unet1d import UNet1d
from sleepgen.train.train_v1 import (
    init_v1_encoder_state,
    make_v1_ddpm_train_step,
    make_v1_encoder_train_step,
)


def test_v1_encoder_step():
    ae = AutoencoderKLV1(embed_dim=1, n_channels=4, z_channels=1,
                         ch_mult=(1, 2), num_res_blocks=1, resolution=256,
                         num_groups=4)
    disc = DiscriminatorV1(ndf=8, n_layers=2)
    rng = jax.random.PRNGKey(0)
    state, opt_g, opt_d = init_v1_encoder_state(ae, disc, rng, window=256)
    step = make_v1_encoder_train_step(ae, disc, opt_g, opt_d)

    x = jnp.asarray(np.random.default_rng(0).random((4, 256, 1)), jnp.float32)
    state, metrics = step(state, x, rng)
    state, metrics = step(state, x, rng)
    assert int(state.step) == 2
    for k in ("loss", "loss_d", "loss_l1", "loss_kl", "loss_g"):
        assert np.isfinite(float(metrics[k])), k


def test_v1_ddpm_step():
    ae = AutoencoderKLV1(embed_dim=1, n_channels=4, z_channels=1,
                         ch_mult=(1, 2), num_res_blocks=1, resolution=256,
                         num_groups=4)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 256, 1))
    stage1_params = jit_init(ae, {"params": rng}, x, rng)["params"]

    unet = UNet1d(in_channels=1, out_channels=1, model_channels=8,
                  channel_mult=(1, 2), attention_resolutions=(2,), num_groups=4)
    z0 = jnp.zeros((2, 128, 1))
    params = jit_init(unet, rng, z0, jnp.zeros((2,), jnp.int32))["params"]
    opt = optax.adam(2.5e-5)  # v1 base_lr config
    opt_state = opt.init(params)

    tbl = DDPMTables.create("linear", 1000, 0.0015, 0.0195)
    step = make_v1_ddpm_train_step(tbl, unet, ae, stage1_params, opt)
    batch = jnp.asarray(np.random.default_rng(1).random((4, 256, 1)), jnp.float32)
    params, opt_state, metrics = step(params, opt_state, 0, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_vlb"]))


@pytest.mark.slow
def test_v1_drivers_end_to_end(tmp_path):
    """First-generation pipeline drivers: v1 encoder then v1 DDPM over its
    frozen latents (first_version/ parity)."""
    from sleepgen.data import WindowDataset, make_synthetic_dataset
    from sleepgen.train.train_v1 import train_v1_ddpm, train_v1_encoder

    raws = make_synthetic_dataset(6, duration_s=30.0)
    train = WindowDataset.from_raw(raws[:4], window=248, pad=4)
    valid = WindowDataset.from_raw(raws[4:], window=248, pad=4)

    best, state = train_v1_encoder(
        train, valid, tmp_path / "enc", n_epochs=2, batch_size=8,
        val_interval=2, n_channels=4, embed_dim=1, z_channels=1,
        ch_mult=(1, 2), num_groups=4)
    assert np.isfinite(best)
    assert (tmp_path / "enc" / "best_model").exists()

    from sleepgen.nn.aekl_v1 import AutoencoderKLV1
    from sleepgen.nn.unet1d import UNet1d

    ae = AutoencoderKLV1(embed_dim=1, n_channels=4, z_channels=1,
                         ch_mult=(1, 2), resolution=256, num_groups=4)
    unet = UNet1d(in_channels=1, out_channels=1, model_channels=8,
                  channel_mult=(1, 2), attention_resolutions=(2,), num_groups=4)
    params = train_v1_ddpm(train, jax.device_get(state.params_g),
                           tmp_path / "ddpm", ae, n_epochs=2, batch_size=8,
                           unet=unet)
    assert params is not None
    assert (tmp_path / "ddpm" / "final_model").exists()
