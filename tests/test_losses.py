"""Loss parity tests vs independent torch/numpy formulations."""
import jax.numpy as jnp
import numpy as np
import torch

from sleepgen.losses import (
    discriminator_adv_loss,
    generator_adv_loss,
    jukebox_loss,
    kl_gaussian,
)


def test_jukebox_matches_torch_fft():
    """MONAI JukeboxLoss(spatial_dims=1, reduction='sum') semantics:
    sum((|fft(target)| - |fft(input)|)^2) with ortho norm."""
    rng = np.random.default_rng(0)
    recon = rng.normal(size=(4, 1, 128)).astype(np.float32)  # (B, C, L)
    target = rng.normal(size=(4, 1, 128)).astype(np.float32)

    def torch_amp(x):
        xf = torch.fft.fftn(torch.from_numpy(x), dim=(-1,), norm="ortho")
        return torch.sqrt(xf.real**2 + xf.imag**2)

    want = torch.nn.functional.mse_loss(
        torch_amp(target), torch_amp(recon), reduction="sum"
    ).item()

    # sleepgen layout is (B, L, C)
    got = jukebox_loss(
        jnp.asarray(recon.transpose(0, 2, 1)),
        jnp.asarray(target.transpose(0, 2, 1)),
        axis=-2,
        reduction="sum",
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_lsgan_losses_match_torch():
    rng = np.random.default_rng(1)
    logits_fake = rng.normal(size=(4, 94, 1)).astype(np.float32)
    logits_real = rng.normal(size=(4, 94, 1)).astype(np.float32)

    def torch_ls(x, real):
        xt = torch.nn.functional.leaky_relu(torch.from_numpy(x), 0.05)
        tgt = torch.full_like(xt, 1.0 if real else 0.0)
        return torch.nn.functional.mse_loss(xt, tgt).item()

    g = generator_adv_loss(jnp.asarray(logits_fake))
    np.testing.assert_allclose(float(g), torch_ls(logits_fake, True), rtol=1e-5)

    d = discriminator_adv_loss(jnp.asarray(logits_fake), jnp.asarray(logits_real))
    want = 0.5 * (torch_ls(logits_fake, False) + torch_ls(logits_real, True))
    np.testing.assert_allclose(float(d), want, rtol=1e-5)


def test_kl_matches_reference_contraction():
    """Reference train_autoencoderkl.py:210-211: sum over (C, L), mean over B."""
    rng = np.random.default_rng(2)
    mu = rng.normal(size=(4, 1, 768)).astype(np.float32)
    sigma = np.abs(rng.normal(size=(4, 1, 768))).astype(np.float32) + 0.1

    mu_t, sg_t = torch.from_numpy(mu), torch.from_numpy(sigma)
    kl = 0.5 * torch.sum(mu_t.pow(2) + sg_t.pow(2) - torch.log(sg_t.pow(2)) - 1, dim=[1])
    want = (torch.sum(kl) / kl.shape[0]).item()

    got = kl_gaussian(jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(sigma.transpose(0, 2, 1)))
    np.testing.assert_allclose(float(got), want, rtol=1e-4)
