"""First-generation (v1) pipeline component tests."""
import jax
from sleepgen.utils import jit_init
import jax.numpy as jnp
import numpy as np

from sleepgen.diffusion.ddpm_v1 import (
    DDPMTables,
    p_losses,
    p_sample,
    q_posterior,
    q_sample,
)
from sleepgen.nn.aekl_v1 import AutoencoderKLV1, VAEDownsample


def test_ddpm_tables_match_reference_math():
    """Closed-form check of the registered-buffer tables (ldm.py:132-233)."""
    tbl = DDPMTables.create("linear", 1000, 0.0015, 0.0195)
    betas = np.linspace(0.0015**0.5, 0.0195**0.5, 1000) ** 2  # ldm 'linear'
    acp = np.cumprod(1 - betas)
    acp_prev = np.append(1.0, acp[:-1])
    np.testing.assert_allclose(np.asarray(tbl.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tbl.alphas_cumprod), acp, rtol=1e-5)
    post_var = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(np.asarray(tbl.posterior_variance), post_var,
                               rtol=1e-4)
    with np.errstate(divide="ignore", invalid="ignore"):  # post_var[0] == 0
        lvlb = betas**2 / (2 * post_var * (1 - betas) * (1 - acp))
    lvlb[0] = lvlb[1]
    np.testing.assert_allclose(np.asarray(tbl.lvlb_weights), lvlb, rtol=1e-4)


def test_q_sample_and_posterior():
    tbl = DDPMTables.create("linear", 100, 0.0015, 0.0195)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 16, 1)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(2, 16, 1)).astype(np.float32))
    t = jnp.asarray([10, 90])
    x_t = q_sample(tbl, x0, t, eps)
    assert x_t.shape == x0.shape
    mean, var, logvar = q_posterior(tbl, x0, x_t, t)
    np.testing.assert_allclose(np.asarray(jnp.exp(logvar)), np.asarray(var),
                               rtol=1e-4)


def test_p_losses_perfect_model_is_zero_simple_loss():
    tbl = DDPMTables.create("linear", 100, 0.0015, 0.0195)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(2, 16, 1)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(2, 16, 1)).astype(np.float32))
    t = jnp.asarray([5, 50])

    loss, aux = p_losses(tbl, lambda x, tt: eps, x0, t, eps)
    np.testing.assert_allclose(float(aux["loss_simple"]), 0.0, atol=1e-10)

    # eps-parameterization recovery inside p_sample: perfect eps at t=0
    # yields the posterior mean of the true x0
    x_t = q_sample(tbl, x0, jnp.asarray([0, 0]), eps)
    out = p_sample(tbl, lambda x, tt: eps, x_t, jnp.asarray([0, 0]),
                   jnp.zeros_like(x0), clip_denoised=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_aekl_v1_shapes():
    m = AutoencoderKLV1(embed_dim=3, n_channels=4, z_channels=3,
                        ch_mult=(1, 2), num_res_blocks=1, resolution=256,
                        num_groups=4)
    x = jnp.zeros((2, 256, 1))
    rng = jax.random.PRNGKey(0)
    params = jit_init(m, {"params": rng}, x, rng)
    recon, z_mu, z_sigma = m.apply(params, x, rng)
    assert z_mu.shape == (2, 128, 3)  # one downsample for ch_mult len 2
    assert recon.shape == (2, 256, 1)


def test_vae_downsample_baseline():
    m = VAEDownsample()
    x = jnp.asarray(np.random.default_rng(0).random((2, 3072, 1)), jnp.float32)
    z = m.get_ldm_inputs(x)
    assert z.shape == (2, 768, 1)
    rec = m.reconstruct_ldm_outputs(z)
    assert rec.shape == (2, 3072, 1)
