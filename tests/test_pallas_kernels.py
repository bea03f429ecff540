"""Pallas kernel correctness (interpret mode on CPU) + model-integration."""
import jax
from sleepgen.utils import jit_init
import jax.numpy as jnp
import numpy as np
import pytest

from sleepgen.pallas_kernels import fused_group_norm_silu, group_norm_silu_reference


@pytest.mark.parametrize("num_groups", [1, 4, 16])
@pytest.mark.parametrize("apply_silu", [True, False])
def test_fused_groupnorm_matches_reference(num_groups, apply_silu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=16).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=16).astype(np.float32))
    got = fused_group_norm_silu(x, scale, bias, num_groups, 1e-6, apply_silu)
    want = group_norm_silu_reference(x, scale, bias, num_groups, 1e-6, apply_silu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=2e-6)


def test_fused_groupnorm_gradients():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 8)).astype(np.float32))
    scale = jnp.ones((8,), jnp.float32)
    bias = jnp.zeros((8,), jnp.float32)

    f = lambda x, s, b: jnp.sum(fused_group_norm_silu(x, s, b, 4) ** 2)
    r = lambda x, s, b: jnp.sum(group_norm_silu_reference(x, s, b, 4) ** 2)
    g = jax.grad(f, argnums=(0, 1, 2))(x, scale, bias)
    w = jax.grad(r, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g, w):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_unet_with_pallas_norm_matches_unfused():
    """use_pallas_norm must not change model outputs or param trees."""
    from sleepgen.nn import UNet1d

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 64, 1)),
                    jnp.float32)
    t = jnp.array([3, 500])
    m0 = UNet1d(model_channels=16, channel_mult=(1, 2), num_groups=8,
                attention_resolutions=(2,), use_pallas_norm=False)
    m1 = UNet1d(model_channels=16, channel_mult=(1, 2), num_groups=8,
                attention_resolutions=(2,), use_pallas_norm=True)
    p0 = jit_init(m0, rng, x, t)
    y0 = jax.jit(m0.apply)(p0, x, t)
    y1 = jax.jit(m1.apply)(p0, x, t)  # same params by construction
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-5)


def test_tiled_group_norm_matches_reference():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sleepgen.pallas_kernels import group_norm_silu_tiled, \
        group_norm_silu_reference

    rng = jax.random.PRNGKey(3)
    for (b, l, c, g, tile) in [(2, 1024, 32, 1, 256), (2, 512, 64, 8, 128)]:
        x = jax.random.normal(jax.random.fold_in(rng, l), (b, l, c))
        scale = jax.random.normal(jax.random.fold_in(rng, 1), (c,)) + 1.0
        bias = jax.random.normal(jax.random.fold_in(rng, 2), (c,))
        y = group_norm_silu_tiled(x, scale, bias, g, tile=tile)
        y_ref = group_norm_silu_reference(x, scale, bias, g)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)


def test_fused_gn_silu_conv3_tiled_matches_reference():
    """Batch-tiled variant (merged-M matmuls, shift-after-matmul conv)
    must match the jnp reference, including tb not dividing B cleanly."""
    from sleepgen.pallas_kernels.fused_resblock import (
        fused_gn_silu_conv3_tiled, gn_silu_conv3_reference)

    rng = np.random.default_rng(7)
    for (b, l, cin, cout, g, tb) in [(8, 96, 32, 64, 32, 4),
                                     (6, 64, 16, 16, 8, 4),
                                     (4, 128, 32, 32, 1, 8)]:
        x = jnp.asarray(rng.normal(size=(b, l, cin)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, cin, cout)).astype(np.float32)
                        * 0.1)
        bb = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        y = fused_gn_silu_conv3_tiled(x, scale, bias, w, bb, g,
                                      interpret=True, tb=tb)
        want = gn_silu_conv3_reference(x, scale, bias, w, bb, g)
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_unet_with_fused_resblock_matches_unfused():
    """use_fused_resblock must not change outputs or the param tree: a
    checkpoint initialized by the unfused graph runs through the fused one
    (ConvParams/_GNParams name-compat), and vice versa."""
    from sleepgen.nn import UNet1d

    rng = jax.random.PRNGKey(4)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 64, 1)),
                    jnp.float32)
    t = jnp.array([7, 250])
    kw = dict(model_channels=16, channel_mult=(1, 2), num_groups=8,
              attention_resolutions=(2,))
    m0 = UNet1d(use_fused_resblock=False, **kw)
    m1 = UNet1d(use_fused_resblock=True, **kw)
    p0 = jit_init(m0, rng, x, t)
    p1 = jit_init(m1, rng, x, t)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    y0 = m0.apply(p0, x, t)
    y1 = m1.apply(p0, x, t)  # unfused-initialized params through fused graph
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-5)


def test_fused_gn_silu_conv3_matches_reference():
    """pallas_kernels.fused_resblock: the fused GN+SiLU+conv3 kernel must
    match the jnp reference (interpreter mode on CPU) at UNet-like shapes,
    including C_in != C_out and num_groups == 1."""
    import numpy as np
    import jax.numpy as jnp

    from sleepgen.pallas_kernels.fused_resblock import (
        fused_gn_silu_conv3, gn_silu_conv3_reference)

    rng = np.random.default_rng(3)
    for (b, l, cin, cout, g) in [(2, 96, 32, 64, 32), (3, 64, 16, 16, 8),
                                 (2, 128, 32, 32, 1)]:
        x = jnp.asarray(rng.normal(size=(b, l, cin)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, cin, cout)).astype(np.float32)
                        * 0.1)
        bb = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        y = fused_gn_silu_conv3(x, scale, bias, w, bb, g, interpret=True)
        want = gn_silu_conv3_reference(x, scale, bias, w, bb, g)
        assert y.shape == (b, l, cout)
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
