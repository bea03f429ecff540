"""Int8 quantized inference path tests (sleepgen.nn.quant)."""
import jax
from sleepgen.utils import jit_init
import jax.numpy as jnp
import numpy as np
import pytest

from sleepgen.nn import UNet1d
from sleepgen.nn.quant import (QuantConv1d, quantize_kernel_per_cout,
                               quantize_unet_params)


def test_quant_conv_matches_fp_within_quantization_step():
    """int8 conv vs fp conv: error bounded by the weight/activation
    quantization steps (int32 accumulation adds none)."""
    rng = np.random.default_rng(0)
    k, cin, cout, b, l = 3, 8, 16, 2, 32
    w_int = rng.integers(-5, 6, size=(k, cin, cout)).astype(np.float32)
    x_int = rng.integers(-7, 8, size=(b, l, cin)).astype(np.float32)
    bias = rng.normal(size=(cout,)).astype(np.float32)

    q = quantize_kernel_per_cout(w_int)
    # reconstruction error bounded by half a quantization step per weight
    step = q["kernel_scale"][None, None, :]
    err = np.abs(q["kernel_q"].astype(np.float32) * q["kernel_scale"] - w_int)
    assert np.all(err <= 0.5 * step + 1e-7)

    m = QuantConv1d(cout, k, dtype=jnp.float32)
    params = {"kernel_q": q["kernel_q"], "kernel_scale": q["kernel_scale"],
              "bias": bias}
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x_int)))

    # fp reference conv (SAME, stride 1)
    from flax import linen as nn

    ref = nn.Conv(cout, (k,), padding="SAME", param_dtype=jnp.float32)
    want = np.asarray(ref.apply(
        {"params": {"kernel": jnp.asarray(w_int), "bias": jnp.asarray(bias)}},
        jnp.asarray(x_int)))
    # elementwise error is bounded by the weight+activation quantization
    # steps; check the aggregate relative L2 (near-zero outputs make
    # elementwise rtol meaningless)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, f"relative L2 error {rel:.4f}"


def test_quantized_unet_close_to_fp():
    """UNet1d(quantized=True) on converted params tracks the fp forward
    within a few percent relative L2 — the static accuracy gate before the
    FID-gated demo comparison."""
    rng = jax.random.PRNGKey(0)
    unet = UNet1d(in_channels=1, out_channels=1, model_channels=16,
                  channel_mult=(1, 2), num_res_blocks=2,
                  attention_resolutions=(2,), num_groups=8)
    x = jax.random.normal(rng, (2, 64, 1), jnp.float32)
    t = jnp.array([100, 900], jnp.int32)
    params = jit_init(unet, rng, x, t)["params"]
    ref = np.asarray(jax.jit(unet.apply)({"params": params}, x, t))

    qunet = UNet1d(in_channels=1, out_channels=1, model_channels=16,
                   channel_mult=(1, 2), num_res_blocks=2,
                   attention_resolutions=(2,), num_groups=8,
                   quantized=True, dtype=jnp.float32)
    qparams = quantize_unet_params(params)
    got = np.asarray(jax.jit(qunet.apply)({"params": qparams}, x, t))

    assert got.shape == ref.shape
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
    assert rel < 0.05, f"relative L2 error {rel:.4f}"


def test_quantize_unet_params_keeps_dense_and_norms():
    unet = UNet1d(in_channels=1, out_channels=1, model_channels=16,
                  channel_mult=(1, 2), num_res_blocks=1,
                  attention_resolutions=(), num_groups=8)
    rng = jax.random.PRNGKey(0)
    params = jit_init(unet, rng, jnp.zeros((1, 32, 1)), jnp.zeros((1,), jnp.int32))["params"]
    q = quantize_unet_params(params)
    # dense layers untouched
    np.testing.assert_array_equal(q["time_dense_1"]["kernel"],
                                  params["time_dense_1"]["kernel"])
    # conv kernels converted
    assert q["conv_in"]["kernel_q"].dtype == np.int8
    assert "kernel" not in q["conv_in"]
    assert q["conv_in"]["kernel_scale"].shape == (16,)
