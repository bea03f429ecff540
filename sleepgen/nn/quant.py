"""Int8 quantized inference path (sampling-only).

v5e's MXU has 2x int8 throughput vs bf16 (394 vs 197 TOPS); the DDIM
sampler is compute-bound on its 1-D convolutions (benches/sweep_sampler:
the 200-step UNet scan is ~98% of sample time), so quantizing conv
weights to int8 with per-output-channel scales and activations to int8
with a dynamic per-tensor scale roughly doubles the MXU ceiling of the
hot path. Everything the reference found numerically fragile stays in
fp32 (GroupNorm statistics, softmax, scheduler math).

Scheme:
  * weights: symmetric per-output-channel int8, scale = amax/127,
    converted offline from trained fp32 params (quantize_unet_params);
  * activations: symmetric per-tensor int8 with the scale computed from
    the live tensor (dynamic quantization — robust across the wide
    activation-range drift of diffusion timesteps);
  * k-tap convs become ONE int8 matmul on the (B, L, k*Cin) im2col stack,
    accumulated in int32 on the MXU, dequantized once.

This is beyond-reference capability: the reference samples in fp32 eager
PyTorch (src/sample_trials.py:149-163). Quality is gated by the FID/PSD
harness (scripts/demo_synthetic_e2e.py --quant).

MEASURED RESULT (v5e, round 2, benches/quant_sampler.py): int8 is SLOWER
than bf16 for this model — 35.5 vs 47.1 windows/s at batch 64. The dynamic
activation quantization adds a full-tensor reduce per conv and the im2col
stack triples activation HBM traffic; at C <= 512 the sampler becomes
HBM-bound and the 2x int8 MXU peak never materializes. The path is kept as
a tested negative result; production sampling uses bf16 fast-math
(UNet1d.fast_math / config.fast_sampling_math) instead. See BASELINE.md
"Int8 quantized sampling".
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sleepgen.nn.layers import Dtype


def quantize_kernel_per_cout(w: np.ndarray) -> Dict[str, np.ndarray]:
    """fp32 conv kernel (k, cin, cout) -> int8 kernel + per-cout scale."""
    w = np.asarray(w, np.float32)
    amax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)))  # (cout,)
    scale = np.maximum(amax, 1e-12) / 127.0
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"kernel_q": wq, "kernel_scale": scale.astype(np.float32)}


def _act_quantize(x: jnp.ndarray):
    """Dynamic symmetric per-tensor int8 activation quantization."""
    xf = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / a_scale), -127.0, 127.0).astype(jnp.int8)
    return xq, a_scale


class QuantConv1d(nn.Module):
    """Drop-in int8 replacement for layers.conv1d (stride 1, SAME pad).

    Params (produced offline by :func:`quantize_unet_params`, never
    trained): ``kernel_q`` int8 (k, cin, cout), ``kernel_scale`` (cout,)
    fp32, ``bias`` (cout,) fp32.
    """

    features: int
    kernel: int = 3
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, cin = x.shape
        k = self.kernel
        wq = self.param("kernel_q", nn.initializers.zeros,
                        (k, cin, self.features), jnp.int8)
        ws = self.param("kernel_scale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)

        xq, a_scale = _act_quantize(x)
        if k > 1:
            # im2col: zero pad (quantized zero is exactly 0) and stack taps
            # along channels -> one big int8 MXU matmul
            pad = k // 2
            xp = jnp.pad(xq, ((0, 0), (pad, pad), (0, 0)))
            taps = [xp[:, d : d + l, :] for d in range(k)]
            xq = jnp.concatenate(taps, axis=-1)  # (B, L, k*cin)
        acc = jax.lax.dot_general(
            xq, wq.reshape(k * cin, self.features),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (B, L, cout) int32
        y = acc.astype(jnp.float32) * (a_scale * ws)
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


def quantize_unet_params(params: Any) -> Any:
    """Trained UNet1d fp32 params -> the QuantConv1d tree expected by
    ``UNet1d(quantized=True)``. Conv kernels (ndim 3) become int8 +
    per-cout scales; Dense/GroupNorm params pass through unchanged."""
    def convert(node):
        if isinstance(node, dict):
            if "kernel" in node and np.ndim(node["kernel"]) == 3:
                out = quantize_kernel_per_cout(np.asarray(node["kernel"]))
                if "bias" in node:
                    out["bias"] = np.asarray(node["bias"], np.float32)
                return out
            return {k: convert(v) for k, v in node.items()}
        return node

    return jax.tree_util.tree_map(
        lambda x: x, convert(jax.device_get(dict(params))))
