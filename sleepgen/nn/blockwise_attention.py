"""Blockwise (flash-style) attention for long windows.

SURVEY.md §5 long-context: the reference fixes windows at 3072 samples and
full-sequence einsum attention is trivial there (models/unet.py:97-129).
sleepgen makes sequence length a config; for multi-minute windows the
O(L^2) attention matrix stops fitting VMEM/HBM nicely, so this module
provides an online-softmax blockwise attention: a lax.scan over KV chunks
with running max/denominator, numerically identical to full softmax
attention (fp32 accumulation), O(L * block) memory.

This is the optional stretch named in SURVEY.md §5 — not needed for
reference parity, used automatically by SelfAttention1d when
``kv_block_size`` is set.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def blockwise_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, block_size: int,
) -> jnp.ndarray:
    """q, k, v: (B, L, H, D), pre-scaled like the reference's
    QKVAttentionLegacy (both q and k carry 1/sqrt(sqrt(D))).
    Returns (B, L, H, D). block_size must divide L."""
    b, l, h, d = q.shape
    assert l % block_size == 0, (
        f"kv_block_size={block_size} must divide the attention length "
        f"L={l}. The UNet attends at image_size/ds for each ds in "
        f"attention_resolutions — pick a block size dividing all of them "
        f"(powers of two are always safe for power-of-two windows).")
    n_blocks = l // block_size

    q32 = q.astype(jnp.float32)
    kv = (
        k.astype(jnp.float32).reshape(b, n_blocks, block_size, h, d),
        v.astype(jnp.float32).reshape(b, n_blocks, block_size, h, d),
    )

    def body(carry, kv_blk):
        m, denom, acc = carry  # (B,L,H,1), (B,L,H,1), (B,L,H,D)
        k_blk, v_blk = kv_blk  # (B, block, H, D)
        logits = jnp.einsum("bihd,bjhd->bhij", q32, k_blk)  # (B,H,L,block)
        logits = jnp.transpose(logits, (0, 2, 1, 3))  # (B,L,H,block)
        blk_max = jnp.max(logits, axis=-1, keepdims=True)
        new_m = jnp.maximum(m, blk_max)
        correction = jnp.exp(m - new_m)
        p = jnp.exp(logits - new_m)
        new_denom = denom * correction + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("blhj,bjhd->blhd", p, v_blk)
        new_acc = acc * correction + pv
        return (new_m, new_denom, new_acc), None

    init = (
        jnp.full((b, l, h, 1), -jnp.inf, jnp.float32),
        jnp.zeros((b, l, h, 1), jnp.float32),
        jnp.zeros((b, l, h, d), jnp.float32),
    )
    # scan over kv blocks (axis 1 of the reshaped kv)
    kv_scan = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 1, 0), kv)
    (m, denom, acc), _ = jax.lax.scan(body, init, kv_scan)
    return (acc / denom).astype(q.dtype)
