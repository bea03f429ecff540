"""KL divergence of the VAE posterior against N(0, I).

Parity target: reference ``src/train_autoencoderkl.py:210-211``:
``0.5 * sum_i(mu^2 + sigma^2 - log sigma^2 - 1)`` summed over the channel
axis then averaged over... the reference sums over dim=[1] of a (B, C, L)
tensor — i.e. over channels only — then ``sum(kl)/kl.shape[0]`` averages
over batch but *sums* over the remaining length axis. Net effect: sum over
(C, L), mean over B. We reproduce that contraction exactly.
"""
from __future__ import annotations

import jax.numpy as jnp


def kl_gaussian(z_mu: jnp.ndarray, z_sigma: jnp.ndarray) -> jnp.ndarray:
    """Mean over batch of the summed KL. Inputs are (B, ...) in fp32."""
    z_mu = z_mu.astype(jnp.float32)
    z_sigma = z_sigma.astype(jnp.float32)
    var = z_sigma**2
    per_sample = 0.5 * jnp.sum(
        z_mu**2 + var - jnp.log(var) - 1.0, axis=tuple(range(1, z_mu.ndim))
    )
    return jnp.mean(per_sample)
