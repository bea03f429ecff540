"""Least-squares patch-adversarial loss (LSGAN).

Parity target: MONAI-generative ``PatchAdversarialLoss(criterion=
"least_squares")`` as used at reference ``src/train_autoencoderkl.py:156,
214, 225-231``. That implementation applies LeakyReLU(0.05) to the logits
(its default ``no_activation_leastsq=False``) and then an MSE against a
constant real(1.0)/fake(0.0) map, with mean reduction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

REAL_LABEL = 1.0
FAKE_LABEL = 0.0


def _least_squares(logits: jnp.ndarray, target_is_real: bool, activate: bool) -> jnp.ndarray:
    x = logits.astype(jnp.float32)
    if activate:
        x = jax.nn.leaky_relu(x, negative_slope=0.05)
    target = REAL_LABEL if target_is_real else FAKE_LABEL
    return jnp.mean((x - target) ** 2)


def generator_adv_loss(logits_fake: jnp.ndarray, activate: bool = True) -> jnp.ndarray:
    """Generator side: push D(fake) toward the real label."""
    return _least_squares(logits_fake, target_is_real=True, activate=activate)


def discriminator_adv_loss(
    logits_fake: jnp.ndarray, logits_real: jnp.ndarray, activate: bool = True
) -> jnp.ndarray:
    """Discriminator side: 0.5*(MSE(D(fake),0) + MSE(D(real),1)), matching
    reference ``src/train_autoencoderkl.py:225-229``."""
    loss_fake = _least_squares(logits_fake, target_is_real=False, activate=activate)
    loss_real = _least_squares(logits_real, target_is_real=True, activate=activate)
    return 0.5 * (loss_fake + loss_real)
