"""DiffusionInferer — MONAI-generative inferer parity.

The reference uses ``generative.inferers.DiffusionInferer`` two ways:
  * training call: noise + predict in one shot
    (``src/training/training_diffusion.py:146``)
  * ``inferer.sample(...)``: full reverse loop
    (``src/sample_trials_ddpm.py:101``, ``src/util.py:277``)

Here both are thin pure functions over NoiseSchedule + a model_fn; the
sample loop is the scan sampler from sleepgen.sample.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from sleepgen.diffusion.schedules import NoiseSchedule


def inferer_call(
    sched: NoiseSchedule,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    inputs: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """Add noise at t then predict: returns model(x_t, t)."""
    noisy = sched.add_noise(inputs, noise, timesteps)
    return model_fn(noisy, timesteps)


def inferer_sample(
    sched: NoiseSchedule,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    input_noise: jnp.ndarray,
    rng: jax.Array,
    clip_sample: bool = True,
) -> jnp.ndarray:
    from sleepgen.sample.samplers import ddpm_sample_loop

    return ddpm_sample_loop(model_fn, sched, input_noise, rng, clip_sample)
