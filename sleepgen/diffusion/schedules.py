"""Noise schedules and DDPM/DDIM transition math as pure JAX functions.

TPU-native re-design of the scheduler surface used by the reference:
  * MONAI-generative ``DDPMScheduler`` / ``DDIMScheduler`` (external dep of
    the reference; instantiated at ``src/train_ldm.py:199-200`` with
    ``linear`` betas 0.0015->0.0195 and at ``src/sample_trials.py:136-145``
    with ``scaled_linear_beta`` betas 0.0015->0.0205, ``v_prediction``,
    ``set_timesteps(200)``).
  * The reference's own DDPM math (``src/models/ldm.py:37-75`` beta
    schedules, ``:392-408`` q_sample, ``:310-357`` ancestral step).

Everything here is shape-static and control-flow free so the full reverse
process compiles to a single ``lax.scan`` (see :mod:`sleepgen.diffusion.samplers`).
Schedule tables are precomputed in float64 on host (matching the reference's
float64 beta computation) and stored as float32 device constants.
"""
from __future__ import annotations

import enum
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class PredictionType(str, enum.Enum):
    EPSILON = "epsilon"
    SAMPLE = "sample"
    V_PREDICTION = "v_prediction"


def make_betas(
    schedule: str,
    num_timesteps: int,
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule table (float64 numpy, as the reference computes them).

    Supported names cover both the MONAI registry ("linear_beta",
    "scaled_linear_beta", "cosine") and the reference's own
    ``make_beta_schedule`` names ("linear", "sqrt_linear", "sqrt");
    note the reference's "linear" is MONAI's "scaled_linear_beta" family
    (sqrt-space linspace squared) while MONAI's "linear_beta" is a plain
    linspace — both are exposed explicitly here.
    """
    t = np.float64
    if schedule in ("linear_beta", "linear"):
        # MONAI DDPMScheduler(schedule="linear_beta") — plain linspace.
        betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=t)
    elif schedule in ("scaled_linear_beta", "scaled_linear"):
        betas = np.linspace(beta_start**0.5, beta_end**0.5, num_timesteps, dtype=t) ** 2
    elif schedule == "ldm_linear":
        # reference src/models/ldm.py:40-49 "linear": sqrt-space squared.
        betas = np.linspace(beta_start**0.5, beta_end**0.5, num_timesteps, dtype=t) ** 2
    elif schedule == "cosine":
        steps = np.arange(num_timesteps + 1, dtype=t) / num_timesteps + cosine_s
        alphas = np.cos(steps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=t)
    elif schedule == "sqrt":
        betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=t) ** 0.5
    elif schedule == "sigmoid_beta":
        sig = 1 / (1 + np.exp(-np.linspace(-6, 6, num_timesteps, dtype=t)))
        betas = sig * (beta_end - beta_start) + beta_start
    else:
        raise ValueError(f"unknown beta schedule '{schedule}'")
    return betas


@struct.dataclass
class NoiseSchedule:
    """Immutable schedule table; a pytree safe to close over in jit.

    All per-timestep lookups take integer timestep arrays and broadcast
    against sample batches of shape ``(B, ...)``.
    """

    betas: jnp.ndarray  # (T,)
    alphas_cumprod: jnp.ndarray  # (T,)
    num_timesteps: int = struct.field(pytree_node=False)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")

    @classmethod
    def create(
        cls,
        schedule: str = "linear_beta",
        num_timesteps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 2e-2,
        prediction_type: str = "epsilon",
        dtype=jnp.float32,
    ) -> "NoiseSchedule":
        betas = make_betas(schedule, num_timesteps, beta_start, beta_end)
        acp = np.cumprod(1.0 - betas)
        return cls(
            betas=jnp.asarray(betas, dtype),
            alphas_cumprod=jnp.asarray(acp, dtype),
            num_timesteps=int(num_timesteps),
            prediction_type=str(PredictionType(prediction_type).value),
        )

    # -- helpers ------------------------------------------------------------
    def _gather(self, table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        """table[t] broadcast to an ndim-rank sample batch."""
        out = jnp.take(table, t, axis=0)
        return out.reshape(out.shape + (1,) * (ndim - out.ndim))

    def sqrt_acp(self, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        return jnp.sqrt(self._gather(self.alphas_cumprod, t, ndim))

    def sqrt_one_minus_acp(self, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        return jnp.sqrt(1.0 - self._gather(self.alphas_cumprod, t, ndim))

    # -- forward process ----------------------------------------------------
    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """q(x_t | x_0) sample: sqrt(acp_t) x0 + sqrt(1-acp_t) eps.

        Parity: MONAI DDPMScheduler.add_noise as used at
        reference ``src/training/training.py:428-429``.
        """
        return self.sqrt_acp(t, x0.ndim) * x0 + self.sqrt_one_minus_acp(t, x0.ndim) * noise

    def velocity(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """v = sqrt(acp_t) eps - sqrt(1-acp_t) x0 (MONAI get_velocity;
        reference ``src/training/training.py:432-434``)."""
        return self.sqrt_acp(t, x0.ndim) * noise - self.sqrt_one_minus_acp(t, x0.ndim) * x0

    def to_x0_eps(
        self, model_out: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Convert a network output under this schedule's prediction_type to
        the (pred_x0, pred_eps) pair every sampler consumes."""
        sa = self.sqrt_acp(t, x_t.ndim)
        sb = self.sqrt_one_minus_acp(t, x_t.ndim)
        pt = self.prediction_type
        if pt == PredictionType.EPSILON.value:
            eps = model_out
            x0 = (x_t - sb * eps) / sa
        elif pt == PredictionType.SAMPLE.value:
            x0 = model_out
            eps = (x_t - sa * x0) / sb
        elif pt == PredictionType.V_PREDICTION.value:
            x0 = sa * x_t - sb * model_out
            eps = sa * model_out + sb * x_t
        else:  # pragma: no cover
            raise ValueError(pt)
        return x0, eps


# ---------------------------------------------------------------------------
# DDPM ancestral step (MONAI DDPMScheduler.step semantics, fixed_small var)
# ---------------------------------------------------------------------------
def ddpm_step(
    sched: NoiseSchedule,
    model_out: jnp.ndarray,
    t: jnp.ndarray,
    x_t: jnp.ndarray,
    noise: jnp.ndarray,
    clip_sample: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One reverse ancestral step x_t -> x_{t-1}.

    ``t`` is a scalar (or per-sample) integer timestep; ``noise`` must be a
    standard normal of x_t's shape (ignored at t == 0). Returns
    ``(x_prev, pred_x0)``.
    """
    ndim = x_t.ndim
    acp_t = sched._gather(sched.alphas_cumprod, t, ndim)
    t_prev = t - 1
    has_prev = t > 0
    has_prev = jnp.reshape(
        has_prev, jnp.shape(has_prev) + (1,) * (ndim - jnp.ndim(has_prev))
    )
    acp_prev = jnp.where(
        has_prev,
        sched._gather(sched.alphas_cumprod, jnp.maximum(t_prev, 0), ndim),
        jnp.ones_like(acp_t),
    )
    beta_t = sched._gather(sched.betas, t, ndim)
    alpha_t = 1.0 - beta_t

    x0, _ = sched.to_x0_eps(model_out, x_t, t)
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)

    coef1 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
    coef2 = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp_t)
    mean = coef1 * x0 + coef2 * x_t

    # fixed_small variance, floored like the reference's posterior clip
    var = jnp.clip(beta_t * (1.0 - acp_prev) / (1.0 - acp_t), min=1e-20)
    nonzero = (t > 0).astype(x_t.dtype)
    nonzero = nonzero.reshape(nonzero.shape + (1,) * (ndim - nonzero.ndim))
    x_prev = mean + nonzero * jnp.sqrt(var) * noise
    return x_prev, x0


# ---------------------------------------------------------------------------
# DDIM (MONAI DDIMScheduler semantics)
# ---------------------------------------------------------------------------
def ddim_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """Descending inference timesteps, MONAI set_timesteps parity
    (reference ``src/sample_trials.py:144``: 1000 train steps -> 200)."""
    ratio = num_train_timesteps // num_inference_steps
    return (np.arange(0, num_inference_steps) * ratio).round()[::-1].copy().astype(np.int32)


def ddim_step(
    sched: NoiseSchedule,
    model_out: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    x_t: jnp.ndarray,
    eta: float = 0.0,
    clip_sample: bool = False,
    noise: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DDIM step x_t -> x_{t_prev}; returns (x_prev, pred_x0).

    Parity: MONAI DDIMScheduler.step as driven by the reference sampling
    loop ``src/sample_trials.py:154-163`` (eta=0, clip_sample=False,
    v_prediction). ``t_prev`` may be negative for the final step, in which
    case acp_prev == 1 (final_alpha_cumprod).
    """
    ndim = x_t.ndim
    acp_t = sched._gather(sched.alphas_cumprod, t, ndim)
    acp_prev_tbl = sched._gather(sched.alphas_cumprod, jnp.maximum(t_prev, 0), ndim)
    is_valid = (t_prev >= 0)
    is_valid = jnp.reshape(is_valid, jnp.shape(is_valid) + (1,) * (ndim - jnp.ndim(is_valid)))
    acp_prev = jnp.where(is_valid, acp_prev_tbl, jnp.ones_like(acp_prev_tbl))

    x0, eps = sched.to_x0_eps(model_out, x_t, t)
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)

    var = (1.0 - acp_prev) / (1.0 - acp_t) * (1.0 - acp_t / acp_prev)
    std = eta * jnp.sqrt(var)
    direction = jnp.sqrt(1.0 - acp_prev - std**2) * eps
    x_prev = jnp.sqrt(acp_prev) * x0 + direction
    if eta > 0:
        if noise is None:
            raise ValueError("eta > 0 requires noise")
        x_prev = x_prev + std * noise
    return x_prev, x0
