from sleepgen.diffusion.schedules import (
    NoiseSchedule,
    PredictionType,
    ddim_step,
    ddim_timesteps,
    ddpm_step,
    make_betas,
)

__all__ = [
    "NoiseSchedule",
    "PredictionType",
    "ddim_step",
    "ddim_timesteps",
    "ddpm_step",
    "make_betas",
]
