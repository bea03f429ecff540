from sleepgen.sample.samplers import ddim_sample_loop, ddpm_sample_loop, seed_noise
from sleepgen.sample.sample_ldm import (
    make_dm_sampler,
    make_ldm_sampler,
    sample_ldm_trials,
    sampling_schedule,
    write_sample_artifacts,
)

__all__ = [
    "ddim_sample_loop",
    "ddpm_sample_loop",
    "seed_noise",
    "make_dm_sampler",
    "make_ldm_sampler",
    "sample_ldm_trials",
    "sampling_schedule",
    "write_sample_artifacts",
]
