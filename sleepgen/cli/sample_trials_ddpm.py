"""CLI: signal-space DM sampling (reference ``src/sample_trials_ddpm.py``:
noise (1,1,3072), DDIM over a DDPM-trained UNet, crop, artifacts).

Scheduler-parity quirk (reference ``src/sample_trials_ddpm.py:83-92``):
the reference passes ``--num_inference_steps`` as the DDIM scheduler's
``num_train_timesteps`` — i.e. it sets the *beta-table length* — while the
DDIM loop itself is hard-coded to ``set_timesteps(200)``. The argparse
default is 1000 (``:40``) and none of the cluster launch scripts override
it (``clusters/run_dm_sampling_*.sh``), so the as-shipped behavior is a
1000-entry scaled-linear table stepped 200 times (ratio 5) — identical in
shape to the LDM path. But a user passing ``--num_inference_steps 200``
gets a 200-entry table stepped 200 times (ratio 1, final alpha_cumprod
~0.11 instead of ~1e-5) — a very different trajectory. We replicate both
semantics: ``--num_inference_steps`` = table length, ``--num_ddim_steps``
= loop length (default 200, clamped to the table length).

Beyond parity: for class-conditional checkpoints (``config.unet.
num_classes>0`` — a path the reference's UNet declares but never trains,
``src/models/unet.py:379-380``), ``--stage k`` samples stage ``k``; the
``(seed, stage)`` pair fully determines each sample.
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--diffusion_path", type=str, required=True)
    p.add_argument("--start_seed", type=int, default=0)
    p.add_argument("--stop_seed", type=int, default=1000)
    p.add_argument("--num_inference_steps", type=int, default=1000,
                   help="sampling beta-table length (reference semantics: "
                        "DDIMScheduler num_train_timesteps)")
    p.add_argument("--num_ddim_steps", type=int, default=200,
                   help="DDIM loop length (reference: set_timesteps(200))")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--spe", type=str, default="no-spectral")
    p.add_argument("--type_dataset", type=str, default="")
    p.add_argument("--no_psd", action="store_true")
    p.add_argument("--stage", type=int, default=None,
                   help="sleep-stage label for class-conditional checkpoints "
                        "(config.unet.num_classes>0); artifacts land in a "
                        "stage-suffixed directory. Omit for unconditional.")
    p.add_argument("--guidance_scale", type=float, default=1.0,
                   help="classifier-free guidance scale (conditional "
                        "checkpoints trained with train.cond_dropout_prob>0); "
                        "1.0 = plain conditional sampling")
    return p


def dm_sampling_schedule(cfg, num_train_timesteps: int):
    """Reference-parity DM sampling schedule: same scaled-linear betas and
    v_prediction as the LDM sampler, but with a caller-chosen table length
    (``src/sample_trials_ddpm.py:83-90``)."""
    from sleepgen.diffusion import NoiseSchedule

    d = cfg.diffusion
    return NoiseSchedule.create(
        d.sample_schedule, num_train_timesteps, d.sample_beta_start,
        d.sample_beta_end, prediction_type=d.sample_prediction_type,
    )


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sleepgen.config import Config
    from sleepgen.sample.samplers import ddim_sample_loop, seed_noise
    from sleepgen.sample.sample_ldm import write_sample_artifacts
    from sleepgen.data.transforms import BORDER_PAD
    args = build_parser().parse_args(argv)
    cfg = Config.from_yaml(Path(args.diffusion_path) / "config.yaml")
    num_ddim_steps = min(args.num_ddim_steps, args.num_inference_steps)
    cfg.diffusion.num_inference_steps = num_ddim_steps
    signal_len = cfg.unet.image_size

    from sleepgen.sample.samplers import validate_stage
    from sleepgen.train.train_ldm import restore_unet_run

    conditional = cfg.unet.num_classes > 0
    try:
        validate_stage(cfg.unet.num_classes, args.stage, args.guidance_scale)
    except ValueError as e:
        raise SystemExit(str(e))

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    unet, best = restore_unet_run(cfg, args.diffusion_path, 1, 1, dtype,
                                  sample_shape=(signal_len, 1))

    sched = dm_sampling_schedule(cfg, args.num_inference_steps)
    if cfg.fast_sampling_math and cfg.dtype == "bfloat16":
        unet = unet.clone(fast_math=True)  # same param tree (layers.py)

    from sleepgen.sample.samplers import sample_dm_conditional

    @jax.jit
    def sample(params, base_key, seeds):
        if conditional:
            y = jnp.full((seeds.shape[0],), args.stage, jnp.int32)
            x = sample_dm_conditional(
                unet, params, sched, y, base_key, seeds, signal_len,
                num_steps=num_ddim_steps, guidance_scale=args.guidance_scale)
        else:
            x_T = seed_noise(base_key, seeds, (signal_len, 1))

            def model_fn(x, t):
                return unet.apply({"params": params}, x, t)

            x = ddim_sample_loop(model_fn, sched, x_T, num_ddim_steps)
        return x[:, BORDER_PAD:-BORDER_PAD, :]

    type_dataset = args.type_dataset or cfg.dataset
    suffix = f"_stage{args.stage}" if conditional else ""
    out = Path(args.output_dir) / f"samples_ddpm_{args.spe}_{type_dataset}{suffix}"
    base_key = jax.random.PRNGKey(0)
    all_seeds = np.arange(args.start_seed, args.stop_seed)
    for i in range(0, len(all_seeds), args.batch_size):
        seeds = all_seeds[i : i + args.batch_size]
        padded = (np.concatenate([seeds, np.full(args.batch_size - len(seeds), seeds[-1])])
                  if len(seeds) < args.batch_size else seeds)
        sig = np.asarray(jax.device_get(
            sample(best["params"], base_key, jnp.asarray(padded))))[: len(seeds)]
        write_sample_artifacts(out, seeds.tolist(), sig, not args.no_psd)
    print(f"wrote {len(all_seeds)} samples to {out}")


if __name__ == "__main__":
    main()
