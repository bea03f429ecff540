"""CLI: signal-space DM sampling (reference ``src/sample_trials_ddpm.py``:
noise (1,1,3072), DDIM-200 over a DDPM-trained UNet, crop, artifacts)."""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--diffusion_path", type=str, required=True)
    p.add_argument("--start_seed", type=int, default=0)
    p.add_argument("--stop_seed", type=int, default=1000)
    p.add_argument("--num_inference_steps", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--spe", type=str, default="no-spectral")
    p.add_argument("--type_dataset", type=str, default="")
    p.add_argument("--no_psd", action="store_true")
    return p


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
    from sleepgen.sample.sample_ldm import sampling_schedule, write_sample_artifacts
    from sleepgen.data.transforms import BORDER_PAD
    from sleepgen.train.train_ldm import build_unet
    from sleepgen.utils import CheckpointManager

    args = build_parser().parse_args(argv)
    cfg = Config.from_yaml(Path(args.diffusion_path) / "config.yaml")
    cfg.diffusion.num_inference_steps = args.num_inference_steps
    signal_len = cfg.unet.image_size

    unet = build_unet(cfg, 1, 1, jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
    x0 = jnp.zeros((2, signal_len, 1))
    template = {"params": jax.device_get(
        unet.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,), jnp.int32))["params"])}
    ckpt = CheckpointManager(args.diffusion_path)
    best = ckpt.restore_best(template)
    ckpt.close()

    sched = sampling_schedule(cfg)

    @jax.jit
    def sample(params, base_key, seeds):
        x_T = seed_noise(base_key, seeds, (signal_len, 1))

        def model_fn(x, t):
            return unet.apply({"params": params}, x, t)

        x = ddim_sample_loop(model_fn, sched, x_T, args.num_inference_steps)
        return x[:, BORDER_PAD:-BORDER_PAD, :]

    out = Path(args.output_dir) / f"samples_ddpm_{args.spe}_{args.type_dataset}"
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
