"""CLI: generate synthetic EEG trials from a trained LDM
(reference ``src/sample_trials.py`` — per-seed DDIM sampling + artifacts).

The batch_size flag is the TPU upgrade: the reference runs batch 1 per
seed; sleepgen runs hundreds of seeds per device step.
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--best_model_path", type=str, required=True,
                   help="AEKL run dir")
    p.add_argument("--diffusion_path", type=str, required=True,
                   help="LDM run dir")
    p.add_argument("--start_seed", type=int, default=0)
    p.add_argument("--stop_seed", type=int, default=1000)
    p.add_argument("--num_inference_steps", type=int, default=200)
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddim", "dpm++2m"],
                   help="dpm++2m reaches DDIM-200 quality in ~20 steps")
    p.add_argument("--batch_size", type=int, default=64)  # v5e optimum for the scan samplers (BASELINE.md r3 DPM table: 64 beats 256 by ~20%)
    p.add_argument("--spe", type=str, default="no-spectral")
    p.add_argument("--latent_channels", type=int, default=None)
    p.add_argument("--type_dataset", type=str, default="")
    p.add_argument("--no_psd", action="store_true")
    p.add_argument("--stage", type=int, default=None,
                   help="sleep-stage label for class-conditional checkpoints "
                        "(config.unet.num_classes>0); artifacts land in a "
                        "stage-suffixed directory. Omit for unconditional.")
    p.add_argument("--guidance_scale", type=float, default=1.0,
                   help="classifier-free guidance scale (conditional "
                        "checkpoints trained with train.cond_dropout_prob>0)")
    return p


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    from pathlib import Path

    from sleepgen.config import Config
    from sleepgen.sample.sample_ldm import sample_ldm_trials
    from sleepgen.sample.samplers import validate_stage
    from sleepgen.train.train_aekl import restore_aekl_run
    from sleepgen.train.train_ldm import restore_unet_run

    args = build_parser().parse_args(argv)
    # read train-time configs from the run dirs (no re-stated channels)
    aekl_cfg = Config.from_yaml(Path(args.best_model_path) / "config.yaml")
    cfg = Config.from_yaml(Path(args.diffusion_path) / "config.yaml")
    if args.latent_channels is not None:
        aekl_cfg.aekl.latent_channels = args.latent_channels
    cfg.diffusion.num_inference_steps = args.num_inference_steps
    cfg.diffusion.sampler = args.sampler

    _, _, stage1_params = restore_aekl_run(args.best_model_path,
                                           cfg=aekl_cfg)

    conditional = cfg.unet.num_classes > 0
    try:
        validate_stage(cfg.unet.num_classes, args.stage, args.guidance_scale)
    except ValueError as e:
        raise SystemExit(str(e))

    lc = aekl_cfg.aekl.latent_channels
    _, best = restore_unet_run(cfg, args.diffusion_path, lc, lc,
                               with_scale_factor=True)

    # default the artifact-dir suffix from the run's train-time config
    type_dataset = args.type_dataset or cfg.dataset
    suffix = f"_stage{args.stage}" if conditional else ""
    out = Path(args.output_dir) / (
        f"samples_ldm_{lc}_{args.spe}_{type_dataset}{suffix}")
    sigs = sample_ldm_trials(
        cfg, best["params"], stage1_params, float(best["scale_factor"]), out,
        start_seed=args.start_seed, stop_seed=args.stop_seed,
        batch_size=args.batch_size, aekl_cfg=aekl_cfg,
        compute_psd=not args.no_psd, stage=args.stage,
        guidance_scale=args.guidance_scale)
    print(f"wrote {sigs.shape[0]} samples to {out}")


if __name__ == "__main__":
    main()
