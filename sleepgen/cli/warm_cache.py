"""Precompile the standard sleepgen graphs into the persistent XLA cache.

Device-backend compiles can be minutes-long for cold graphs (the 200-step
DDIM scan, decode train steps); serving and cluster jobs should not pay
that at first request. This CLI AOT-compiles the train steps and samplers
for a config (no training, no data) so every later process — serve, the
sampling CLIs, bench — hits the cache.

No reference equivalent (the reference pays eager-mode dispatch every
call); this is the TPU-native cold-start story.

Usage:
  python -m sleepgen warm-cache --config_file config.yaml \
      [--targets aekl,ldm,sampler,dpm] [--batch_sizes 64,256]
"""
from __future__ import annotations

import argparse
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_file", type=str, default=None,
                   help="run/train config YAML (defaults to the flagship config)")
    p.add_argument("--targets", type=str, default="aekl,ldm,sampler",
                   help="comma list: aekl,ldm,sampler,dpm")
    p.add_argument("--batch_sizes", type=str, default="64,128",
                   help="sampler seed-batch sizes to precompile (default "
                        "covers bench.py's 64 and SamplerService's 128)")
    p.add_argument("--train_batch", type=int, default=None,
                   help="train-step batch (default: config batch size)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu) — env vars can be "
                        "overridden by this image's sitecustomize; the "
                        "in-process config update always works")
    return p


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp

    from sleepgen.config import Config
    from sleepgen.utils.profiling import tpu_contact

    args = build_parser().parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    tpu_contact()

    cfg = Config.from_yaml(args.config_file) if args.config_file else Config()
    targets = set(args.targets.split(","))
    batches = [int(b) for b in args.batch_sizes.split(",")]
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    rng = jax.random.PRNGKey(0)
    # derive the signal geometry from the config so non-flagship configs
    # warm the graphs their real jobs will actually hit: window = latent
    # length x 2^(AEKL downsamples); defaults give 768 * 4 = 3072
    window = cfg.unet.image_size * 2 ** (len(cfg.aekl.num_channels) - 1)
    in_ch = cfg.aekl.in_channels
    lc = cfg.aekl.latent_channels

    def clock(label, fn):
        t0 = time.perf_counter()
        fn()
        print(f"warmed {label}: {time.perf_counter() - t0:.1f}s", flush=True)

    if "aekl" in targets:
        from sleepgen.train.train_aekl import init_state, make_train_step

        # mirror the real training graph exactly (dtype included) or the
        # warmed entry never matches: train_aekl passes the compute dtype
        # to init_state and prefetches batches cast to it
        state, ae, disc, opt_g, opt_d = init_state(cfg, rng, window=window,
                                                   dtype=dtype)
        step = make_train_step(ae, disc, opt_g, opt_d, cfg)
        b = args.train_batch or cfg.train.batch_size
        batch = jnp.zeros((b, window, in_ch), dtype)
        clock("aekl train step",
              lambda: step.lower(state, batch, rng).compile())

    if "ldm" in targets or "sampler" in targets or "dpm" in targets:
        from sleepgen.train.train_aekl import build_models
        from sleepgen.train.train_ldm import build_unet

        from sleepgen.train.train_ldm import init_unet_template
        from sleepgen.utils import jit_init

        ae, _ = build_models(cfg, dtype)
        unet = build_unet(cfg, lc, lc, dtype)
        x = jnp.zeros((2, window, in_ch), dtype)
        ae_params = jit_init(ae, {"params": rng}, x, rng)["params"]
        conditional = cfg.unet.num_classes > 0
        # conditional configs warm the labeled graphs (shared template
        # helper keeps the init args in one place)
        unet_params = init_unet_template(
            cfg, unet, (cfg.unet.image_size, lc))["params"]

    if "ldm" in targets:
        import optax

        from sleepgen.train.train_ldm import (DiffusionState,
                                              make_ldm_train_step,
                                              make_schedule)

        opt = optax.adam(cfg.train.base_lr)
        ema_decay = cfg.diffusion.ema_decay
        st = DiffusionState(
            step=jnp.zeros((), jnp.int32), params=unet_params,
            opt=opt.init(unet_params),
            best_loss=jnp.asarray(jnp.inf, jnp.float32),
            scale_factor=jnp.float32(1.0),
            # EMA-enabled configs carry ema_params in the donated state
            # pytree (train_ldm.py) — warm the same arg structure
            ema_params=(jax.tree_util.tree_map(jnp.copy, unet_params)
                        if ema_decay > 0.0 else None))
        # mirror train_ldm's fast_train_math clone or the warmed train-step
        # graph will not match the real job's
        u_train = (unet.clone(fast_math=True)
                   if cfg.fast_train_math and dtype == jnp.bfloat16 else unet)
        tstep = make_ldm_train_step(
            u_train, ae, ae_params, make_schedule(cfg), opt,
            ema_decay=ema_decay, conditional=conditional,
            cond_dropout_prob=cfg.train.cond_dropout_prob)
        b = args.train_batch or cfg.train.batch_size
        batch = jnp.zeros((b, window, in_ch), dtype)
        if conditional:
            batch = (batch, jnp.zeros((b,), jnp.int32))
        clock("ldm train step",
              lambda: tstep.lower(st, batch, rng).compile())

    # a config whose sampler IS dpm++2m runs num_inference_steps steps
    # through that solver, so warm that count; the separate "dpm" target
    # for a ddim config warms the conventional 20-step operating point
    dpm_steps = (cfg.diffusion.num_inference_steps
                 if cfg.diffusion.sampler == "dpm++2m" else 20)
    for name, sampler_kind, steps in [
        ("sampler", "ddim", cfg.diffusion.num_inference_steps),
        ("dpm", "dpm++2m", dpm_steps),
    ]:
        if name not in targets:
            continue
        from sleepgen.sample.sample_ldm import make_ldm_sampler, sampling_schedule

        u = unet.clone(fast_math=True) if (
            cfg.fast_sampling_math and dtype == jnp.bfloat16) else unet
        s = make_ldm_sampler(u, ae, sampling_schedule(cfg),
                             cfg.unet.image_size, lc, steps,
                             sampler=sampler_kind, conditional=conditional)
        # the guided (CFG) sampler takes guidance_scale as a traced scalar,
        # so one warmed graph covers EVERY scale a client might request
        sg = (make_ldm_sampler(u, ae, sampling_schedule(cfg),
                               cfg.unet.image_size, lc, steps,
                               sampler=sampler_kind, conditional=True,
                               guided=True)
              if conditional else None)
        for b in batches:
            seeds = jnp.arange(b)
            sample_args = (unet_params, ae_params, jnp.float32(1.0), rng,
                           seeds)
            if conditional:
                sample_args += (jnp.zeros((b,), jnp.int32),)
            clock(f"{sampler_kind}-{steps} sampler batch {b}",
                  lambda: s.lower(*sample_args).compile())
            if conditional:
                gargs = sample_args + (jnp.float32(2.0),)
                clock(f"{sampler_kind}-{steps} guided sampler batch {b}",
                      lambda: sg.lower(*gargs).compile())


if __name__ == "__main__":
    main()
