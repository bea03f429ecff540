"""CLI: diffusion-based imputation of masked signal regions (beyond parity).

Repairs a contiguous masked span of 30 s windows via RePaint masked
ancestral sampling. Two modes, selected by the checkpoints you point it at:

- **signal-space DM** (default): ``--diffusion_path`` is a
  ``train_pure_ldm`` run dir; the chain runs at full signal length
  (``samplers.impute_dm``).
- **latent LDM**: additionally pass ``--best_model_path`` (the trained
  AEKL run dir, as for sample_trials) and ``--diffusion_path`` a
  ``train_ldm`` run dir; the chain runs in the 4x-shorter latent space
  and observed samples are spliced back exactly in signal space
  (``samplers.impute_ldm``). The flagship generation checkpoints double
  as artifact-repair models with no retraining.

The reference has no imputation path — its checkpoints only draw
unconditional windows (``src/sample_trials_ddpm.py``).

Input: a ``.npy`` of windows shaped (N, 3000), (N, 1, 3000) or
(N, 3000, C) in the pipeline's normalized units. Output: the same
windows with ``[mask_start, mask_start+mask_len)`` regenerated, saved as
``imputed.npy`` (N, 1, 3000) next to a copy of the boolean mask.
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", type=str, required=True,
                   help=".npy of windows to repair")
    p.add_argument("--diffusion_path", type=str, required=True,
                   help="trained diffusion run dir (train_pure_ldm, or "
                        "train_ldm with --best_model_path)")
    p.add_argument("--best_model_path", type=str, default=None,
                   help="trained AEKL run dir: switches to latent-space "
                        "(LDM) imputation with the sample_trials checkpoints")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--mask_start", type=int, required=True,
                   help="first masked sample (0..2999, 100 Hz)")
    p.add_argument("--mask_len", type=int, required=True)
    p.add_argument("--stage", type=int, default=None,
                   help="stage label for conditional checkpoints")
    p.add_argument("--guidance_scale", type=float, default=1.0,
                   help="classifier-free guidance for the repair (>1 needs "
                        "a conditional checkpoint trained with "
                        "cond_dropout_prob > 0)")
    p.add_argument("--num_resample", type=int, default=1,
                   help="RePaint resampling count (boundary harmonization)")
    p.add_argument("--latent_erode", type=int, default=4,
                   help="LDM mode: latent anchor-mask erosion (receptive-"
                        "field guard), in latent positions per side")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    from sleepgen.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sleepgen.config import Config
    from sleepgen.data.transforms import BORDER_PAD
    from sleepgen.sample.samplers import impute_dm, impute_ldm, validate_stage
    from sleepgen.train.train_ldm import make_schedule, restore_unet_run

    args = build_parser().parse_args(argv)
    cfg = Config.from_yaml(Path(args.diffusion_path) / "config.yaml")
    conditional = cfg.unet.num_classes > 0
    try:
        validate_stage(cfg.unet.num_classes, args.stage, args.guidance_scale)
    except ValueError as e:
        raise SystemExit(str(e))
    latent_mode = args.best_model_path is not None

    x = np.load(args.input)
    if x.ndim == 2:  # (N, L)
        x = x[..., None]
    elif x.ndim == 3 and x.shape[1] == 1 and x.shape[2] > x.shape[1]:
        x = np.transpose(x, (0, 2, 1))  # (N, 1, L) -> (N, L, 1)
    n, length, ch = x.shape

    if latent_mode:
        from sleepgen.train.train_aekl import restore_aekl_run

        aekl_cfg, ae, ae_params = restore_aekl_run(args.best_model_path)
        # cfg.unet.image_size is the LATENT length here; the signal window
        # rebuilds from the AEKL's downsample count (as in warm_cache)
        window = (cfg.unet.image_size
                  * 2 ** (len(aekl_cfg.aekl.num_channels) - 1))
        lc = aekl_cfg.aekl.latent_channels
        unet, best = restore_unet_run(cfg, args.diffusion_path, lc, lc,
                                      with_scale_factor=True)
        scale_factor = float(best["scale_factor"])
    else:
        window = cfg.unet.image_size
        unet, best = restore_unet_run(cfg, args.diffusion_path, ch, ch,
                                      sample_shape=(window, ch),
                                      name="final_model")

    assert length + 2 * BORDER_PAD == window, (
        f"window length {length} + 2*{BORDER_PAD} pad must equal the "
        f"checkpoint's signal window {window}")
    assert 0 <= args.mask_start < length and args.mask_len > 0
    stop = min(args.mask_start + args.mask_len, length)

    x_pad = np.pad(x.astype(np.float32),
                   ((0, 0), (BORDER_PAD, BORDER_PAD), (0, 0)), mode="edge")
    mask = np.ones((1, window, 1), np.float32)  # 1 = observed
    mask[:, BORDER_PAD + args.mask_start : BORDER_PAD + stop, :] = 0.0

    sched = make_schedule(cfg)

    bs = args.batch_size

    @jax.jit
    def repair(params, xb, key):
        y = (jnp.full((xb.shape[0],), args.stage, jnp.int32)
             if conditional else None)
        if latent_mode:
            return impute_ldm(unet, ae, params, ae_params,
                              jnp.float32(scale_factor), sched, xb,
                              jnp.asarray(mask), key, labels=y,
                              num_resample=args.num_resample,
                              latent_erode=args.latent_erode,
                              guidance_scale=args.guidance_scale)
        return impute_dm(unet, params, sched, xb, jnp.asarray(mask), key,
                         labels=y, num_resample=args.num_resample,
                         guidance_scale=args.guidance_scale)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    outs = []
    for i in range(0, n, bs):
        xb = x_pad[i : i + bs]
        real = len(xb)
        if real < bs:  # one compiled shape for every batch
            xb = np.concatenate([xb, np.repeat(xb[-1:], bs - real, 0)])
        fixed = repair(best["params"], jnp.asarray(xb),
                       jax.random.fold_in(jax.random.PRNGKey(args.seed), i))
        outs.append(np.asarray(jax.device_get(fixed), np.float32)[:real])
    imputed = np.concatenate(outs)[:, BORDER_PAD:-BORDER_PAD, :]
    np.save(out_dir / "imputed.npy", np.transpose(imputed, (0, 2, 1)))
    np.save(out_dir / "mask.npy",
            mask[0, BORDER_PAD:-BORDER_PAD, 0].astype(bool))
    print(f"imputed {n} windows ([{args.mask_start}:{stop}) regenerated) "
          f"-> {out_dir / 'imputed.npy'}")


if __name__ == "__main__":
    main()
