"""LDM/DM sampling drivers with the reference artifact contract.

Artifacts (parity with ``src/sample_trials.py:166-197``):
  * ``sample_{i}.npy``   — (1, 1, 3000) cropped signal, reference layout
  * ``psd_list_{i}.npy`` — [psds, freqs, psds_mean] DPSS-multitaper PSD
    (fmax 18) — the method MNE's ``EpochsArray.compute_psd`` actually
    runs for Epochs (``method='auto'`` -> multitaper), so these numbers
    are comparable to reference-produced artifacts; pass
    ``psd_method="welch"`` for the Welch spectra instead
  * ``psd_list.npy``     — stacked per-seed PSD summaries

Throughput design: seeds are processed in device-sized batches; each batch
runs noise -> 200-step DDIM scan -> stage-1 decode -> crop in ONE jit.
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sleepgen.config import Config
from sleepgen.data.transforms import BORDER_PAD, to_bcl
from sleepgen.diffusion import NoiseSchedule
from sleepgen.nn import AutoencoderKL, UNet1d
from sleepgen.sample.samplers import (_cond_model_fn, ddim_sample_loop,
                                      ddpm_sample_loop, seed_noise)


def sampling_schedule(cfg: Config) -> NoiseSchedule:
    d = cfg.diffusion
    return NoiseSchedule.create(
        d.sample_schedule, d.timesteps, d.sample_beta_start, d.sample_beta_end,
        prediction_type=d.sample_prediction_type,
    )


def make_ldm_sampler(
    unet: UNet1d,
    ae: AutoencoderKL,
    sched: NoiseSchedule,
    latent_len: int = 768,
    latent_channels: int = 1,
    num_inference_steps: int = 200,
    border_pad: int = BORDER_PAD,
    sampler: str = "ddim",
    mesh=None,
    conditional: bool = False,
    guided: bool = False,
):
    """Returns jitted (unet_params, ae_params, scale_factor, base_key, seeds)
    -> (B, 3000, 1) signals. ``sampler``: "ddim" (reference parity) or
    "dpm++2m" (DPM-Solver++ 2M — same quality in ~10x fewer steps).

    ``mesh``: a ``jax.sharding.Mesh`` for data-parallel sampling — seeds
    (and the output batch) shard over the ``data`` axis, parameters are
    replicated, and XLA runs the whole scan per shard with no collectives
    (per-seed noise comes from ``fold_in``, so samples are bitwise
    independent of the device count — pinned by tests/test_parallel.py).

    ``conditional``: the sampler takes a trailing ``labels`` (B,) int32
    argument (sharded alongside seeds under a mesh) and feeds the UNet's
    class embedding (config.unet.num_classes>0). ``guided=True`` adds
    classifier-free guidance — the null branch (labels=-1) runs in the
    same 2B-batch UNet apply per step, and the sampler takes one more
    trailing ``guidance_scale`` scalar that is *traced*, so a single
    compiled graph serves every scale (a baked-in Python constant would
    recompile the whole 200-step scan per scale — measured minutes on
    TPU — and grow a service's sampler cache without bound)."""
    assert conditional or not guided, "guided sampling requires conditional"
    if mesh is not None:
        from sleepgen.parallel import batch_sharding, replicated

        rep, bat = replicated(mesh), batch_sharding(mesh)
        in_sh = ((rep, rep, rep, rep, bat) + ((bat,) if conditional else ())
                 + ((rep,) if guided else ()))
        jit_kwargs = dict(in_shardings=in_sh, out_shardings=bat)
    else:
        jit_kwargs = {}

    @functools.partial(jax.jit, **jit_kwargs)
    def sample(unet_params, ae_params, scale_factor, base_key, seeds,
               labels=None, guidance_scale=None):
        x_T = seed_noise(base_key, seeds, (latent_len, latent_channels))
        # shared plain/conditional/CFG closure; `guided` is the static
        # branch pick because guidance_scale is traced here
        model_fn = _cond_model_fn(unet, unet_params,
                                  labels if conditional else None,
                                  guidance_scale, guided=guided)

        if sampler == "dpm++2m":
            from sleepgen.diffusion.dpm_solver import dpm_solver_pp_2m_sample_loop

            z = dpm_solver_pp_2m_sample_loop(model_fn, sched, x_T,
                                             num_inference_steps)
        else:
            z = ddim_sample_loop(model_fn, sched, x_T, num_inference_steps)
        signal = ae.apply({"params": ae_params}, z / scale_factor,
                          method=AutoencoderKL.decode_stage_2_outputs)
        return signal.astype(jnp.float32)[:, border_pad:-border_pad, :]

    return sample


def make_dm_sampler(unet: UNet1d, sched: NoiseSchedule, signal_len: int = 3072,
                    border_pad: int = BORDER_PAD):
    @jax.jit
    def sample(unet_params, base_key, seeds, loop_key):
        x_T = seed_noise(base_key, seeds, (signal_len, 1))

        def model_fn(x, t):
            return unet.apply({"params": unet_params}, x, t)

        x = ddpm_sample_loop(model_fn, sched, x_T, loop_key, clip_sample=True)
        return x.astype(jnp.float32)[:, border_pad:-border_pad, :]

    return sample


def write_sample_artifacts(
    output_dir: str | Path,
    seeds: Sequence[int],
    signals_blc: np.ndarray,
    compute_psd: bool = True,
    psd_method: str = "multitaper",
) -> None:
    """Write per-seed npy artifacts in the reference layout.

    ``psd_method="multitaper"`` (default) reproduces the reference's MNE
    Epochs PSD method; ``"welch"`` writes the Welch spectra instead."""
    from sleepgen.eval.psd import multitaper_psd_db, welch_psd_db

    psd_db = {"multitaper": multitaper_psd_db, "welch": welch_psd_db}[psd_method]
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    psd_list = []
    signals_ncl = to_bcl(signals_blc)  # (B, 1, 3000)
    if compute_psd:
        # one batched device call for the whole batch — the reference (and
        # sleepgen <r3) paid one small device dispatch per seed
        # (sample_trials.py:172-190: serial MNE PSD per sample)
        psds_all, freqs = psd_db(signals_ncl, fmax=18.0)  # (B, 1, F)
    for i, seed in enumerate(seeds):
        np.save(output_dir / f"sample_{seed}.npy", signals_ncl[i : i + 1])
        if compute_psd:
            psds = psds_all[i]  # (1, F): per-channel rows, reference layout
            save_info = [psds, freqs, psds.mean(axis=0)]
            np.save(output_dir / f"psd_list_{seed}.npy",
                    np.asarray(save_info, dtype=object), allow_pickle=True)
            psd_list.append(save_info)
    if compute_psd and psd_list:
        np.save(output_dir / "psd_list.npy",
                np.asarray(psd_list, dtype=object), allow_pickle=True)


def sample_ldm_trials(
    cfg: Config,
    unet_params,
    ae_params,
    scale_factor: float,
    output_dir: str | Path,
    start_seed: int = 0,
    stop_seed: int = 1000,
    batch_size: int = 64,  # v5e optimum (BASELINE.md round-3 sampler tables)
    aekl_cfg: Optional[Config] = None,
    base_key: Optional[jax.Array] = None,
    compute_psd: bool = True,
    border_pad: int = BORDER_PAD,
    quantized: bool = False,
    mesh=None,
    stage: Optional[int] = None,
    guidance_scale: float = 1.0,
) -> np.ndarray:
    """Generate samples for seeds [start_seed, stop_seed) in device batches.
    Returns all cropped signals (N, 3000, 1). ``quantized=True`` runs the
    UNet convs int8 (sleepgen.nn.quant), converting the fp params.
    ``mesh``: shard each seed batch over the mesh's data axis (the
    data-axis size must divide batch_size); samples are identical to the
    single-device output. ``stage``: class label for conditional
    checkpoints (cfg.unet.num_classes>0); ``guidance_scale>1`` adds
    classifier-free guidance."""
    from sleepgen.train.train_aekl import build_models
    from sleepgen.train.train_ldm import build_unet

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    aekl_cfg = aekl_cfg or cfg
    lc = aekl_cfg.aekl.latent_channels
    ae, _ = build_models(aekl_cfg, dtype)
    unet = build_unet(cfg, lc, lc, dtype)
    if quantized:
        # int8 path stays on the strict fp32-norm numerics it was gated
        # and perf-measured with (BASELINE.md "Int8 quantized sampling") —
        # composing fast_math here would confound that comparison
        from sleepgen.nn.quant import quantize_unet_params

        unet = unet.clone(quantized=True)
        unet_params = quantize_unet_params(unet_params)
    elif cfg.fast_sampling_math and dtype == jnp.bfloat16:
        unet = unet.clone(fast_math=True,
                          use_fused_resblock=cfg.fused_resblock_sampling)
    elif cfg.fused_resblock_sampling:
        unet = unet.clone(use_fused_resblock=True)
    sched = sampling_schedule(cfg)
    if mesh is not None:
        n_data = mesh.shape["data"]
        assert batch_size % n_data == 0, (batch_size, n_data)
    from sleepgen.sample.samplers import validate_stage

    conditional = cfg.unet.num_classes > 0
    validate_stage(cfg.unet.num_classes, stage, guidance_scale)
    guided = conditional and guidance_scale != 1.0
    sampler = make_ldm_sampler(unet, ae, sched, latent_len=cfg.unet.image_size,
                               latent_channels=lc,
                               num_inference_steps=cfg.diffusion.num_inference_steps,
                               border_pad=border_pad,
                               sampler=cfg.diffusion.sampler, mesh=mesh,
                               conditional=conditional, guided=guided)
    base_key = base_key if base_key is not None else jax.random.PRNGKey(0)
    sf = jnp.asarray(scale_factor, jnp.float32)

    # pin checkpoint params (host numpy) on device once — otherwise every
    # seed batch re-uploads both parameter trees through the TPU relay
    if mesh is not None:
        from sleepgen.parallel import replicated

        rep = replicated(mesh)
        unet_params = jax.device_put(unet_params, rep)
        ae_params = jax.device_put(ae_params, rep)
    else:
        unet_params = jax.device_put(unet_params)
        ae_params = jax.device_put(ae_params)

    all_seeds = np.arange(start_seed, stop_seed)
    outs = []
    for i in range(0, len(all_seeds), batch_size):
        seeds = all_seeds[i : i + batch_size]
        # pad to full batch so every device step reuses one compiled shape
        padded = np.concatenate([seeds, np.full(batch_size - len(seeds), seeds[-1])]) \
            if len(seeds) < batch_size else seeds
        args = (unet_params, ae_params, sf, base_key, jnp.asarray(padded))
        if conditional:
            args += (jnp.full((batch_size,), stage, jnp.int32),)
        if guided:
            args += (jnp.float32(guidance_scale),)
        sig = sampler(*args)
        sig = np.asarray(jax.device_get(sig))[: len(seeds)]
        write_sample_artifacts(output_dir, seeds.tolist(), sig, compute_psd)
        outs.append(sig)
    return np.concatenate(outs, axis=0)
