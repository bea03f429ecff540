"""Training-step component ablation on the real chip (round-3 MFU work).

The round-1/2 tables left the LDM train step at ~93 TFLOP/s (~47% of v5e
bf16 peak) while the sampler reached 81%. This bench isolates where the
training step spends its time, mirroring benches/ablate_unet.py's
discipline for the sampling path:

  full       the production fused step (frozen encode + noise + UNet
             fwd/bwd + Adam), per batch size
  fwd        loss forward only (no grad) — fwd/bwd cost split
  fwd_bwd    value_and_grad without the optimizer update — Adam cost
  no_encode  z precomputed host-side — frozen stage-1 encode cost
  fastmath   UNet cloned with fast_math=True inside the train step
             (bf16 GN compute + attention matmuls, fp32 stats/softmax) —
             the sampling lever applied to training; quality gate lives
             in tests/test_precision.py + the demo harness
  scan4      4 minibatches per dispatch via lax.scan — dispatch-overhead
             bound check
  aekl       the fused AEKL G/D step, per batch size

Each line reports windows/s, sec/step, and (for jitted steps whose cost
analysis resolves) sustained TFLOP/s vs the 197 TFLOP/s v5e bf16 peak.

Usage: python benches/ablate_train.py [--batches 256,512,1024]
       [--variants full,fwd,fwd_bwd,no_encode,fastmath,scan4,aekl]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import optax

from sleepgen.config import Config
from sleepgen.diffusion import NoiseSchedule
from sleepgen.nn import AutoencoderKL
from sleepgen.train.train_aekl import init_state, make_train_step
from sleepgen.train.train_ldm import (DiffusionState, build_unet,
                                      make_ldm_train_step, make_schedule)

V5E_BF16_PEAK_TFLOPS = 197.0


def _bench(step, state, batch, rng, iters):
    """Thread donated state; vary rng per call (relay memoization hazard)."""
    state, m = step(state, batch, jax.random.fold_in(rng, 9999))
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / iters


def _flops(step, state, batch, rng):
    try:
        cost = step.lower(state, batch, rng).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def _emit(name, batch_size, dt, flops=None):
    rec = {"variant": name, "batch": batch_size,
           "windows_per_sec": round(batch_size / dt, 1),
           "sec_per_step": round(dt, 4)}
    if flops:
        tf = flops / dt / 1e12
        rec["tflops_per_sec"] = round(tf, 1)
        rec["pct_bf16_peak"] = round(100 * tf / V5E_BF16_PEAK_TFLOPS, 1)
    print(json.dumps(rec), flush=True)
    return rec


def _ldm_parts(cfg, dtype, rng, fast_math=False):
    from sleepgen.train.train_aekl import build_models

    ae, _ = build_models(cfg, dtype)
    x = jnp.zeros((2, 3072, 1), dtype)
    ae_params = ae.init({"params": rng}, x, rng)["params"]
    unet = build_unet(cfg, 1, 1, dtype)
    if fast_math:
        unet = unet.clone(fast_math=True)
    z0 = jnp.zeros((2, 768, 1), jnp.float32)
    params = unet.init(rng, z0, jnp.zeros((2,), jnp.int32))["params"]
    opt = optax.adam(1e-4)
    state = DiffusionState(
        step=jnp.zeros((), jnp.int32), params=params, opt=opt.init(params),
        best_loss=jnp.asarray(jnp.inf, jnp.float32),
        scale_factor=jnp.asarray(1.0, jnp.float32))
    return ae, ae_params, unet, opt, state, make_schedule(cfg)


def _loss_parts(unet, sched: NoiseSchedule, z, rng, params):
    k_t, k_noise = jax.random.split(rng)
    t = jax.random.randint(k_t, (z.shape[0],), 0, sched.num_timesteps)
    noise = jax.random.normal(k_noise, z.shape, jnp.float32)
    noisy = sched.add_noise(z, noise, t)
    target = (sched.velocity(z, noise, t)
              if sched.prediction_type == "v_prediction" else noise)
    pred = unet.apply({"params": params}, noisy, t)
    return jnp.mean((pred.astype(jnp.float32) - target) ** 2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="256,512,1024")
    p.add_argument("--variants", type=str,
                   default="full,fwd,fwd_bwd,no_encode,fastmath,scan4,aekl")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--small", action="store_true",
                   help="tiny model for smoke-testing the bench itself")
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]
    variants = set(args.variants.split(","))

    from sleepgen.utils.profiling import tpu_contact

    tpu_contact()

    cfg = Config()
    cfg.aekl.num_channels = [32, 32, 64]
    cfg.aekl.latent_channels = 1
    if args.small:
        cfg.aekl.num_channels = [2, 2, 4]
        cfg.unet.model_channels = 16
        cfg.unet.norm_num_groups = 8
        cfg.unet.channel_mult = [1, 2]
        cfg.unet.attention_resolutions = [2]
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    ae, ae_params, unet, opt, state0, sched = _ldm_parts(cfg, dtype, rng)

    def fresh_state():
        return jax.tree_util.tree_map(jnp.copy, state0)

    # ---- full fused step across batch sizes
    if "full" in variants:
        step = make_ldm_train_step(unet, ae, ae_params, sched, opt)
        for b in batches:
            batch = jax.random.uniform(rng, (b, 3072, 1), dtype)
            st = fresh_state()
            fl = _flops(step, st, batch, rng)
            dt = _bench(step, fresh_state(), batch, rng, args.iters)
            _emit("ldm_full", b, dt, fl)

    b0 = batches[0]
    batch0 = jax.random.uniform(rng, (b0, 3072, 1), dtype)

    # ---- forward-only loss (encode + noise + UNet fwd)
    if "fwd" in variants:
        @jax.jit
        def fwd(state, batch, rng):
            k_enc, k_rest = jax.random.split(jax.random.fold_in(rng, state.step))
            z = ae.apply({"params": ae_params}, batch, k_enc,
                         method=AutoencoderKL.encode_stage_2_inputs)
            z = jax.lax.stop_gradient(z.astype(jnp.float32)) * state.scale_factor
            loss = _loss_parts(unet, sched, z, k_rest, state.params)
            return state, {"loss": loss}

        dt = _bench(fwd, fresh_state(), batch0, rng, args.iters)
        _emit("ldm_fwd_only", b0, dt, _flops(fwd, fresh_state(), batch0, rng))

    # ---- fwd+bwd, no optimizer update
    if "fwd_bwd" in variants:
        @jax.jit
        def fwd_bwd(state, batch, rng):
            k_enc, k_rest = jax.random.split(jax.random.fold_in(rng, state.step))
            z = ae.apply({"params": ae_params}, batch, k_enc,
                         method=AutoencoderKL.encode_stage_2_inputs)
            z = jax.lax.stop_gradient(z.astype(jnp.float32)) * state.scale_factor
            loss, grads = jax.value_and_grad(
                lambda p: _loss_parts(unet, sched, z, k_rest, p))(state.params)
            gn = optax.global_norm(grads)
            return state, {"loss": loss, "gn": gn}

        dt = _bench(fwd_bwd, fresh_state(), batch0, rng, args.iters)
        _emit("ldm_fwd_bwd", b0, dt, _flops(fwd_bwd, fresh_state(), batch0, rng))

    # ---- encode replaced by precomputed latents
    if "no_encode" in variants:
        z_fixed = jax.random.normal(rng, (b0, 768, 1), jnp.float32)

        @jax.jit
        def no_encode(state, z, rng):
            step_rng = jax.random.fold_in(rng, state.step)
            _, k_rest = jax.random.split(step_rng)
            loss, grads = jax.value_and_grad(
                lambda p: _loss_parts(unet, sched, z, k_rest, p))(state.params)
            updates, new_opt = opt.update(grads, state.opt, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=new_params,
                                 opt=new_opt), {"loss": loss}

        dt = _bench(no_encode, fresh_state(), z_fixed, rng, args.iters)
        _emit("ldm_no_encode", b0, dt,
              _flops(no_encode, fresh_state(), z_fixed, rng))

    # ---- fast-math UNet inside the training step
    if "fastmath" in variants:
        _, _, unet_fm, opt_fm, state_fm, _ = _ldm_parts(cfg, dtype, rng,
                                                        fast_math=True)
        step_fm = make_ldm_train_step(unet_fm, ae, ae_params, sched, opt_fm)
        for b in batches:
            batch = jax.random.uniform(rng, (b, 3072, 1), dtype)
            st = jax.tree_util.tree_map(jnp.copy, state_fm)
            fl = _flops(step_fm, st, batch, rng)
            dt = _bench(step_fm, jax.tree_util.tree_map(jnp.copy, state_fm),
                        batch, rng, args.iters)
            _emit("ldm_full_fastmath", b, dt, fl)

    # ---- k minibatches per dispatch
    if "scan4" in variants:
        K = 4
        inner = make_ldm_train_step(unet, ae, ae_params, sched, opt)

        @jax.jit
        def scan_step(state, batches_k, rng):
            def body(st, xs):
                b, i = xs
                st, m = inner(st, b, jax.random.fold_in(rng, i))
                return st, m["loss"]

            state, losses = jax.lax.scan(
                body, state, (batches_k, jnp.arange(K)))
            return state, {"loss": losses.mean()}

        batches_k = jax.random.uniform(rng, (K, b0, 3072, 1), dtype)
        st = fresh_state()
        st, m = scan_step(st, batches_k, jax.random.fold_in(rng, 9999))
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for i in range(args.iters):
            st, m = scan_step(st, batches_k, jax.random.fold_in(rng, i))
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / args.iters / K  # per minibatch
        _emit(f"ldm_scan{K}_per_minibatch", b0, dt)

    # ---- all randomness + encode precomputed: pure UNet fwd/bwd/Adam.
    # vs no_encode this isolates the in-step threefry (normal/randint) cost
    if "precomputed" in variants:
        k_t, k_n = jax.random.split(rng)
        t_fix = jax.random.randint(k_t, (b0,), 0, sched.num_timesteps)
        noise_fix = jax.random.normal(k_n, (b0, 768, 1), jnp.float32)
        z_fix = jax.random.normal(rng, (b0, 768, 1), jnp.float32)
        noisy_fix = sched.add_noise(z_fix, noise_fix, t_fix)

        @jax.jit
        def precomputed(state, noisy, rng):
            # rng arg only varies the dispatch signature (relay memoization)
            loss, grads = jax.value_and_grad(lambda p: jnp.mean((
                unet.apply({"params": p}, noisy, t_fix).astype(jnp.float32)
                - noise_fix) ** 2))(state.params)
            updates, new_opt = opt.update(grads, state.opt, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=new_params,
                                 opt=new_opt), {"loss": loss + 0.0 * rng[0]}

        # vary noisy per call instead of rng
        noisies = [noisy_fix + 1e-6 * i for i in range(args.iters + 1)]
        st = fresh_state()
        st, m = precomputed(st, noisies[-1], rng)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for i in range(args.iters):
            st, m = precomputed(st, noisies[i], rng)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / args.iters
        _emit("ldm_precomputed_inputs", b0, dt,
              _flops(precomputed, fresh_state(), noisy_fix, rng))

    # ---- component swaps inside the TRAIN step (the sampling ablation's
    # discipline, benches/ablate_unet.py): identity upper bounds, plus the
    # hand-derived GroupNorm VJP candidate (sleepgen.nn.fused_norm)
    swap_variants = {"gn_identity", "attn_identity", "gn_attn_identity",
                     "custom_gn", "custom_gn_fastmath"}
    if variants & swap_variants:
        import contextlib

        from flax import linen as nn

        import sleepgen.nn.layers as layers_mod
        import sleepgen.nn.unet1d as unet1d_mod
        from benches.ablate_unet import AttnIdentity, GNIdentity
        from sleepgen.nn.fused_norm import group_norm_silu

        class GNCustomVJP(layers_mod.GroupNorm32):
            """GroupNorm32 routed through the closed-form-VJP kernel."""

            @nn.compact
            def __call__(self, x):
                scale, bias = layers_mod._GNParams(
                    x.shape[-1], name="GroupNorm_0")()
                return group_norm_silu(x, scale, bias, self.num_groups,
                                       self.epsilon, self.fuse_silu,
                                       self.compute_dtype)

        @contextlib.contextmanager
        def swapped(gn=None, attn=None):
            og, oa = layers_mod.GroupNorm32, layers_mod.AttentionBlock1d
            try:
                if gn is not None:
                    layers_mod.GroupNorm32 = unet1d_mod.GroupNorm32 = gn
                if attn is not None:
                    layers_mod.AttentionBlock1d = attn
                    unet1d_mod.AttentionBlock1d = attn
                yield
            finally:
                layers_mod.GroupNorm32 = unet1d_mod.GroupNorm32 = og
                layers_mod.AttentionBlock1d = oa
                unet1d_mod.AttentionBlock1d = oa

        for name, kw, fm in [
            ("gn_identity", {"gn": GNIdentity}, False),
            ("attn_identity", {"attn": AttnIdentity}, False),
            ("gn_attn_identity", {"gn": GNIdentity, "attn": AttnIdentity},
             False),
            ("custom_gn", {"gn": GNCustomVJP}, False),
            ("custom_gn_fastmath", {"gn": GNCustomVJP}, True),
        ]:
            if name not in variants:
                continue
            with swapped(**kw):
                _, _, unet_v, opt_v, state_v, _ = _ldm_parts(cfg, dtype, rng,
                                                             fast_math=fm)
                step_v = make_ldm_train_step(unet_v, ae, ae_params, sched,
                                             opt_v)
                batch = jax.random.uniform(rng, (b0, 3072, 1), dtype)
                dt = _bench(step_v,
                            jax.tree_util.tree_map(jnp.copy, state_v),
                            batch, rng, args.iters)
                _emit(f"ldm_full_{name}", b0, dt)

    # ---- rematerialization policies: save conv/dot outputs, recompute the
    # elementwise/norm chain in backward (trades cheap VPU recompute for
    # not storing + reloading normalized activations from HBM)
    remat_variants = {"remat_conv", "remat_conv_fastmath", "remat_nothing"}
    if variants & remat_variants:
        import functools

        def conv_saveable(prim, *_, **__):
            return prim.name in ("conv_general_dilated", "dot_general")

        def make_remat_step(u, policy):
            def train_step(state, batch, rng):
                step_rng = jax.random.fold_in(rng, state.step)
                k_enc, k_t, k_noise = jax.random.split(step_rng, 3)
                z = ae.apply({"params": ae_params}, batch, k_enc,
                             method=AutoencoderKL.encode_stage_2_inputs)
                z = jax.lax.stop_gradient(
                    z.astype(jnp.float32)) * state.scale_factor
                t = jax.random.randint(k_t, (batch.shape[0],), 0,
                                       sched.num_timesteps)
                noise = jax.random.normal(k_noise, z.shape, jnp.float32)
                noisy = sched.add_noise(z, noise, t)

                @functools.partial(jax.checkpoint, policy=policy)
                def loss_fn(params):
                    pred = u.apply({"params": params}, noisy, t)
                    return jnp.mean((pred.astype(jnp.float32) - noise) ** 2)

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                updates, new_opt = opt.update(grads, state.opt, state.params)
                new_params = optax.apply_updates(state.params, updates)
                return state.replace(step=state.step + 1, params=new_params,
                                     opt=new_opt), {"loss": loss}

            return jax.jit(train_step, donate_argnums=(0,))

        for name, policy, fm in [
            ("remat_conv", conv_saveable, False),
            ("remat_conv_fastmath", conv_saveable, True),
            ("remat_nothing", jax.checkpoint_policies.nothing_saveable, False),
        ]:
            if name not in variants:
                continue
            u = unet.clone(fast_math=True) if fm else unet
            step_r = make_remat_step(u, policy)
            batch = jax.random.uniform(rng, (b0, 3072, 1), dtype)
            dt = _bench(step_r, fresh_state(), batch, rng, args.iters)
            _emit(f"ldm_full_{name}", b0, dt)

    # ---- AEKL fused G/D step
    if "aekl" in variants:
        for b in batches:
            st, ae_m, disc, opt_g, opt_d = init_state(cfg, rng, window=3072,
                                                      dtype=dtype)
            gd = make_train_step(ae_m, disc, opt_g, opt_d, cfg)
            batch = jax.random.uniform(rng, (b, 3072, 1), dtype)
            fl = _flops(gd, st, batch, rng)
            st2, *_ = init_state(cfg, rng, window=3072, dtype=dtype)
            dt = _bench(gd, st2, batch, rng, args.iters)
            _emit("aekl_gd_full", b, dt, fl)


if __name__ == "__main__":
    main()
