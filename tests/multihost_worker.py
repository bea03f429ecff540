"""Subprocess worker for tests/test_multihost.py.

Runs ONE data-parallel LDM train step on a 2-device ``data`` mesh in one of
two modes and writes ``{loss, param_norm, n_devices, n_processes}`` JSON:

  * ``--mode multi``: two coordinated processes (one local CPU device each)
    brought up through ``sleepgen.parallel.initialize_distributed`` — the
    real multi-host path (``jax.distributed.initialize`` + gloo CPU
    collectives standing in for DCN/ICI).
  * ``--mode single``: one process with two virtual CPU devices — the
    configuration every other test exercises.

The losses and updated parameters must match across modes: the gradient
psum XLA inserts for the sharded batch is the same program either way.
Determinism comes from fixed PRNG keys and a fixed numpy batch; every
array entering the jitted step is globalized explicitly with
``jax.make_array_from_process_local_data`` (replicated leaves carry
identical host values on both processes, batch leaves carry the local
shard).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["multi", "single"], required=True)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--num_processes", type=int, default=2)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--probe", action="store_true",
                   help="bring-up only: mesh + one cross-process reduction "
                        "(seconds, for the default test suite); without it "
                        "the full LDM train step runs (slow-marked)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.mode == "multi":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        from sleepgen.parallel import initialize_distributed

        initialize_distributed(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id)

    if args.probe:
        _probe(args)
        return

    import jax.numpy as jnp
    import numpy as np
    import optax

    from sleepgen.utils import jit_init
    from sleepgen.config import Config
    from sleepgen.parallel import batch_sharding, make_mesh, replicated
    from sleepgen.train.train_aekl import build_models
    from sleepgen.train.train_ldm import (DiffusionState, build_unet,
                                          make_ldm_train_step, make_schedule)

    assert jax.device_count() == 2, jax.devices()

    cfg = Config()
    cfg.dtype = "float32"
    cfg.aekl.num_channels = [2, 2, 4]
    cfg.unet.model_channels = 16
    cfg.unet.channel_mult = [1, 2]
    cfg.unet.num_res_blocks = 1
    cfg.unet.norm_num_groups = 8
    # no attention level: the mesh/psum semantics under test do not depend
    # on the attention op, and dropping it roughly halves the CPU compile
    cfg.unet.attention_resolutions = []
    window = 128
    cfg.unet.image_size = window // 4

    rng = jax.random.PRNGKey(0)
    ae, _ = build_models(cfg, jnp.float32)
    unet = build_unet(cfg, 1, 1, jnp.float32)
    x0 = jnp.zeros((2, window, 1), jnp.float32)
    ae_params = jax.device_get(jit_init(ae, {"params": rng}, x0, rng)["params"])
    z0 = jnp.zeros((2, window // 4, 1), jnp.float32)
    unet_params = jax.device_get(
        jit_init(unet, rng, z0, jnp.zeros((2,), jnp.int32))["params"])

    mesh = make_mesh()
    bsh, rsh = batch_sharding(mesh), replicated(mesh)

    def globalize(tree, sharding):
        return jax.tree_util.tree_map(
            lambda a: jax.make_array_from_process_local_data(
                sharding, np.asarray(a)), tree)

    batch_np = np.random.RandomState(7).standard_normal(
        (8, window, 1)).astype(np.float32)
    if args.mode == "multi":
        per = batch_np.shape[0] // args.num_processes
        local = batch_np[args.process_id * per:(args.process_id + 1) * per]
        batch = jax.make_array_from_process_local_data(
            bsh, local, global_shape=batch_np.shape)
    else:
        batch = jax.make_array_from_process_local_data(bsh, batch_np)

    # scale factor computed host-locally on the FULL batch (identical on
    # both processes), then globalized with everything else
    z = ae.apply({"params": ae_params}, jnp.asarray(batch_np),
                 jax.random.PRNGKey(1),
                 method=type(ae).encode_stage_2_inputs)
    scale_factor = np.float32(1.0 / np.std(np.asarray(z, np.float32)))

    opt = optax.adam(1e-3)
    state_host = DiffusionState(
        step=np.zeros((), np.int32),
        params=unet_params,
        opt=jax.device_get(opt.init(unet_params)),
        best_loss=np.asarray(np.inf, np.float32),
        scale_factor=scale_factor,
        ema_params=None)
    state = globalize(state_host, rsh)
    ae_params_g = globalize(ae_params, rsh)
    rng_g = jax.make_array_from_process_local_data(
        rsh, np.asarray(jax.random.PRNGKey(3)))

    train_step = make_ldm_train_step(unet, ae, ae_params_g, make_schedule(cfg),
                                     opt)
    new_state, metrics = train_step(state, batch, rng_g)
    loss = float(jax.device_get(metrics["loss"]))
    leaves = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
    param_norm = float(np.sqrt(sum(
        float(np.sum(np.square(np.asarray(l, np.float64)))) for l in leaves)))

    Path(args.out).write_text(json.dumps({
        "loss": loss,
        "param_norm": param_norm,
        "n_devices": jax.device_count(),
        "n_processes": jax.process_count(),
    }))
    print(f"[{args.mode}:{args.process_id}] loss={loss:.8f} "
          f"param_norm={param_norm:.8f}", flush=True)


def _probe(args) -> None:
    """Mesh bring-up + one batch-sharded global reduction, no model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sleepgen.parallel import batch_sharding, make_mesh

    assert jax.device_count() == 2, jax.devices()
    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    global_batch = np.arange(64, dtype=np.float32).reshape(8, 8) + 1.0
    if args.mode == "multi":
        per = global_batch.shape[0] // args.num_processes
        local = global_batch[args.process_id * per:(args.process_id + 1) * per]
        arr = jax.make_array_from_process_local_data(
            bsh, local, global_shape=global_batch.shape)
    else:
        arr = jax.make_array_from_process_local_data(bsh, global_batch)
    # mean over the sharded batch axis forces a cross-device (and, in multi
    # mode, cross-process) reduction
    out = float(jax.jit(lambda x: jnp.mean(x * 2.0))(arr))
    Path(args.out).write_text(json.dumps({
        "loss": out,
        "n_devices": jax.device_count(),
        "n_processes": jax.process_count(),
    }))
    print(f"[probe {args.mode}:{args.process_id}] mean={out}", flush=True)


if __name__ == "__main__":
    main()
