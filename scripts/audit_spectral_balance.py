"""Spectral (Jukebox) loss-balance audit — VERDICT r3 weak #2 / task 2.

The reference's spectral term is ``JukeboxLoss(reduction="sum")`` summed
over the BATCH while the L1 term is a mean
(``/root/reference/src/train_autoencoderkl.py:158,205-216``), so the
spectral:L1 balance scales linearly with batch size. The shipped config
trains at batch 2048 (``config/config_aekl_eeg.yaml:3``); sleepgen's
round-3 spectral flagship demo trained at batch 256 — a *different* loss
balance (1/8 the relative spectral weight). This script measures the
actual spectral:L1 gradient-norm ratio across batch sizes at two
parameter points (init and after a short no-spectral warm phase) and
reports the equivalent-weight table: what ``spectral_weight`` reproduces
the reference's batch-2048 balance at any training batch.

Writes SPECTRAL_AUDIT JSON (repo root name chosen by the caller).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="/tmp/sleepgen_spec_audit")
    p.add_argument("--report", type=str, default=None,
                   help="also copy report.json to this path")
    p.add_argument("--batches", type=str, default="256,1024,2048")
    p.add_argument("--warm_epochs", type=int, default=100,
                   help="no-spectral warm phase so the ratio is measured "
                        "at a realistic operating point, not just init")
    p.add_argument("--latent_channels", type=int, default=1)
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    from sleepgen.config import Config
    from sleepgen.data import WindowDataset, make_synthetic_dataset
    from sleepgen.losses import jukebox_loss
    from sleepgen.train.train_aekl import init_state, train_aekl
    from sleepgen.utils import CheckpointManager
    from sleepgen.utils.profiling import enable_compilation_cache, tpu_contact

    enable_compilation_cache()
    tpu_contact()
    t0 = time.time()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    cfg = Config()
    cfg.train.output_dir = str(out)
    cfg.train.batch_size = 256
    cfg.train.n_epochs = args.warm_epochs
    cfg.train.val_interval = max(args.warm_epochs, 1)
    cfg.aekl.num_channels = [32, 32, 64]
    cfg.aekl.latent_channels = args.latent_channels
    cfg.losses.kl_weight = 1e-9
    spec_w = cfg.losses.spectral_weight
    ref_batch = 2048  # config/config_aekl_eeg.yaml:3

    n_rec = max(batches)
    # one window per recording per epoch (reference loader semantics), so
    # the largest batch needs that many recordings; 40 s each is enough
    # for the 3000-sample crop and keeps host RAM at ~35 MB
    raws = make_synthetic_dataset(n_rec, duration_s=40.0)
    ds = WindowDataset.from_raw(raws)
    print(f"[{time.time()-t0:.0f}s] fixture: {n_rec} recordings", flush=True)

    state, ae, *_ = init_state(cfg, jax.random.PRNGKey(0))
    params_init = jax.device_get(state.params_g)

    # short no-spectral warm phase at the demo batch (256): the published
    # demos measured quality from this regime, so the ratio there is the
    # operative one
    print(f"[{time.time()-t0:.0f}s] warm phase: {args.warm_epochs} epochs "
          f"no-spectral @ batch 256...", flush=True)
    res = train_aekl(cfg, ds, ds, run_name="warm_aekl")
    ck = CheckpointManager(res.run_dir)
    params_warm = ck.restore_best(params_init, name="final_model")
    ck.close()

    def l1_fn(params, x, rng):
        recon, _, _ = ae.apply({"params": params}, x, rng)
        return jnp.mean(jnp.abs(recon.astype(jnp.float32)
                                - x.astype(jnp.float32)))

    def spec_fn(params, x, rng):
        recon, _, _ = ae.apply({"params": params}, x, rng)
        return spec_w * jukebox_loss(recon.astype(jnp.float32),
                                     x.astype(jnp.float32),
                                     axis=-2, reduction="sum")

    g_l1 = jax.jit(jax.grad(l1_fn))
    g_spec = jax.jit(jax.grad(spec_fn))
    v_l1 = jax.jit(l1_fn)
    v_spec = jax.jit(spec_fn)

    def gnorm(tree):
        return float(jnp.sqrt(sum(jnp.sum(jnp.square(x))
                                  for x in jax.tree_util.tree_leaves(tree))))

    rng = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(0)
    wins = ds.epoch_windows(np_rng)  # (n_rec, 3072, 1)

    rows = []
    for point, params in (("init", params_init), ("warm", params_warm)):
        for b in batches:
            x = jnp.asarray(wins[:b])
            r = {
                "point": point, "batch": b,
                "l1_loss": float(v_l1(params, x, rng)),
                "spec_loss_weighted": float(v_spec(params, x, rng)),
                "l1_grad_norm": gnorm(g_l1(params, x, rng)),
                "spec_grad_norm": gnorm(g_spec(params, x, rng)),
            }
            r["spec_to_l1_grad_ratio"] = (r["spec_grad_norm"]
                                          / max(r["l1_grad_norm"], 1e-30))
            rows.append(r)
            print(f"[{time.time()-t0:.0f}s] {r}", flush=True)

    # linear-in-batch check per parameter point, plus the equivalent-weight
    # table for training at non-reference batches
    by_point = {}
    for point in ("init", "warm"):
        rs = {r["batch"]: r for r in rows if r["point"] == point}
        base = rs[min(batches)]
        by_point[point] = {
            "ratio_vs_batch": {str(b): rs[b]["spec_to_l1_grad_ratio"]
                               for b in batches},
            "scaling_vs_linear": {
                str(b): rs[b]["spec_to_l1_grad_ratio"]
                / base["spec_to_l1_grad_ratio"] / (b / min(batches))
                for b in batches},
        }
    report = {
        "spectral_weight": spec_w,
        "reference_batch": ref_batch,
        "rows": rows,
        "summary": by_point,
        "equivalent_weight_at_batch": {
            str(b): spec_w * ref_batch / b for b in batches},
        "warm_epochs": args.warm_epochs,
        "wall_clock_sec": round(time.time() - t0, 1),
    }
    (out / "report.json").write_text(json.dumps(report, indent=1))
    if args.report:
        Path(args.report).write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
