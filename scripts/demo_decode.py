"""Round-2 decode demo on the real TPU (VERDICT r1 items 3+4):

  1. Train all three downstream sleep-staging variants on hermetic
     synthetic staged EEG — a: TimeDistributed Chambon (3-window
     sequences), b: plain Chambon, c: DeepSleepNet — and record balanced
     accuracy per variant (reference run_sleep_decode{,_b,_c}.py).
  2. Exercise the reference's real shipped decode checkpoints end-to-end:
     outputs/sleep_stage_chambon{,_b}/final_model.pth -> import -> full
     inference -> balanced accuracy on the synthetic eval split. (The
     checkpoints were trained on real Sleep-EDFx, so accuracy on synthetic
     stages is chance-level — the point is the full load+predict path runs
     on real reference weights, not just the importer parity test.)
  3. Train a USleep on the synthetic stages and save its params so
     compute_fid / demo_synthetic_e2e can use a *trained* feature space
     (reference compute_fid.py:354-389 uses a pretrained params.pt that
     the repo does not ship).

Writes the report JSON (default DEMO_DECODE_r3.json) at the repo root.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/demo_decode.py
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def train_usleep(x, y, x_val, y_val, n_epochs, batch_size, seed=0, depth=12):
    """Minimal USleep trainer (windows (B,3000,1) -> per-window stage);
    keeps the variables tree exactly USleep's so load_usleep can restore."""
    import optax

    from sleepgen.nn import USleep
    from sleepgen.train.decode import balanced_accuracy, weighted_cross_entropy
    from sleepgen.data.staging import balanced_class_weights

    m = USleep(in_chans=2, sfreq=100, depth=depth, n_classes=5, input_size_s=30)
    dup = lambda a: np.repeat(a, 2, axis=-1)  # 1 -> 2 chans (compute_fid.py:381)
    rng = jax.random.PRNGKey(seed)
    variables = jax.jit(lambda k, xb: m.init(k, xb, train=False))(
        rng, jnp.asarray(dup(x[:2])))
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    class_w = jnp.asarray(balanced_class_weights(y, 5))

    @jax.jit
    def step(params, batch_stats, opt_state, xb, yb):
        def loss_fn(p):
            (logits, _, _), mut = m.apply(
                {"params": p, "batch_stats": batch_stats}, xb, train=True,
                mutable=["batch_stats"])
            return weighted_cross_entropy(logits, yb, class_w), mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    @jax.jit
    def infer(params, batch_stats, xb):
        logits, _, _ = m.apply({"params": params, "batch_stats": batch_stats},
                               xb, train=False)
        return jnp.argmax(logits, axis=-1)

    np_rng = np.random.default_rng(seed)
    for epoch in range(n_epochs):
        order = np_rng.permutation(len(x))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                jnp.asarray(dup(x[idx])), jnp.asarray(y[idx]))

    def predict(xa):
        preds = []
        for i in range(0, len(xa), batch_size):
            xb = xa[i : i + batch_size]
            pad = batch_size - len(xb)
            if pad:
                xb = np.concatenate([xb, np.repeat(xb[-1:], pad, 0)])
            p = np.asarray(jax.device_get(infer(params, batch_stats,
                                                jnp.asarray(dup(xb)))))
            preds.append(p[: len(xa[i : i + batch_size])])
        return np.concatenate(preds)

    acc = balanced_accuracy(y_val, predict(x_val), 5)
    return {"params": params, "batch_stats": batch_stats}, acc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="/tmp/sleepgen_decode_r3")
    p.add_argument("--report", type=str, default="DEMO_DECODE_r3.json")
    p.add_argument("--n_recordings", type=int, default=48)
    p.add_argument("--n_epochs_per_rec", type=int, default=60)
    p.add_argument("--epochs_ab", type=int, default=60)
    p.add_argument("--epochs_c", type=int, default=30)
    p.add_argument("--usleep_epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--skip", type=str, default="",
                   help="comma list of steps to skip: a,b,c,ref,usleep")
    args = p.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    from sleepgen.data.staging import (center_label, make_synthetic_staged,
                                       sequence_indices)
    from sleepgen.nn.chambon import SleepStagerChambon2018, TimeDistributedStager
    from sleepgen.nn.deepsleepnet import DeepSleepNet
    from sleepgen.train.decode import balanced_accuracy, train_decoder
    from sleepgen.utils import CheckpointManager

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    # cache + first-contact marker for the retry supervisor (decode
    # train-step compiles through the relay are minutes-long)
    from sleepgen.utils.profiling import tpu_contact

    tpu_contact()
    report: dict = {"device": str(jax.devices()[0])}

    # Resumability for the retry supervisor: completed sections are persisted
    # to out/partial_report.json and skipped on rerun, so a mid-run relay
    # wedge costs at most one section.
    partial_path = out / "partial_report.json"
    # tie resume state to the hyperparameters: a rerun with the same --out
    # but different args must start fresh, not silently replay stale results
    run_params = {k: v for k, v in sorted(vars(args).items()) if k != "skip"}
    if partial_path.exists():
        prior = json.loads(partial_path.read_text())
        if prior.get("_run_params") != run_params:
            print("partial_report.json is from a different parameterization; "
                  "discarding it", flush=True)
            partial_path.unlink()
        else:
            report.update(prior)
            for sec, key in [("a", "variant_a"), ("b", "variant_b"),
                             ("c", "variant_c"), ("ref", "reference_ckpt_a"),
                             ("usleep", "usleep")]:
                if key in prior:
                    skip.add(sec)
            print(f"resuming; done sections: {sorted(prior)}", flush=True)
    report["_run_params"] = run_params

    def save_partial():
        partial_path.write_text(json.dumps(report, indent=1))

    x, y, rids = make_synthetic_staged(args.n_recordings, args.n_epochs_per_rec)
    recs = np.unique(rids)
    rng = np.random.RandomState(42)
    perm = rng.permutation(len(recs))
    n_test = int(np.ceil(len(recs) * 0.2))
    test_r, rest = recs[perm[:n_test]], recs[perm[n_test:]]
    n_val = int(np.ceil(len(rest) * 0.25))
    valid_r, train_r = rest[:n_val], rest[n_val:]
    take = lambda rs: (x[np.isin(rids, rs)], y[np.isin(rids, rs)],
                       rids[np.isin(rids, rs)])
    xtr, ytr, rtr = take(train_r)
    xva, yva, rva = take(valid_r)
    report["n_train_windows"] = int(len(xtr))
    report["n_valid_windows"] = int(len(xva))

    # variant a: 3-window sequences, center label
    str_, sva = sequence_indices(rtr, 3, 3), sequence_indices(rva, 3, 3)
    seq_tr = (xtr[str_], center_label(ytr, str_))
    seq_va = (xva[sva], center_label(yva, sva))

    if "a" not in skip:
        t = time.time()
        res_a = train_decoder(TimeDistributedStager(n_chans=1, sfreq=100),
                              seq_tr, seq_va, n_epochs=args.epochs_ab,
                              batch_size=args.batch_size, seed=1996)
        report["variant_a"] = {"best_valid_bal_acc": res_a.best_valid_bal_acc,
                               "sec": round(time.time() - t, 1)}
        print("variant a:", report["variant_a"], flush=True)
        save_partial()

    if "b" not in skip:
        t = time.time()
        res_b = train_decoder(
            SleepStagerChambon2018(n_chans=1, sfreq=100, dropout=0.5),
            (xtr, ytr), (xva, yva), n_epochs=args.epochs_ab,
            batch_size=32, seed=1996)
        report["variant_b"] = {"best_valid_bal_acc": res_b.best_valid_bal_acc,
                               "sec": round(time.time() - t, 1)}
        print("variant b:", report["variant_b"], flush=True)
        save_partial()

    if "c" not in skip:
        t = time.time()
        res_c = train_decoder(DeepSleepNet(n_outputs=5, sfreq=100),
                              (xtr, ytr), (xva, yva), n_epochs=args.epochs_c,
                              batch_size=128, seed=1996)
        report["variant_c"] = {"best_valid_bal_acc": res_c.best_valid_bal_acc,
                               "sec": round(time.time() - t, 1)}
        print("variant c:", report["variant_c"], flush=True)
        save_partial()

    # reference shipped checkpoints end-to-end
    if "ref" not in skip:
        import torch

        from sleepgen.utils.torch_import import (import_chambon,
                                                 import_chambon_sequence)

        ref = Path("/root/reference/outputs")
        if (ref / "sleep_stage_chambon/final_model.pth").exists():
            sd = torch.load(ref / "sleep_stage_chambon/final_model.pth",
                            map_location="cpu")
            variables = import_chambon_sequence(sd)
            m = TimeDistributedStager(n_chans=2, sfreq=100)
            xb = np.repeat(seq_va[0], 2, axis=-1)  # 1 -> 2 chans
            logits = np.asarray(jax.device_get(jax.jit(
                lambda v, a: m.apply(v, a, train=False))(
                variables, jnp.asarray(xb))))
            acc = balanced_accuracy(seq_va[1], logits.argmax(-1), 5)
            report["reference_ckpt_a"] = {
                "balanced_acc_on_synthetic": acc,
                "note": "real Sleep-EDFx weights on synthetic stages; "
                        "chance-level expected — proves the e2e path"}
            print("reference ckpt a:", report["reference_ckpt_a"], flush=True)
        if (ref / "sleep_stage_chambon_b/final_model.pth").exists():
            sd = torch.load(ref / "sleep_stage_chambon_b/final_model.pth",
                            map_location="cpu")
            variables = import_chambon(sd)
            mb = SleepStagerChambon2018(n_chans=2, sfreq=100,
                                        apply_batch_norm=True, pad_size_s=0.1)
            xb = np.repeat(xva, 2, axis=-1)
            logits = np.asarray(jax.device_get(jax.jit(
                lambda v, a: mb.apply(v, a, train=False))(
                variables, jnp.asarray(xb))))
            acc = balanced_accuracy(yva, logits.argmax(-1), 5)
            report["reference_ckpt_b"] = {"balanced_acc_on_synthetic": acc}
            print("reference ckpt b:", report["reference_ckpt_b"], flush=True)
        save_partial()

    if "usleep" not in skip:
        t = time.time()
        variables, acc = train_usleep(xtr, ytr, xva, yva,
                                      args.usleep_epochs, args.batch_size)
        ck = CheckpointManager(out / "usleep_run")
        ck.save_best(jax.device_get(variables), name="usleep")
        ck.close()
        report["usleep"] = {"valid_bal_acc": acc,
                            "checkpoint": str(out / "usleep_run"),
                            "sec": round(time.time() - t, 1)}
        print("usleep:", report["usleep"], flush=True)
        save_partial()

    report["wall_clock_sec"] = round(time.time() - t0, 1)
    report.pop("_run_params", None)
    Path(args.report).write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))
    # a fully successful run leaves no resume state behind
    if partial_path.exists():
        partial_path.unlink()


if __name__ == "__main__":
    main()
