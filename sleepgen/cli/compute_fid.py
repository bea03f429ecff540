"""CLI: FID evaluation (reference ``src/compute_fid.py`` — synthetic vs
test over USleep bottleneck features; ``compute_fid_train_test.py`` — the
test-vs-test floor)."""
from __future__ import annotations

import argparse
from glob import glob


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path_test_ids", type=str, required=True)
    p.add_argument("--path_pre_processed", type=str, required=True)
    p.add_argument("--sample_dir", type=str, default=None,
                   help="dir of sample_*.npy; omit for the test-vs-test floor")
    p.add_argument("--usleep_checkpoint", type=str, default=None,
                   help="orbax dir of trained USleep variables; random init "
                        "(seeded) when absent")
    p.add_argument("--usleep_torch_params", type=str, default=None,
                   help="torch .pt state_dict (the reference's pretrained "
                        "/project/params.pt, compute_fid.py:367-370)")
    p.add_argument("--dataset", type=str, default="edfx")
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=256)
    return p


def load_usleep(checkpoint: str | None, seed: int = 0,
                torch_params: str | None = None):
    import jax
    import jax.numpy as jnp

    from sleepgen.nn import USleep
    from sleepgen.utils import CheckpointManager

    m = USleep(in_chans=2, sfreq=100, depth=12, n_classes=5, input_size_s=30)
    x = jnp.zeros((1, 3000, 2))
    variables = jax.jit(lambda k, x: m.init(k, x, train=False))(
        jax.random.PRNGKey(seed), x)
    if torch_params:
        import torch

        from sleepgen.utils.torch_import import import_usleep

        sd = torch.load(torch_params, map_location="cpu")
        variables = import_usleep(sd, depth=12)
    elif checkpoint:
        ckpt = CheckpointManager(checkpoint)
        variables = ckpt.restore_best(jax.device_get(variables), name="usleep")
        ckpt.close()
    return m, variables


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    import numpy as np

    from sleepgen.data import load_split
    from sleepgen.data.transforms import center_crop_valid, to_blc
    from sleepgen.eval import compute_fid, frechet_distance, usleep_fid_features

    args = build_parser().parse_args(argv)
    ds = load_split(args.path_test_ids, args.path_pre_processed, args.dataset)
    windows = center_crop_valid(ds.epoch_windows(np.random.default_rng(args.seed)))

    m, variables = load_usleep(args.usleep_checkpoint, args.seed,
                               args.usleep_torch_params)

    if args.sample_dir:
        files = sorted(glob(f"{args.sample_dir}/sample_*.npy"))
        synth = to_blc(np.concatenate([np.load(f) for f in files], axis=0))
        fid = compute_fid(m, variables, windows, synth, args.batch_size)
        print(f"FID (synthetic vs test): {fid:.6f}")
    else:
        feats = usleep_fid_features(m, variables, windows, args.batch_size)
        half = len(feats) // 2
        fid = frechet_distance(feats[:half], feats[half : 2 * half])
        print(f"FID (test vs test floor): {fid:.6f}")
    return fid


if __name__ == "__main__":
    main()
