"""sleepgen benchmark — headline: LDM sampling throughput (windows/sec).

Workload parity with the reference's north-star path
(``src/sample_trials.py:149-163``): 200-step DDIM in a (768, latent=1)
latent space with the full UNet (model_channels 128, channel_mult [1,2,4])
followed by the stage-1 AEKL [32,32,64] decode and border crop — i.e. the
cost of producing one 30 s synthetic EEG window end-to-end.

The reference publishes no wall-clock numbers (BASELINE.md); the baseline
constant below is the measured-order estimate for the reference's batch-1
PyTorch/MONAI loop on A100 documented in BASELINE.md ("Measured baseline"
section). vs_baseline = ours / that estimate.

Prints ONE JSON line:
  {"metric": "ldm_sample_windows_per_sec", "value": N, "unit": "windows/s",
   "vs_baseline": R}
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from sleepgen.config import Config
from sleepgen.sample.sample_ldm import make_ldm_sampler, sampling_schedule
from sleepgen.train.train_aekl import build_models
from sleepgen.train.train_ldm import build_unet

# Estimated reference throughput (A100, batch-1 DDIM-200 loop, PyTorch +
# MONAI): see BASELINE.md "Measured baseline" for the derivation.
REFERENCE_WINDOWS_PER_SEC = 2.0

BATCH = 64  # sweep: 52.6 w/s @64, 50.1 @128, 44.6 @256, 41.1 @512
STEPS = 200
LATENT_LEN = 768
LATENT_CH = 1

# supervision knobs (see _supervised)
CONTACT_DEADLINE = 300  # wedged attempts (no TPU_CONTACT_OK) die here
FULL_BUDGET = 2400      # post-contact budget (slow cold compiles)
ATTEMPTS = 6
POLL_S = 5.0


def main():
    from sleepgen.utils.profiling import tpu_contact

    # prints TPU_CONTACT_OK after the first trivial device op — the
    # supervisor uses it to kill wedged-at-first-request attempts early
    tpu_contact()
    cfg = Config()
    cfg.aekl.num_channels = [32, 32, 64]
    cfg.aekl.latent_channels = LATENT_CH
    cfg.unet.image_size = LATENT_LEN
    cfg.diffusion.num_inference_steps = STEPS

    dtype = jnp.bfloat16
    ae, _ = build_models(cfg, dtype)
    # sampling fast-math: bf16 GN compute / attention matmuls, fp32 stats +
    # softmax (cfg.fast_sampling_math default; FID-gated, benches/ablate_unet)
    unet = build_unet(cfg, LATENT_CH, LATENT_CH, dtype).clone(fast_math=True)
    sched = sampling_schedule(cfg)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, LATENT_LEN * 4, 1), dtype)
    ae_params = ae.init({"params": rng}, x, rng)["params"]
    z0 = jnp.zeros((2, LATENT_LEN, LATENT_CH), dtype)
    unet_params = unet.init(rng, z0, jnp.zeros((2,), jnp.int32))["params"]

    sampler = make_ldm_sampler(unet, ae, sched, LATENT_LEN, LATENT_CH, STEPS)
    sf = jnp.float32(1.0)
    seeds = jnp.arange(BATCH)

    # compile + warmup
    out = sampler(unet_params, ae_params, sf, rng, seeds)
    out.block_until_ready()

    n_iters = 4
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = sampler(unet_params, ae_params, sf, jax.random.fold_in(rng, i), seeds)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    windows_per_sec = BATCH * n_iters / dt
    print(json.dumps({
        "metric": "ldm_sample_windows_per_sec",
        "value": round(windows_per_sec, 2),
        "unit": "windows/s",
        "vs_baseline": round(windows_per_sec / REFERENCE_WINDOWS_PER_SEC, 2),
        "baseline_note": "vs_baseline divides by 2.0 w/s — an ANALYTIC "
                         "estimate of the reference's batch-1 A100 DDIM-200 "
                         "loop (it publishes no wall-clock numbers); "
                         "derivation in BASELINE.md 'Measured baseline'",
    }))


def _wait_for_tpu_exclusive(max_wait_s=None):
    """Block until no gate-queue process holds the TPU (bounded).

    The relay serves ONE client; a second one deadlocks waiting forever
    (memory: single TPU client). The driver runs bench.py at end-of-round
    while a detached gate queue (scripts/run_r5_queue.sh under
    run_with_tpu_retry.sh) may still be training — so scan /proc cmdlines
    for a live queue/supervisor and wait for it to finish before
    dispatching. Detection only; never kills anything. Bounded by
    $SLEEPGEN_TPU_WAIT_SECS (default 5400 s) after which the bench
    proceeds and takes its chances with its own retry supervision.
    """
    import os
    import sys

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("SLEEPGEN_TPU_WAIT_SECS", 5400))
    needles = (b"run_r5_queue.sh", b"run_r4_queue2.sh", b"run_with_tpu_retry")
    t0 = time.monotonic()
    warned = False
    while time.monotonic() - t0 < max_wait_s:
        holders = []
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == os.getpid():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read()
            except OSError:
                continue
            if any(n in cmd for n in needles):
                holders.append(pid)
        if not holders:
            if warned:
                print("bench: TPU queue finished; proceeding",
                      file=sys.stderr, flush=True)
            return
        if not warned or int(time.monotonic() - t0) % 300 < 30:
            print(f"bench: waiting for TPU gate queue (pids {holders}) — "
                  f"{int(time.monotonic() - t0)}s elapsed of "
                  f"{int(max_wait_s)}s budget", file=sys.stderr, flush=True)
            warned = True
        time.sleep(30)
    print(f"bench: queue still alive after {int(max_wait_s)}s — proceeding "
          "anyway (bench retries may contend with it)",
          file=sys.stderr, flush=True)


def _supervised():
    """Run main() in a child process with timeout+retry.

    The device relay occasionally wedges a fresh client forever at its
    first request (see scripts/run_with_tpu_retry.sh); a retry in a new
    process succeeds. The bench is the round's headline metric, so it
    protects itself with the same two-phase supervision as the retry
    script: a wedged attempt never prints TPU_CONTACT_OK (main() does a
    trivial device op first), so it is killed after CONTACT_DEADLINE
    instead of burning the full budget — that lets the attempt count be
    high enough to ride out a string of wedges without risking a
    legitimately slow cold run (measured worst case: ~5 min cold
    200-step-scan compile + ~885 s early-session dispatch latency)."""
    import os
    import sys

    _supervise([sys.executable, os.path.abspath(__file__)])


def _supervise(child_cmd):
    import os
    import subprocess
    import sys
    import tempfile

    env = dict(os.environ, SLEEPGEN_BENCH_CHILD="1")
    for attempt in range(ATTEMPTS):
        # The child gets its OWN handles; the parent polls through separate
        # read-only opens of the same paths. Reading through the child's
        # handle would move the shared dup'd-fd offset and the child's next
        # write would land mid-file, corrupting the metric line.
        with tempfile.TemporaryDirectory() as td:
            out_path = os.path.join(td, "out")
            err_path = os.path.join(td, "err")
            with open(out_path, "w") as out_f, open(err_path, "w") as err_f:
                proc = subprocess.Popen(child_cmd, env=env,
                                        stdout=out_f, stderr=err_f, text=True)
            deadline = time.monotonic() + CONTACT_DEADLINE
            contact = False
            rc = None

            def _read(path):
                with open(path) as f:
                    return f.read()

            while True:
                rc = proc.poll()
                if rc is not None:
                    break
                if not contact and "TPU_CONTACT_OK" in _read(out_path):
                    contact = True
                    deadline = time.monotonic() + FULL_BUDGET
                if time.monotonic() > deadline:
                    proc.kill()
                    proc.wait()
                    print(f"bench attempt {attempt + 1} "
                          f"{'timed out' if contact else 'never contacted the TPU'}"
                          f" ({FULL_BUDGET if contact else CONTACT_DEADLINE}s);"
                          f" retrying", file=sys.stderr, flush=True)
                    break
                time.sleep(POLL_S)
            if rc is None:  # killed above
                continue
            for line in _read(out_path).splitlines():
                if '"metric"' in line:
                    print(line)
                    return
            print(f"bench attempt {attempt + 1} rc={rc}: "
                  f"{_read(err_path).strip()[-500:]}", file=sys.stderr,
                  flush=True)
    raise SystemExit(f"bench failed after {ATTEMPTS} attempts")


if __name__ == "__main__":
    import os

    if os.environ.get("SLEEPGEN_BENCH_CHILD"):
        main()
    else:
        _wait_for_tpu_exclusive()
        _supervised()
