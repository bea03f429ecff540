"""Multi-host execution: the claim "multi-host via DCN — no code changes"
(COMPONENTS.md, parallel/mesh.py:30-32) made executable.

Spawns TWO coordinated OS processes (one CPU device each) through
``sleepgen.parallel.initialize_distributed`` — a real
``jax.distributed.initialize`` bring-up with gloo CPU collectives standing
in for the TPU interconnect — and runs one data-parallel LDM train step on
the resulting 2-device global mesh. A third, single-process run with two
virtual CPU devices computes the same step; losses and updated-parameter
norms must agree (the batch-sharded grad psum is the same XLA program
either way). See tests/multihost_worker.py for the step itself.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the parent test process forces 8 virtual devices (conftest.py); the
    # workers need exactly 1 (multi) / 2 (single) local devices
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    repo = str(Path(__file__).parents[1])
    env["PYTHONPATH"] = (repo + os.pathsep + env["PYTHONPATH"]
                         if env.get("PYTHONPATH") else repo)
    return env


def _spawn(specs):
    procs = [
        subprocess.Popen([sys.executable, str(WORKER), *argv],
                         env=_worker_env(ndev), stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for argv, ndev in specs
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)


def test_two_process_bringup_and_collective(tmp_path):
    """Fast (seconds) default-suite coverage: initialize_distributed on two
    real OS processes, a global 2-device mesh, and one cross-process
    reduction with the correct global value on both ranks."""
    port = _free_port()
    outs = [tmp_path / f"probe_{i}.json" for i in range(2)]
    _spawn([
        (["--mode", "multi", "--probe", "--process_id", str(i),
          "--num_processes", "2", "--port", str(port), "--out", str(outs[i])],
         1)
        for i in range(2)
    ])
    results = [json.loads(o.read_text()) for o in outs]
    expected = float(np.mean(np.arange(64, dtype=np.float32) + 1.0) * 2.0)
    for r in results:
        assert r["n_processes"] == 2 and r["n_devices"] == 2
        assert r["loss"] == pytest.approx(expected, rel=1e-6)


@pytest.mark.slow
def test_two_process_ldm_step_matches_single_process(tmp_path):
    port = _free_port()
    single_out = tmp_path / "single.json"
    multi_outs = [tmp_path / f"multi_{i}.json" for i in range(2)]
    # all three workers (1 single-process + 2 coordinated) run concurrently;
    # they are independent jobs, so wall time is one compile, not three
    _spawn([(["--mode", "single", "--out", str(single_out)], 2)] + [
        (["--mode", "multi", "--process_id", str(i), "--num_processes", "2",
          "--port", str(port), "--out", str(multi_outs[i])], 1)
        for i in range(2)
    ])
    single = json.loads(single_out.read_text())
    multi = [json.loads(o.read_text()) for o in multi_outs]

    assert single["n_processes"] == 1 and single["n_devices"] == 2
    for r in multi:
        assert r["n_processes"] == 2 and r["n_devices"] == 2

    # both processes observe the same replicated loss/params
    assert multi[0]["loss"] == pytest.approx(multi[1]["loss"], abs=0.0)
    assert multi[0]["param_norm"] == pytest.approx(
        multi[1]["param_norm"], abs=0.0)

    # and the multi-process step computes the same program as the
    # single-process 2-device mesh (reduction-order float slack only)
    np.testing.assert_allclose(multi[0]["loss"], single["loss"], rtol=1e-5)
    np.testing.assert_allclose(
        multi[0]["param_norm"], single["param_norm"], rtol=1e-5)
