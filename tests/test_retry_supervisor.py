"""scripts/run_with_tpu_retry.sh semantics, driven with fake commands.

The supervisor guards long TPU jobs against the device relay's failure
modes (first-contact wedge, mid-run stall — see the script header); these
tests pin its contract on cheap shell stand-ins so changes to the script
can't silently break the demos that depend on it.
"""
from __future__ import annotations

import subprocess
from pathlib import Path

import pytest

SCRIPT = Path(__file__).parent.parent / "scripts" / "run_with_tpu_retry.sh"


def run_supervisor(tmp_path, body: str, env: dict, timeout: int = 120):
    cmd = tmp_path / "cmd.sh"
    cmd.write_text("#!/bin/bash\n" + body)
    cmd.chmod(0o755)
    log = tmp_path / "job.log"
    # sub-second poll/grace: the fake jobs are instant, so the suite
    # shouldn't pay the production 5 s marker poll / 2 s kill grace
    fast = {"POLL_S": "0.2", "KILL_GRACE_S": "0.2"}
    proc = subprocess.run(
        ["bash", str(SCRIPT), str(log), str(cmd)],
        capture_output=True, text=True, timeout=timeout,
        env={"PATH": "/usr/bin:/bin", **fast, **env},
    )
    return proc, log


def test_success_first_attempt(tmp_path):
    proc, log = run_supervisor(
        tmp_path, "echo TPU_CONTACT_OK\necho work done\nexit 0\n",
        env={"CONTACT_DEADLINE": "30"})
    assert proc.returncode == 0
    assert "work done" in log.read_text()
    assert proc.stderr.count("attempt") == 1


def test_contact_timeout_then_success(tmp_path):
    # attempt 1 never prints the marker (simulated first-contact wedge);
    # attempt 2 succeeds — state tracked via a counter file
    state = tmp_path / "attempts"
    body = f"""
n=$(cat {state} 2>/dev/null || echo 0)
echo $((n + 1)) > {state}
if [ "$n" -eq 0 ]; then
  sleep 300  # wedged: no marker, no progress
fi
echo TPU_CONTACT_OK
echo recovered
exit 0
"""
    proc, log = run_supervisor(tmp_path, body,
                               env={"CONTACT_DEADLINE": "2"})
    assert proc.returncode == 0
    assert "recovered" in log.read_text()
    assert "no TPU contact" in proc.stderr
    assert state.read_text().strip() == "2"


def test_nonzero_exit_after_contact_retries_then_propagates(tmp_path):
    # a post-contact crash (TPU worker died mid-dispatch) is retried —
    # jobs are resumable — and the rc surfaces once attempts are exhausted
    proc, _ = run_supervisor(
        tmp_path, "echo TPU_CONTACT_OK\nexit 7\n",
        env={"CONTACT_DEADLINE": "30", "MAX_ATTEMPTS": "2"})
    assert proc.returncode == 7
    assert proc.stderr.count("attempt") >= 2
    assert "giving up" in proc.stderr


def test_crash_after_contact_then_success(tmp_path):
    # attempt 1 makes contact then crashes (the round-4 queue failure
    # mode: JaxRuntimeError after a TPU worker restart); attempt 2 of the
    # resumable job must run and succeed
    state = tmp_path / "attempts"
    body = f"""
n=$(cat {state} 2>/dev/null || echo 0)
echo $((n + 1)) > {state}
echo TPU_CONTACT_OK
if [ "$n" -eq 0 ]; then
  exit 9
fi
echo recovered
exit 0
"""
    proc, log = run_supervisor(tmp_path, body,
                               env={"CONTACT_DEADLINE": "30"})
    assert proc.returncode == 0
    assert "recovered" in log.read_text()
    assert state.read_text().strip() == "2"


def test_gives_up_after_max_attempts(tmp_path):
    proc, _ = run_supervisor(
        tmp_path, "exit 3\n",
        env={"CONTACT_DEADLINE": "2", "MAX_ATTEMPTS": "2"})
    assert proc.returncode == 3  # last attempt's rc propagates
    assert "giving up" in proc.stderr


@pytest.mark.slow
def test_midrun_stall_restarts(tmp_path):
    # after contact, attempt 1 freezes (sleep accrues no CPU); the stall
    # watchdog (30 s sampling) must kill it and attempt 2 must finish
    state = tmp_path / "attempts"
    body = f"""
n=$(cat {state} 2>/dev/null || echo 0)
echo $((n + 1)) > {state}
echo TPU_CONTACT_OK
if [ "$n" -eq 0 ]; then
  sleep 600
fi
echo finished
exit 0
"""
    proc, log = run_supervisor(tmp_path, body,
                               env={"CONTACT_DEADLINE": "30",
                                    "STALL_POLL_S": "1",
                                    "STALL_SECS": "3"}, timeout=240)
    assert proc.returncode == 0
    assert "finished" in log.read_text()
    assert "CPU frozen" in proc.stderr


@pytest.mark.slow
def test_busy_grandchild_prevents_false_stall(tmp_path):
    # a job whose direct child idles in wait() while a forked worker does
    # the compute (bench.py's supervised mode) must NOT be stall-killed:
    # CPU accounting covers the whole process tree
    body = """
echo TPU_CONTACT_OK
( end=$((SECONDS + 8)); while [ $SECONDS -lt $end ]; do :; done ) &
worker=$!
wait $worker
echo finished
exit 0
"""
    proc, log = run_supervisor(tmp_path, body,
                               env={"CONTACT_DEADLINE": "30",
                                    "STALL_POLL_S": "1",
                                    "STALL_SECS": "3"}, timeout=240)
    assert proc.returncode == 0
    assert "finished" in log.read_text()
    assert "CPU frozen" not in proc.stderr
