"""bench.py self-supervision: the headline bench must survive the device
relay's wedge modes (a fresh client frozen forever at its first request —
see scripts/run_with_tpu_retry.sh). Two-phase budget: attempts that never
print TPU_CONTACT_OK die at CONTACT_DEADLINE (cheap), attempts that made
contact get FULL_BUDGET for slow cold compiles."""
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench


def _stub(tmp_path, body):
    f = tmp_path / "stub.py"
    f.write_text(body)
    return [sys.executable, str(f)]


@pytest.fixture(autouse=True)
def fast_knobs(monkeypatch):
    # Deadlines must absorb python-startup latency, which ranges from
    # ~0.1 s idle to >10 s when a concurrent TPU-client training process
    # saturates the machine (2 s flaked under parallel suite load, 10 s
    # flaked under TPU-client load). A fixed worst-case 30 s made every
    # wedged attempt block the full 30 s even on idle machines (ADVICE
    # r3), so calibrate instead: time a trivial interpreter launch under
    # the CURRENT load and scale it with generous margin.
    import subprocess
    import time

    t0 = time.monotonic()
    subprocess.run([sys.executable, "-c", "pass"], check=True)
    startup = time.monotonic() - t0
    # floor 10 s, not 4: an idle-time probe under-calibrates when load
    # arrives AFTER it (the concurrent-TPU-training scenario that pushed
    # startup past 10 s) — ADVICE r4
    monkeypatch.setattr(bench, "CONTACT_DEADLINE",
                        min(45.0, max(10.0, 20.0 * startup)))
    monkeypatch.setattr(bench, "FULL_BUDGET", 8)
    monkeypatch.setattr(bench, "ATTEMPTS", 2)
    monkeypatch.setattr(bench, "POLL_S", 0.1)


def test_recovers_after_first_contact_wedge(tmp_path, capsys):
    """A wedged first attempt (no contact marker) is killed at
    CONTACT_DEADLINE and the retry's metric line is relayed."""
    marker = tmp_path / "ran_once"
    body = f"""
import pathlib, sys, time
m = pathlib.Path({str(marker)!r})
if not m.exists():
    m.touch()
    time.sleep(60)  # wedged: never prints the contact marker
print("TPU_CONTACT_OK", flush=True)
print('{{"metric": "stub", "value": 1.0}}')
"""
    bench._supervise(_stub(tmp_path, body))
    cap = capsys.readouterr()
    assert '"metric"' in cap.out
    assert "never contacted" in cap.err


def test_post_contact_stall_uses_full_budget_then_retries(tmp_path, capsys):
    """Contact extends the deadline to FULL_BUDGET; a post-contact stall
    still gets killed and retried."""
    marker = tmp_path / "ran_once"
    body = f"""
import pathlib, sys, time
print("TPU_CONTACT_OK", flush=True)
m = pathlib.Path({str(marker)!r})
if not m.exists():
    m.touch()
    time.sleep(60)  # mid-run stall after contact
print('{{"metric": "stub", "value": 2.0}}')
"""
    bench._supervise(_stub(tmp_path, body))
    cap = capsys.readouterr()
    assert '"metric"' in cap.out
    assert "timed out" in cap.err


def test_gives_up_after_attempts(tmp_path, capsys, monkeypatch):
    # no attempt ever needs to make contact here, so there is no
    # startup-latency race — a short deadline keeps the test fast
    monkeypatch.setattr(bench, "CONTACT_DEADLINE", 5)
    body = "import time\ntime.sleep(60)\n"
    with pytest.raises(SystemExit):
        bench._supervise(_stub(tmp_path, body))
    assert capsys.readouterr().err.count("never contacted") == 2


def test_nonzero_exit_is_reported_and_retried(tmp_path, capsys):
    marker = tmp_path / "ran_once"
    body = f"""
import pathlib, sys
m = pathlib.Path({str(marker)!r})
if not m.exists():
    m.touch()
    print("boom", file=sys.stderr)
    raise SystemExit(3)
print("TPU_CONTACT_OK", flush=True)
print('{{"metric": "stub", "value": 3.0}}')
"""
    bench._supervise(_stub(tmp_path, body))
    cap = capsys.readouterr()
    assert '"metric"' in cap.out
    assert "rc=3" in cap.err and "boom" in cap.err
