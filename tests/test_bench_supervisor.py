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
    # /bin/sh stubs, not python ones: the wedge tests race the stub's
    # startup against CONTACT_DEADLINE, and python startup ranges from
    # ~0.1 s idle to >10 s when a concurrent TPU-client process saturates
    # the machine (2 s and 10 s deadlines both flaked historically —
    # ADVICE r3/r4). sh execs in single-digit milliseconds even under
    # load, so a small FIXED deadline needs no load calibration probe.
    f = tmp_path / "stub.sh"
    f.write_text(body)
    return ["/bin/sh", str(f)]


@pytest.fixture(autouse=True)
def fast_knobs(monkeypatch):
    monkeypatch.setattr(bench, "CONTACT_DEADLINE", 2.0)
    monkeypatch.setattr(bench, "FULL_BUDGET", 3)
    # extra attempts absorb pathological scheduler starvation: a good
    # attempt killed prematurely just reruns, and the stubs behave well
    # on every run after the first
    monkeypatch.setattr(bench, "ATTEMPTS", 4)
    monkeypatch.setattr(bench, "POLL_S", 0.1)


def test_recovers_after_first_contact_wedge(tmp_path, capsys):
    """A wedged first attempt (no contact marker) is killed at
    CONTACT_DEADLINE and the retry's metric line is relayed."""
    marker = tmp_path / "ran_once"
    body = f"""
if [ ! -e {marker} ]; then
  touch {marker}
  sleep 60  # wedged: never prints the contact marker
fi
echo TPU_CONTACT_OK
echo '{{"metric": "stub", "value": 1.0}}'
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
echo TPU_CONTACT_OK
if [ ! -e {marker} ]; then
  touch {marker}
  sleep 60  # mid-run stall after contact
fi
echo '{{"metric": "stub", "value": 2.0}}'
"""
    bench._supervise(_stub(tmp_path, body))
    cap = capsys.readouterr()
    assert '"metric"' in cap.out
    assert "timed out" in cap.err


def test_gives_up_after_attempts(tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(bench, "ATTEMPTS", 2)
    body = "sleep 60\n"
    with pytest.raises(SystemExit):
        bench._supervise(_stub(tmp_path, body))
    assert capsys.readouterr().err.count("never contacted") == 2


def test_nonzero_exit_is_reported_and_retried(tmp_path, capsys):
    marker = tmp_path / "ran_once"
    body = f"""
if [ ! -e {marker} ]; then
  touch {marker}
  echo boom >&2
  exit 3
fi
echo TPU_CONTACT_OK
echo '{{"metric": "stub", "value": 3.0}}'
"""
    bench._supervise(_stub(tmp_path, body))
    cap = capsys.readouterr()
    assert '"metric"' in cap.out
    assert "rc=3" in cap.err and "boom" in cap.err
