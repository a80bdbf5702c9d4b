"""bench.py capture-harness machinery (no chip, no jax backend touched).

The headline metric is driver-captured by running bench.py once; round 2's
capture came out 24x low from a single tunnel stall and round 3's worker
outage would have produced NO number, so the harness's stall/outage armor
is load-bearing and gets regression tests:

  * the re-exec ladder only retries on backend UNAVAILABLE;
  * the backend-wait loop probes in killable subprocesses and honors its
    budget (a dead worker hangs the raw in-process client ~25 min, which a
    bounded subprocess probe turns into 150 s).
"""

import importlib.util
import os
import sys

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


@pytest.fixture()
def bench_mod():
    # load bench.py as a module WITHOUT running main(); the module only
    # imports jax.numpy at top level (conftest already forces CPU)
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_reexec_reraises_non_backend_errors(bench_mod, monkeypatch):
    monkeypatch.delenv(bench_mod._REEXEC_ENV, raising=False)
    with pytest.raises(ValueError):
        bench_mod._reexec_on_backend_failure(ValueError("boom"))


def test_reexec_gives_up_after_max_retries(bench_mod, monkeypatch):
    monkeypatch.setenv(bench_mod._REEXEC_ENV, str(bench_mod._MAX_INIT_RETRIES))
    with pytest.raises(RuntimeError):
        bench_mod._reexec_on_backend_failure(RuntimeError("UNAVAILABLE: worker"))


def test_reexec_increments_attempt_and_execs(bench_mod, monkeypatch):
    monkeypatch.setenv(bench_mod._REEXEC_ENV, "0")
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    calls = {}

    def fake_execv(exe, argv):
        calls["exe"], calls["argv"] = exe, argv
        raise SystemExit(0)  # execv never returns; emulate the process swap

    monkeypatch.setattr(bench_mod.os, "execv", fake_execv)
    with pytest.raises(SystemExit):
        bench_mod._reexec_on_backend_failure(RuntimeError("UNAVAILABLE: worker down"))
    assert calls["exe"] == sys.executable
    assert os.environ[bench_mod._REEXEC_ENV] == "1"


def test_wait_for_backend_returns_when_probe_succeeds(bench_mod, monkeypatch):
    # a probe that succeeds immediately: exit 0
    monkeypatch.setattr(bench_mod, "_PROBE_SRC", "pass")
    assert bench_mod._wait_for_backend(budget_s=10) is True


def test_wait_for_backend_honors_budget_on_dead_worker(bench_mod, monkeypatch):
    # a probe that always fails fast: the loop must give up at the budget,
    # not spin forever (bench.py then proceeds and lets the real attempt
    # raise, which feeds the re-exec ladder)
    monkeypatch.setattr(bench_mod, "_PROBE_SRC", "raise SystemExit(1)")
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    assert bench_mod._wait_for_backend(budget_s=0) is False


def _point_queue_files_at(bench_mod, monkeypatch, tmp_path):
    pid_file = tmp_path / "queue.pid"
    child_file = tmp_path / "child.pid"
    stop_file = tmp_path / "stop"
    monkeypatch.setattr(bench_mod, "_QUEUE_PID_FILE", str(pid_file))
    monkeypatch.setattr(bench_mod, "_QUEUE_CHILD_PID_FILE", str(child_file))
    monkeypatch.setattr(bench_mod, "_QUEUE_STOP_FILE", str(stop_file))
    return pid_file, child_file, stop_file


def test_preempt_noop_without_queue(bench_mod, monkeypatch, tmp_path):
    _, _, stop = _point_queue_files_at(bench_mod, monkeypatch, tmp_path)
    monkeypatch.delenv(bench_mod._PREEMPT_SKIP_ENV, raising=False)
    assert bench_mod._preempt_chip_queue(sleep=lambda s: None) is False
    assert not stop.exists()


def test_preempt_noop_on_stale_pid_file(bench_mod, monkeypatch, tmp_path):
    # a pid file left by a long-dead runner must not trigger a preemption
    pid_file, _, stop = _point_queue_files_at(bench_mod, monkeypatch, tmp_path)
    monkeypatch.delenv(bench_mod._PREEMPT_SKIP_ENV, raising=False)
    pid_file.write_text("999999999")  # beyond pid_max: never alive
    assert bench_mod._preempt_chip_queue(sleep=lambda s: None) is False
    assert not stop.exists()


def test_preempt_skipped_via_env(bench_mod, monkeypatch, tmp_path):
    import subprocess
    import sys as _sys

    pid_file, _, stop = _point_queue_files_at(bench_mod, monkeypatch, tmp_path)
    proc = subprocess.Popen([_sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        pid_file.write_text(str(proc.pid))
        monkeypatch.setenv(bench_mod._PREEMPT_SKIP_ENV, "1")
        assert bench_mod._preempt_chip_queue(sleep=lambda s: None) is False
        assert not stop.exists()
        assert proc.poll() is None  # untouched
    finally:
        proc.kill()
        proc.wait()


def test_preempt_stops_live_queue(bench_mod, monkeypatch, tmp_path):
    # live runner + live phase group: sentinel written first, both TERMed
    import subprocess
    import sys as _sys

    pid_file, child_file, stop = _point_queue_files_at(bench_mod, monkeypatch, tmp_path)
    monkeypatch.delenv(bench_mod._PREEMPT_SKIP_ENV, raising=False)
    runner = subprocess.Popen([_sys.executable, "-c", "import time; time.sleep(60)"])
    phase = subprocess.Popen(
        [_sys.executable, "-c", "import time; time.sleep(60)"],
        start_new_session=True,  # own process group, like the queue's setsid
    )
    try:
        pid_file.write_text(str(runner.pid))
        child_file.write_text(str(phase.pid))
        assert bench_mod._preempt_chip_queue(sleep=lambda s: None) is True
        assert stop.exists()
        assert runner.wait(timeout=10) != 0
        assert phase.wait(timeout=10) != 0
    finally:
        for p in (runner, phase):
            if p.poll() is None:
                p.kill()
                p.wait()
