"""Unit tests for the bench.py fault-tolerance harness.

The parent/child retry + solver-fallback chain is the round deliverable
(VERDICT r2 item 1: one transient tunnel error must not leave the driver
without a JSON metric line).  These tests exercise the parent's process
plumbing with a fake ``subprocess.Popen`` — no TPU, no real children.
"""

import json
import subprocess
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


METRIC = json.dumps({"metric": "m", "value": 1.0, "unit": "s",
                     "vs_baseline": 2.0})


class FakeProc:
    """Stands in for subprocess.Popen: scripted stdout / rc / timeout."""

    def __init__(self, stdout="", rc=0, hang=False):
        self._stdout = stdout
        self.returncode = rc
        self._hang = hang
        self.killed = False
        self.pid = 12345

    def communicate(self, timeout=None):
        if self._hang and not self.killed:
            raise subprocess.TimeoutExpired(cmd="fake", timeout=timeout)
        return self._stdout, None

    def kill(self):
        self.killed = True
        self.returncode = -9


def _patch_popen(monkeypatch, procs, envs_seen):
    it = iter(procs)

    def fake_popen(cmd, stdout=None, stderr=None, text=None, env=None,
                   cwd=None):
        envs_seen.append(env)
        return next(it)

    monkeypatch.setattr(bench.subprocess, "Popen", fake_popen)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)


def test_attempt_plan_flagship_fallback_chain():
    plan = bench._attempt_plan("elasticity3d")
    solvers = [env.get("PDE_BENCH_SOLVER") for env, _ in plan]
    assert solvers == ["df2", "df", "mgf32"]
    assert all(t > 0 for _, t in plan)


def test_attempt_plan_bar1d_runs_on_cpu_backend():
    plan = bench._attempt_plan("bar1d")
    for env, _ in plan:
        assert env.get("JAX_PLATFORMS") == "cpu"
        assert env.get("JAX_PLATFORM_NAME") == "cpu"


def test_parent_first_attempt_success(monkeypatch, capsys):
    envs = []
    _patch_popen(monkeypatch, [
        FakeProc(stdout="noise line\n" + METRIC + "\n", rc=0),
    ], envs)
    monkeypatch.setenv("PDE_BENCH_CONFIG", "elasticity3d")
    assert bench.run_parent() == 0
    out_lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert out_lines == [METRIC]
    assert envs[0]["PDE_BENCH_CHILD"] == "1"
    assert envs[0]["PDE_BENCH_SOLVER"] == "df2"


def test_parent_crash_then_fallback_solver(monkeypatch, capsys):
    envs = []
    _patch_popen(monkeypatch, [
        FakeProc(stdout="Traceback ...\n", rc=1),         # df2 child dies
        FakeProc(stdout=METRIC + "\n", rc=0),             # df child succeeds
    ], envs)
    monkeypatch.setenv("PDE_BENCH_CONFIG", "elasticity3d")
    assert bench.run_parent() == 0
    assert capsys.readouterr().out.strip() == METRIC
    assert [e["PDE_BENCH_SOLVER"] for e in envs] == ["df2", "df"]


def test_parent_timeout_kills_child_and_falls_back(monkeypatch, capsys):
    hung = FakeProc(stdout="", hang=True)
    envs = []
    _patch_popen(monkeypatch, [hung, FakeProc(stdout=METRIC + "\n")], envs)
    monkeypatch.setenv("PDE_BENCH_CONFIG", "elasticity3d")
    assert bench.run_parent() == 0
    assert hung.killed
    assert capsys.readouterr().out.strip() == METRIC


def test_parent_all_attempts_fail_rc1_no_json(monkeypatch, capsys):
    envs = []
    _patch_popen(monkeypatch, [FakeProc(rc=1) for _ in range(3)], envs)
    monkeypatch.setenv("PDE_BENCH_CONFIG", "elasticity3d")
    assert bench.run_parent() == 1
    assert capsys.readouterr().out.strip() == ""
    assert len(envs) == 3  # walked the whole chain


def test_parent_ignores_non_metric_json(monkeypatch, capsys):
    decoy = json.dumps({"status": "warming"})
    envs = []
    _patch_popen(monkeypatch, [
        FakeProc(stdout=decoy + "\n", rc=0),
        FakeProc(stdout=decoy + "\n" + METRIC + "\n", rc=0),
    ], envs)
    monkeypatch.setenv("PDE_BENCH_CONFIG", "elasticity3d")
    assert bench.run_parent() == 0
    assert capsys.readouterr().out.strip() == METRIC


def test_parent_keeps_banked_metric_from_killed_child(monkeypatch, capsys):
    """Round-4 contract (VERDICT r3 item 1): a child killed on timeout may
    already have banked a metric line — the parent must emit it rather than
    report failure."""
    hung_with_bank = FakeProc(stdout="noise\n" + METRIC + "\n", hang=True)
    envs = []
    _patch_popen(monkeypatch, [
        hung_with_bank,
        FakeProc(stdout="Traceback ...\n", rc=1),
        FakeProc(stdout="Traceback ...\n", rc=1),
    ], envs)
    monkeypatch.setenv("PDE_BENCH_CONFIG", "elasticity3d")
    assert bench.run_parent() == 0
    assert hung_with_bank.killed
    assert capsys.readouterr().out.strip() == METRIC


def test_parent_last_banked_line_wins(monkeypatch, capsys):
    """The child emits provisional lines then upgrades them; the parent must
    report the LAST metric line of a child's stdout."""
    provisional = json.dumps({"metric": "m", "value": 200.0, "unit": "s",
                              "provisional": "warmup_includes_jit_compile"})
    envs = []
    _patch_popen(monkeypatch, [
        FakeProc(stdout=provisional + "\n" + METRIC + "\n", rc=0),
    ], envs)
    monkeypatch.setenv("PDE_BENCH_CONFIG", "elasticity3d")
    assert bench.run_parent() == 0
    assert capsys.readouterr().out.strip() == METRIC


def test_parent_respects_deadline(monkeypatch, capsys):
    """With the budget (almost) spent, the parent must not spawn children
    that the driver would kill anyway."""
    envs = []
    _patch_popen(monkeypatch, [FakeProc(stdout=METRIC + "\n")], envs)
    monkeypatch.setenv("PDE_BENCH_CONFIG", "elasticity3d")
    monkeypatch.setenv("PDE_BENCH_DEADLINE", "100")  # < 150s floor
    assert bench.run_parent() == 1
    assert envs == []
    assert capsys.readouterr().out.strip() == ""


def test_parent_attempt_timeouts_fit_deadline(monkeypatch, capsys):
    """Every attempt timeout must fit inside what is left of the deadline
    (the r03 failure: attempt 1 alone exceeded the driver window)."""
    envs = []
    procs = [FakeProc(stdout="", rc=1) for _ in range(3)]
    _patch_popen(monkeypatch, procs, envs)

    timeouts = []
    real_comm = FakeProc.communicate

    def spy_comm(self, timeout=None):
        timeouts.append(timeout)
        return real_comm(self, timeout=timeout)

    monkeypatch.setattr(FakeProc, "communicate", spy_comm)
    monkeypatch.setenv("PDE_BENCH_CONFIG", "elasticity3d")
    monkeypatch.setenv("PDE_BENCH_DEADLINE", "1380")
    assert bench.run_parent() == 1
    # crash-exits consume ~no wall time here, so each timeout must be
    # bounded by its plan cap and by deadline-40
    caps = [c for _, c in bench._attempt_plan("elasticity3d")]
    assert len(timeouts) == 3
    for t, cap in zip(timeouts, caps):
        assert t <= cap
        assert t <= 1380 - 40
    # the child budget env must accompany each spawn
    for e, t in zip(envs, timeouts):
        assert float(e["PDE_BENCH_CHILD_BUDGET"]) <= t


def test_child_time_left_unbounded_without_budget(monkeypatch):
    monkeypatch.delenv("PDE_BENCH_CHILD_BUDGET", raising=False)
    assert bench.child_time_left() == float("inf")
    monkeypatch.setenv("PDE_BENCH_CHILD_BUDGET", "1e9")
    assert bench.child_time_left() < 1e9


def test_device_retry_recovers_from_transient_errors(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("remote_compile: response body closed")
        return "ok"

    assert bench.device_retry(flaky, "phase", attempts=3) == "ok"
    assert calls["n"] == 3


def test_device_retry_raises_after_max_attempts(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    def always_fails():
        raise RuntimeError("worker down")

    try:
        bench.device_retry(always_fails, "phase", attempts=2)
    except RuntimeError as e:
        assert "worker down" in str(e)
    else:
        raise AssertionError("expected RuntimeError")


# ----------------------------------------------------------------------
# Fault injection (benchmarks/robustness_drill.py hooks)
# ----------------------------------------------------------------------

def _arm(monkeypatch, spec, once=None):
    monkeypatch.setattr(bench, "_FAULTS", None)  # reparse env
    monkeypatch.setenv("PDE_BENCH_FAULT", spec)
    if once is None:
        monkeypatch.delenv("PDE_BENCH_FAULT_ONCE", raising=False)
    else:
        monkeypatch.setenv("PDE_BENCH_FAULT_ONCE", once)


def test_fault_budget_parses_and_exhausts(monkeypatch):
    _arm(monkeypatch, "warm:2,pull:1")
    assert bench._fault_budget() == {"warm": 2.0, "pull": 1.0}
    assert bench._fault_take("warm")
    assert bench._fault_take("warm")
    assert not bench._fault_take("warm")   # exhausted
    assert bench._fault_take("pull")
    assert not bench._fault_take("pull")
    assert not bench._fault_take("wedge")  # never armed


def test_fault_default_off(monkeypatch):
    monkeypatch.setattr(bench, "_FAULTS", None)
    monkeypatch.delenv("PDE_BENCH_FAULT", raising=False)
    assert bench._fault_budget() == {}
    assert not bench._fault_take("pull")


def test_fault_once_claims_exactly_one_process(monkeypatch, tmp_path):
    once = str(tmp_path / "fault.once")
    _arm(monkeypatch, "wedge:1", once=once)
    assert bench._fault_budget() == {"wedge": 1.0}   # first claimer armed
    # a second process (fresh parse) finds the sentinel and stays clean
    monkeypatch.setattr(bench, "_FAULTS", None)
    assert bench._fault_budget() == {}


def test_device_retry_survives_injected_pull_fault(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    _arm(monkeypatch, "pull:1")
    calls = {"n": 0}

    def body():
        calls["n"] += 1
        return 42

    assert bench.device_retry(body, "phase", attempts=3) == 42
    assert calls["n"] == 1  # fault fired BEFORE the body, body ran once


def test_rewarm_channel_injected_warm_fault(monkeypatch):
    _arm(monkeypatch, "warm:1")
    assert bench.rewarm_channel() is False   # injected failure
    assert bench.rewarm_channel() is True    # budget spent → real (CPU) pull


def test_rewarm_channel_injected_stall_fires_once(monkeypatch):
    _arm(monkeypatch, "stall:37")
    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    assert bench.rewarm_channel() is True
    assert slept == [37.0]
    assert bench.rewarm_channel() is True
    assert slept == [37.0]  # stall consumed, not repeated


def test_emit_wedge_hangs_after_banking(monkeypatch, capsys):
    _arm(monkeypatch, "wedge:1")

    def no_sleep(s):
        raise SystemExit("wedged")  # stand-in for the parent's kill

    monkeypatch.setattr(bench.time, "sleep", no_sleep)
    bench.emit({"status": "warming"})  # non-metric lines never wedge
    try:
        bench.emit({"metric": "m", "value": 1.0})
    except SystemExit as e:
        assert "wedged" in str(e)
    else:
        raise AssertionError("expected the injected wedge")
    out = capsys.readouterr().out
    assert '"metric": "m"' in out  # the line was banked BEFORE the wedge


def test_timed_rep_count_scales_on_degraded_worker(monkeypatch):
    monkeypatch.delenv("PDE_BENCH_PROBE_MIN_TFLOPS", raising=False)
    assert bench.timed_rep_count(None) == 2       # probe skipped
    assert bench.timed_rep_count(80.0) == 2       # healthy
    assert bench.timed_rep_count(28.0) == 4       # degraded → more chances
    monkeypatch.setenv("PDE_BENCH_PROBE_MIN_TFLOPS", "25")
    assert bench.timed_rep_count(28.0) == 2       # threshold is the knob
