"""Tests for the tunnel-outage wait/retry layer (tpumcia.utils.outage).

Round-3 postmortem: the driver's bench capture recorded rc=1 because
bench.py initialized the backend in-process during a (routine, multi-minute)
tunnel outage and died on first contact.  These tests pin the retry paths
that make bench.py / the TPU test runner survive that: the bounded
wait-for-backend loop, the child-process restart loop, and the real
scrubbed-env subprocess probe failing fast instead of hanging.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from tpumcia.utils.outage import probe_backend, run_with_retry, wait_for_backend

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _silent(_msg: str) -> None:
    pass


class FlakyProbe:
    """Fails n_failures times, then succeeds."""

    def __init__(self, n_failures: int):
        self.n_failures = n_failures
        self.calls = 0

    def __call__(self) -> dict:
        self.calls += 1
        if self.calls <= self.n_failures:
            return {"ok": False, "elapsed_s": 0.0, "reason": "error: simulated"}
        return {"ok": True, "elapsed_s": 0.0, "reason": "ok"}


def test_wait_succeeds_after_transient_failures():
    probe = FlakyProbe(2)
    result = wait_for_backend(
        max_wait_s=60.0, backoff_s=(0.01,), probe=probe, log=_silent
    )
    assert result["ok"] is True
    assert result["attempts"] == 3
    assert probe.calls == 3


def test_wait_gives_up_when_budget_exhausted():
    probe = FlakyProbe(10_000)
    result = wait_for_backend(
        max_wait_s=0.05, backoff_s=(0.02,), probe=probe, log=_silent
    )
    assert result["ok"] is False
    assert result["attempts"] >= 1
    assert "simulated" in result["last_reason"]


def test_wait_runs_at_least_one_probe_with_zero_budget():
    probe = FlakyProbe(0)
    result = wait_for_backend(max_wait_s=0.0, probe=probe, log=_silent)
    assert result["ok"] is True and result["attempts"] == 1


def test_probe_backend_scrubbed_env_fails_fast_without_hanging():
    # Simulate an init failure the way the outage manifests (backend raises):
    # force a nonexistent platform in a subprocess with the tunnel env
    # scrubbed.  Must come back quickly with ok=False, not hang.
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "nonexistent_platform"
    result = probe_backend(timeout_s=120.0, env=env)
    assert result["ok"] is False
    assert result["reason"].startswith(("error", "timeout"))


def _cpu_env() -> dict[str, str]:
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.slow  # spawns a jax-importing subprocess (backend init cost)
def test_probe_backend_succeeds_on_cpu_backend():
    result = probe_backend(timeout_s=240.0, env=_cpu_env())
    assert result["ok"] is True, result


def test_run_with_retry_caps_consecutive_child_failures():
    """A child that keeps dying while the backend probes healthy is a child
    BUG — the parent must fail fast with that diagnosis instead of burning
    the whole outage budget respawning it."""
    ok_wait = lambda remaining: {"ok": True, "attempts": 1, "waited_s": 0.0}  # noqa: E731
    rc, parsed, meta = run_with_retry(
        [sys.executable, "-c", "raise SystemExit(1)"],
        max_wait_s=3600.0,
        log=_silent,
        wait=ok_wait,
        max_child_failures=3,
    )
    assert rc == 1 and parsed is None
    assert meta["child_failures"] == 3


def test_run_with_retry_caps_hanging_child_failures():
    """A child that HANGS (timeout, not nonzero exit) while the backend
    probes healthy must also hit the max_child_failures cap — the timeout
    path used to skip the cap check and respawn until the whole outage
    budget was burned."""
    ok_wait = lambda remaining: {"ok": True, "attempts": 1, "waited_s": 0.0}  # noqa: E731
    rc, parsed, meta = run_with_retry(
        [sys.executable, "-c", "import time; time.sleep(30)"],
        max_wait_s=3600.0,
        child_timeout_s=0.3,
        log=_silent,
        wait=ok_wait,
        max_child_failures=3,
    )
    assert rc == 1 and parsed is None
    assert meta["child_failures"] == 3


def test_run_with_retry_restarts_failed_child(tmp_path):
    # Child fails on the first attempt (marker file absent), succeeds on the
    # second — pins the restart loop bench.py relies on when the tunnel dies
    # mid-measurement.
    marker = tmp_path / "attempted_once"
    script = tmp_path / "child.py"
    script.write_text(
        "import json, os, sys\n"
        f"marker = {str(marker)!r}\n"
        "if not os.path.exists(marker):\n"
        "    open(marker, 'w').close()\n"
        "    sys.exit(1)\n"
        "print('noise line')\n"
        "print(json.dumps({'value': 42}))\n"
    )
    ok_wait = lambda remaining: {"ok": True, "attempts": 1, "waited_s": 0.0}  # noqa: E731
    rc, parsed, meta = run_with_retry(
        [sys.executable, str(script)],
        max_wait_s=120.0,
        child_timeout_s=60.0,
        log=_silent,
        wait=ok_wait,
    )
    assert rc == 0
    assert parsed == {"value": 42}
    assert meta["child_failures"] == 1


def test_run_with_retry_never_overruns_budget_via_child_floor(tmp_path):
    """When the re-derived post-wait budget drops below the ~60 s a child
    needs, the parent must report budget-exhausted instead of clamping the
    child timeout UP to the floor (which overran max_wait_s by up to 60 s)."""
    marker = tmp_path / "child_ran"
    ok_wait = lambda remaining: {"ok": True, "attempts": 1, "waited_s": 0.0}  # noqa: E731
    rc, parsed, meta = run_with_retry(
        [sys.executable, "-c", f"open({str(marker)!r}, 'w').close()"],
        max_wait_s=30.0,  # below the 60 s child floor
        log=_silent,
        wait=ok_wait,
    )
    assert rc == 1 and parsed is None
    assert not marker.exists()  # the child was never spawned
    assert meta["child_failures"] == 0


def test_run_with_retry_gives_up_when_backend_never_returns():
    bad_wait = lambda remaining: {"ok": False, "attempts": 3, "waited_s": 0.1}  # noqa: E731
    rc, parsed, meta = run_with_retry(
        [sys.executable, "-c", "raise SystemExit(1)"],
        max_wait_s=5.0,
        log=_silent,
        wait=bad_wait,
    )
    assert rc == 1 and parsed is None
    assert meta["attempts"] == 3


@pytest.mark.slow
def test_bench_py_survives_one_failed_child_end_to_end(tmp_path):
    # Full bench.py orchestration in a subprocess on the CPU backend with a
    # tiny workload: the FIRST child attempt is forced to die via the
    # marker-file test seam (simulating a mid-run tunnel death), then the
    # parent restarts it and the real measurement runs.  Asserts rc=0, a
    # parsed JSON line, and that exactly one child failure was absorbed.
    env = _cpu_env()
    env.update(
        TPUMCIA_BENCH_N_IMAGES="96",
        TPUMCIA_BENCH_BATCH="48",
        TPUMCIA_BENCH_REPS="1",
        TPUMCIA_BENCH_MAX_WAIT="1200",
        TPUMCIA_BENCH_FAIL_ONCE_MARKER=str(tmp_path / "fail_once"),
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=1100,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "simulated child failure" in proc.stderr
    line = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")][-1]
    parsed = json.loads(line)
    assert parsed["value"] is not None and parsed["value"] > 0
    assert parsed["detail"]["outage"]["child_failures"] == 1
    assert "link" in parsed["detail"]
    assert "rep_spread_s" in parsed["detail"]
    ingest = parsed["detail"]["ingest_inclusive"]  # VERDICT r4 #5 scope
    assert ingest["images_per_sec"] > 0
    assert "H2D staging" in ingest["timed_scope"]


# ---- bench.py parent: multi-moment best-of sampling -----------------------


def _load_bench_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_tpumcia_bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(value, backend="tpu", rc=0, failures=0):
    parsed = None
    if rc == 0 and value is not None:
        parsed = {"value": value, "detail": {"backend": backend}}
    meta = {"attempts": 1, "waited_for_backend_s": 0.5, "child_failures": failures}
    return rc, parsed, meta


def test_best_of_moments_keeps_best_and_aggregates_meta():
    # three tpu moments below the good threshold: all sampled, best wins,
    # outage meta sums across the tries
    bench = _load_bench_module()
    runs = iter([_run(44_000.0), _run(55_000.0, failures=1), _run(48_000.0)])
    slept = []
    best, values, agg = bench.best_of_moments(
        lambda remaining: next(runs),
        max_wait_s=2400.0,
        tries=3,
        good_value=60_000.0,
        gap_s=7.0,
        sleep=slept.append,
        clock=lambda: 0.0,
    )
    assert best["value"] == 55_000.0
    assert values == [44_000.0, 55_000.0, 48_000.0]
    assert agg == {"attempts": 3, "waited_for_backend_s": 1.5, "child_failures": 1}
    assert slept == [7.0, 7.0]


def test_best_of_moments_stops_early_on_good_value():
    bench = _load_bench_module()
    runs = iter([_run(52_000.0), _run(99_000.0)])
    best, values, _ = bench.best_of_moments(
        lambda remaining: next(runs),
        max_wait_s=2400.0,
        tries=3,
        good_value=50_000.0,
        sleep=lambda s: None,
        clock=lambda: 0.0,
    )
    assert best["value"] == 52_000.0 and values == [52_000.0]


def test_best_of_moments_single_try_on_cpu_backend():
    # CPU child runs (the test env) must not be re-sampled
    bench = _load_bench_module()
    runs = iter([_run(120.0, backend="cpu"), _run(130.0, backend="cpu")])
    best, values, _ = bench.best_of_moments(
        lambda remaining: next(runs),
        max_wait_s=2400.0,
        tries=3,
        good_value=50_000.0,
        sleep=lambda s: None,
        clock=lambda: 0.0,
    )
    assert best["value"] == 120.0 and values == [120.0]


def test_best_of_moments_keeps_earlier_success_when_later_try_fails():
    bench = _load_bench_module()
    runs = iter([_run(44_000.0), _run(None, rc=1, failures=5)])
    best, values, agg = bench.best_of_moments(
        lambda remaining: next(runs),
        max_wait_s=2400.0,
        tries=3,
        good_value=60_000.0,
        sleep=lambda s: None,
        clock=lambda: 0.0,
    )
    assert best["value"] == 44_000.0 and values == [44_000.0]
    assert agg["child_failures"] == 5


def test_best_of_moments_respects_budget():
    # the clock jumps past the budget after the first run: no second sample
    bench = _load_bench_module()
    ticks = iter([0.0, 0.0, 2500.0, 2500.0, 2500.0])
    runs = iter([_run(44_000.0), _run(88_000.0)])
    best, values, _ = bench.best_of_moments(
        lambda remaining: next(runs),
        max_wait_s=2400.0,
        tries=3,
        good_value=60_000.0,
        sleep=lambda s: None,
        clock=lambda: next(ticks),
    )
    assert best["value"] == 44_000.0 and values == [44_000.0]


def test_best_of_moments_all_failures_returns_none():
    # transient failures (below the child-failure cap) spend the full try
    # budget rather than ending sampling after the first
    bench = _load_bench_module()
    best, values, agg = bench.best_of_moments(
        lambda remaining: _run(None, rc=1),
        max_wait_s=2400.0,
        tries=3,
        sleep=lambda s: None,
        clock=lambda: 0.0,
    )
    assert best is None and values == []
    assert agg["attempts"] == 3


def test_best_of_moments_continues_after_transient_failure():
    # VERDICT r4 #8: a transient failed try 2 must not end sampling — try 3
    # still runs and the best of tries 1+3 reports
    bench = _load_bench_module()
    runs = iter([_run(44_000.0), _run(None, rc=1, failures=1), _run(49_000.0)])
    best, values, agg = bench.best_of_moments(
        lambda remaining: next(runs),
        max_wait_s=2400.0,
        tries=3,
        good_value=60_000.0,
        sleep=lambda s: None,
        clock=lambda: 0.0,
    )
    assert best["value"] == 49_000.0
    assert values == [44_000.0, 49_000.0]
    assert agg["child_failures"] == 1
