"""Bounded wait/retry for the TPU backend through a flaky tunnel.

The remote-TPU tunnel this environment runs through goes down for multi-minute
stretches (observed outages >9 min; see CLAUDE.md).  Initializing jax's
backend in-process during an outage either hangs (device enumeration blocks
for minutes) or raises and permanently poisons the process's backend state —
so availability is probed in a SUBPROCESS with a hard timeout, and anything
that must record a result (bench.py, the TPU test runner) runs its real work
in a child process that the parent restarts when the tunnel drops mid-run.

Reference context: the workload these artifacts record is the notebook's
53.46 img/s feature loop (channel_importance_hand_crafted_features.ipynb:353);
a lost capture loses the round's scoreboard entry, so surviving outages is a
first-class requirement here, not an ops nicety.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from typing import Callable, Sequence

_PROBE_SRC = (
    "import jax; d = jax.devices(); "
    "print('TPUMCIA_PROBE_OK', d[0].platform, len(d))"
)


def probe_backend(
    timeout_s: float = 240.0, env: dict[str, str] | None = None
) -> dict:
    """Check once, in a subprocess, whether jax can initialize its backend.

    Returns ``{"ok": bool, "elapsed_s": float, "reason": str}``.  A hang past
    ``timeout_s`` (the observed outage mode: device enumeration blocks) is
    reported as ``reason='timeout'``; a raise (the other outage mode:
    ``UNAVAILABLE: TPU backend setup/compile error``) as ``reason='error'``.
    """
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            env=env if env is not None else os.environ.copy(),
        )
    except subprocess.TimeoutExpired:
        return {
            "ok": False,
            "elapsed_s": round(time.perf_counter() - t0, 1),
            "reason": "timeout",
        }
    elapsed = round(time.perf_counter() - t0, 1)
    if proc.returncode == 0 and "TPUMCIA_PROBE_OK" in proc.stdout:
        return {"ok": True, "elapsed_s": elapsed, "reason": "ok"}
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
    return {
        "ok": False,
        "elapsed_s": elapsed,
        "reason": "error: " + (tail[-1][:200] if tail else "rc=%d" % proc.returncode),
    }


def wait_for_backend(
    max_wait_s: float = 1200.0,
    probe_timeout_s: float = 240.0,
    backoff_s: Sequence[float] = (5.0, 15.0, 30.0, 60.0),
    env: dict[str, str] | None = None,
    probe: Callable[[], dict] | None = None,
    log: Callable[[str], None] | None = None,
) -> dict:
    """Probe until the backend is up or ``max_wait_s`` is exhausted.

    ``probe`` is an injection seam for tests (defaults to
    :func:`probe_backend` with ``probe_timeout_s``/``env``).  Returns
    ``{"ok", "attempts", "waited_s", "last_reason"}``.  The first probe runs
    immediately; sleeps between retries follow ``backoff_s`` (last value
    repeats).  ``max_wait_s=0`` still runs exactly one probe.
    """
    if probe is None:
        probe = lambda: probe_backend(probe_timeout_s, env)  # noqa: E731
    if log is None:
        log = lambda msg: print(msg, file=sys.stderr, flush=True)  # noqa: E731
    t0 = time.perf_counter()
    attempts = 0
    last_reason = "never probed"
    while True:
        attempts += 1
        result = probe()
        last_reason = result.get("reason", "?")
        waited = time.perf_counter() - t0
        if result.get("ok"):
            return {
                "ok": True,
                "attempts": attempts,
                "waited_s": round(waited, 1),
                "last_reason": last_reason,
            }
        log(
            "[tpumcia.outage] backend probe %d failed after %.1fs (%s); "
            "%.0fs of budget left"
            % (attempts, result.get("elapsed_s", 0.0), last_reason,
               max(0.0, max_wait_s - waited))
        )
        sleep = backoff_s[min(attempts - 1, len(backoff_s) - 1)]
        if time.perf_counter() - t0 + sleep >= max_wait_s:
            return {
                "ok": False,
                "attempts": attempts,
                "waited_s": round(time.perf_counter() - t0, 1),
                "last_reason": last_reason,
            }
        time.sleep(sleep)


def run_with_retry(
    child_cmd: Sequence[str],
    max_wait_s: float = 2400.0,
    child_timeout_s: float = 1500.0,
    probe_timeout_s: float = 240.0,
    env: dict[str, str] | None = None,
    log: Callable[[str], None] | None = None,
    wait: Callable[[float], dict] | None = None,
    max_child_failures: int = 5,
) -> tuple[int, dict | None, dict]:
    """Run ``child_cmd`` to completion, restarting it across tunnel outages.

    The child is expected to print ONE JSON object line (its last ``{``-
    prefixed stdout line).  Before each attempt the backend is probed with a
    bounded wait (injectable via ``wait`` for tests); a child that fails or
    hangs (``child_timeout_s``) is retried until ``max_wait_s`` of total
    budget is spent — but at most ``max_child_failures`` times: a child that
    keeps dying while the backend probes healthy is a child BUG, and
    re-spawning it for the whole budget would bury that diagnosis under a
    40-minute 'backend unavailable'.  Child stderr is forwarded.  Returns
    ``(rc, parsed_json_or_None, outage_meta)`` where ``outage_meta`` records
    ``{"attempts", "waited_for_backend_s", "child_failures"}``.
    """
    if log is None:
        log = lambda msg: print(msg, file=sys.stderr, flush=True)  # noqa: E731
    t0 = time.perf_counter()
    child_failures = 0
    probe_attempts = 0
    waited_for_backend = 0.0
    while True:
        remaining = max_wait_s - (time.perf_counter() - t0)
        if remaining <= 0:
            return 1, None, {
                "attempts": probe_attempts,
                "waited_for_backend_s": round(waited_for_backend, 1),
                "child_failures": child_failures,
            }
        if wait is None:
            wait_result = wait_for_backend(
                max_wait_s=remaining,
                probe_timeout_s=probe_timeout_s,
                env=env,
                log=log,
            )
        else:
            wait_result = wait(remaining)
        probe_attempts += wait_result.get("attempts", 0)
        waited_for_backend += wait_result.get("waited_s", 0.0)
        if not wait_result.get("ok"):
            return 1, None, {
                "attempts": probe_attempts,
                "waited_for_backend_s": round(waited_for_backend, 1),
                "child_failures": child_failures,
            }
        # re-derive the budget AFTER the backend wait consumed its share —
        # the pre-wait value would let the child overrun max_wait_s by up
        # to child_timeout_s.  A child needs at least ~60 s to do anything
        # useful; rather than clamp UP to that floor (overrunning max_wait_s
        # by up to 60 s), report budget-exhausted when less than the floor
        # remains.
        remaining = max_wait_s - (time.perf_counter() - t0)
        if remaining < 60.0:
            return 1, None, {
                "attempts": probe_attempts,
                "waited_for_backend_s": round(waited_for_backend, 1),
                "child_failures": child_failures,
            }
        try:
            proc = subprocess.run(
                list(child_cmd),
                capture_output=True,
                text=True,
                timeout=min(child_timeout_s, remaining),
                env=env if env is not None else os.environ.copy(),
            )
        except subprocess.TimeoutExpired:
            child_failures += 1
            log("[tpumcia.outage] child timed out; retrying")
            if child_failures >= max_child_failures:
                log(
                    "[tpumcia.outage] child timed out %d times with the "
                    "backend probing healthy — giving up (child bug, not "
                    "an outage)" % child_failures
                )
                return 1, None, {
                    "attempts": probe_attempts,
                    "waited_for_backend_s": round(waited_for_backend, 1),
                    "child_failures": child_failures,
                }
            continue
        if proc.stderr:
            log(proc.stderr.rstrip())
        parsed = None
        if proc.returncode == 0:
            for line in reversed(proc.stdout.splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        parsed = json.loads(line)
                    except json.JSONDecodeError:
                        parsed = None
                    break
        if proc.returncode == 0 and parsed is not None:
            return 0, parsed, {
                "attempts": probe_attempts,
                "waited_for_backend_s": round(waited_for_backend, 1),
                "child_failures": child_failures,
            }
        child_failures += 1
        if child_failures >= max_child_failures:
            log(
                "[tpumcia.outage] child failed %d times with the backend "
                "probing healthy — giving up (child bug, not an outage)"
                % child_failures
            )
            return 1, None, {
                "attempts": probe_attempts,
                "waited_for_backend_s": round(waited_for_backend, 1),
                "child_failures": child_failures,
            }
        log(
            "[tpumcia.outage] child attempt failed (rc=%d, parsed=%s); retrying"
            % (proc.returncode, parsed is not None)
        )


def _main(argv: Sequence[str]) -> int:
    """CLI: ``python -m tpumcia.utils.outage [--max-wait S] [cmd ...]``.

    With no command: block until the backend is up (rc 0) or the budget runs
    out (rc 1) — used by ``make test-tpu`` to wait an outage out before
    pytest.  With a command: delegate to :func:`run_with_retry` and re-print
    the child's JSON line.
    """
    args = list(argv)
    max_wait = 1200.0
    if args[:1] == ["--max-wait"]:
        max_wait = float(args[1])
        args = args[2:]
    if not args:
        result = wait_for_backend(max_wait_s=max_wait)
        print(json.dumps(result), file=sys.stderr)
        return 0 if result["ok"] else 1
    rc, parsed, meta = run_with_retry(args, max_wait_s=max_wait)
    if parsed is not None:
        print(json.dumps(parsed))
    print(json.dumps(meta), file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(_main(sys.argv[1:]))
