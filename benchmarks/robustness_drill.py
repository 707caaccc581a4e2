#!/usr/bin/env python
"""Flagship robustness drill (VERDICT r4 item 7).

Simulates the driver worst case against the COMMITTED bench harness:
a cold disk cache AND synthetic tunnel faults (injected through bench.py's
own retry hooks via PDE_BENCH_FAULT), then asserts that a driver-parseable
JSON metric line still lands inside the wall budget.

Scenarios (each one full ``python bench.py`` parent+child run, fresh
PDE_TPU_CACHE_DIR so the compact fresh-build path is exercised):

  transient — warm:2,pull:2: the async channel warmup fails twice and the
              first two device phases each throw one transient tunnel
              error.  Expect rc=0 with a final (non-banked-only) metric.
  stall     — stall:S: the first channel warmup blocks S seconds — a
              restart-window warmup.  Expect rc=0; the overlapped-warmup
              design must absorb it.
  wedge     — wedge:1 (+FAULT_ONCE): the child hangs forever right after
              banking its first provisional metric.  The parent must
              timeout-kill it and still print the banked line, all inside
              PDE_BENCH_DEADLINE.  Expect a metric line and rc=0.

Run on CPU (default here: small scale, short deadlines — this is a harness
drill, not a perf measurement) or on the real chip with
``PDE_BENCH_SCALE=full PDE_BENCH_DEADLINE=1380 python benchmarks/robustness_drill.py``.

Usage: python benchmarks/robustness_drill.py [transient stall wedge]
Exit 0 iff every selected scenario passes.  Appends one JSON summary line
per scenario to stdout; the human log goes to stderr.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def base_env(tmp):
    env = dict(os.environ)
    env["PDE_TPU_CACHE_DIR"] = os.path.join(tmp, "cache")  # cold cache
    env.setdefault("PDE_BENCH_SCALE", "small")
    if env["PDE_BENCH_SCALE"] == "small":
        # harness drill: CPU is sufficient and keeps the chip free
        env.setdefault("JAX_PLATFORMS", "cpu")
        env.setdefault("JAX_PLATFORM_NAME", "cpu")
        env.setdefault("PDE_BENCH_DEADLINE", "420")
    env.setdefault("PDE_BENCH_PROBE", "0")
    return env


SCENARIOS = {
    "transient": {"PDE_BENCH_FAULT": "warm:2,pull:2"},
    "stall": {"PDE_BENCH_FAULT": "stall:45"},
    "wedge": {"PDE_BENCH_FAULT": "wedge:1"},
}


def run_scenario(name):
    with tempfile.TemporaryDirectory() as tmp:
        env = base_env(tmp)
        env.update(SCENARIOS[name])
        if name == "wedge":
            # only the FIRST child wedges; a parent retry attempt runs clean
            env["PDE_BENCH_FAULT_ONCE"] = os.path.join(tmp, "fault.once")
        deadline = float(env["PDE_BENCH_DEADLINE"])
        log(f"[drill] scenario={name} fault={env['PDE_BENCH_FAULT']} "
            f"deadline={deadline:.0f}s scale={env['PDE_BENCH_SCALE']}")
        t0 = time.monotonic()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, cwd=REPO,
            env=env, timeout=deadline + 120)
        wall = time.monotonic() - t0
        sys.stderr.write(proc.stderr)
        metric = None
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "metric" in parsed:
                    metric = parsed  # last line wins, as the driver parses
        ok = (proc.returncode == 0 and metric is not None
              and wall <= deadline + 60)
        summary = {
            "drill_scenario": name,
            "ok": ok,
            "rc": proc.returncode,
            "wall_seconds": round(wall, 1),
            "deadline_seconds": deadline,
            "metric_line": metric,
        }
        print(json.dumps(summary), flush=True)
        log(f"[drill] {name}: {'PASS' if ok else 'FAIL'} "
            f"(rc={proc.returncode}, wall={wall:.0f}s, "
            f"metric={'yes' if metric else 'NO'})")
        return ok


def main():
    names = sys.argv[1:] or list(SCENARIOS)
    bad = [n for n in names if n not in SCENARIOS]
    if bad:
        log(f"unknown scenario(s): {bad}; choose from {list(SCENARIOS)}")
        return 2
    results = [run_scenario(n) for n in names]
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
