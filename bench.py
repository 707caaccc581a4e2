#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md config 5): 3D static elasticity on a
1 m × 0.2 m × 0.2 m cantilever under gravity at ~2M DOF — wall time of the
PCG solve (mixed-precision MG-PCG with double-f32 refinement) on one TPU
chip.  ``vs_baseline`` = measured reference-class cost / measured seconds
(benchmarks/reference_baseline.py — fresh-LU per call for the small
configs, charitable cold Jacobi-CG for the large 3D ones); ``vs_target``
keeps the BASELINE.md <5 s target ratio.

Fault tolerance (round-2 lesson: one transient tunnel error aborted the
bench with no JSON on record):

* the default entry point is a PARENT that runs the real bench as a child
  process under a TOTAL wall budget (PDE_BENCH_DEADLINE, default 1380 s —
  the driver kills bench.py at ~25-26 min): the first child gets nearly the
  whole budget, crash retries walk a solver fallback chain (df2 fused
  F-cycle → host-driven df F-cycle → plain f32 MG-PCG) with the remainder;
* the CHILD wraps every device phase in retry-with-rewarm (transient
  ``JaxRuntimeError``s from the tunnel get ~3 attempts with channel
  re-warms in between) and falls back across solvers in-process too —
  preferred over respawning, which risks a fresh 9-17 min channel warmup;
* the child BANKS metric lines progressively (a provisional compile-
  inclusive line after the warm-up solve, upgraded after every timed rep);
  the parent keeps a killed child's last banked line, so a driver-side kill
  mid-run still leaves a parsed metric on the record;
* a worker-health probe (bf16 matmul TFLOP/s) runs before timed windows —
  the tunneled v5e has degraded states 5-10× off peak (see CLAUDE.md);
* whichever path produces a timed solve, the JSON line IS printed.

The heavy host-side setup (prepare_system, MG hierarchy, df ladder) is
disk-cached content-keyed (utils.diskcache), so retries and fresh driver
runs skip most pre-solve work.

Methodology: the axon-tunneled TPU charges minutes of warmup to the first
device→host transfer and tens of seconds to XLA compiles; both are one-time
session costs, not solver throughput.  The bench therefore (1) warms the
transfer channel, (2) runs the full solve once to populate jit caches and
device-resident operators, then (3) times fresh solves (from x=0) of the
same system, reporting the best of N (worker-slowdown insurance).

Secondary metrics via PDE_BENCH_CONFIG:
  heat3d     backward-Euler steps/s, 3D heat 64³ cells (275k DOF)
  heat1d     BASELINE config 1: 1D rod 256 nodes, BE steps/s
  bar1d      BASELINE config 2: 1D bar static solve wall time (pure host —
             runs on the CPU backend so TPU-client threads don't contend
             for the single host core)
  heat2d_cn  BASELINE config 3: 2D 128² plate, Crank–Nicolson steps/s
  elast2d    BASELINE config 4: 2D plane stress, solve wall time / MDOF/s
  spmv       finest-level stencil SpMV ms + HBM roofline fraction

Env knobs: PDE_BENCH_SCALE=small|medium|full|xl (default full on TPU;
xl = 128³ heat3d, crosses the transient-MG threshold), PDE_BENCH_CONFIG
(above), PDE_BENCH_SOLVER=df2|df|mgf32, PDE_BENCH_PROBE=0 (skip the health
probe), PDE_BENCH_NO_WRAP=1 (run the child logic directly, no parent),
PDE_TPU_TRACE_DIR (capture a jax.profiler trace around the timed solve),
PDE_BENCH_FAULT / PDE_BENCH_FAULT_ONCE (synthetic tunnel-fault injection —
drill-only, see benchmarks/robustness_drill.py).
"""

import json
import math
import os
import subprocess
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def emit(obj):
    """The one driver-visible JSON line."""
    print(json.dumps(obj), flush=True)
    if isinstance(obj, dict) and "metric" in obj and _fault_take("wedge"):
        # injected worker wedge: the child has just banked a metric and now
        # hangs forever — the parent must kill it on timeout and still
        # report the banked line (benchmarks/robustness_drill.py).
        log("[bench] injected wedge: child sleeping forever after banking")
        while True:
            time.sleep(60)


# ======================================================================
# Fault injection (drill-only: benchmarks/robustness_drill.py)
#
# PDE_BENCH_FAULT="warm:2,pull:1,stall:45,wedge:1" arms synthetic tunnel
# faults in THIS process:
#   warm:N  — the first N rewarm_channel() calls fail (worker restarting),
#   stall:S — the first rewarm sleeps S seconds before succeeding (a
#             restart-window channel warmup),
#   pull:N  — the first N device_retry bodies raise a transient error
#             before running (tunnel fault mid-phase),
#   wedge:N — the child hangs forever right after banking its Nth…1st
#             metric line (wedged worker; the parent's timeout-kill +
#             banked-line path must still produce a driver-visible metric).
# PDE_BENCH_FAULT_ONCE=<path> arms the faults only in the first child
# process to claim <path> (O_EXCL), so a parent retry attempt runs clean.
# Unset (the default) this whole block is a dict lookup — zero overhead.
# ======================================================================

_FAULTS = None


def _fault_budget():
    global _FAULTS
    if _FAULTS is None:
        budget = {}
        spec = os.environ.get("PDE_BENCH_FAULT", "")
        if spec:
            armed = True
            once = os.environ.get("PDE_BENCH_FAULT_ONCE")
            if once:
                try:
                    os.close(os.open(once, os.O_CREAT | os.O_EXCL
                                     | os.O_WRONLY))
                except FileExistsError:
                    armed = False  # another process already injected
            if armed:
                for tok in spec.split(","):
                    kind, _, n = tok.strip().partition(":")
                    budget[kind] = float(n or 1)
                log(f"[bench] FAULT INJECTION ARMED: {budget}")
        _FAULTS = budget
    return _FAULTS


def _fault_take(kind):
    b = _fault_budget()
    if b.get(kind, 0) > 0:
        b[kind] -= 1
        log(f"[bench] injected fault: {kind} ({b[kind]:.0f} left)")
        return True
    return False


# ======================================================================
# Measured reference-class denominators (VERDICT r3 item 3)
#
# Every ``vs_baseline`` below divides by a MEASURED number from
# benchmarks/reference_baseline.py: fresh scipy-SuperLU solves of the SAME
# discrete system for the small configs (the reference's FEniCS
# ``solve(a == L)`` re-factorizes every call, fenics_mcp_server.py:309-318),
# and a charitable cold Jacobi-CG for the large 3D configs where a literal
# fresh-LU denominator is astronomically slow (fresh-LU ladders + power-law
# fits are recorded in reference_baseline.json for audit).  The constants
# here are a fallback snapshot; the JSON, when present, wins.
# ======================================================================

_REF_BASELINE_FALLBACK = {
    "heat1d_steps_per_s": 5448.7,       # fresh spsolve per BE step, 256 nodes
    "bar1d_solve_ms": 0.15,             # fresh spsolve, fixed-free 1D K
    "heat2d_steps_per_s": 8.77,         # fresh spsolve per CN step, 128²
    "elast2d_solve_ms": 4979.4,         # fresh spsolve, 256² plane stress
    "elast3d_2M_iterative_solve_s": 671.5,   # cold Jacobi-CG, rtol 1e-6
    # (num_nodes, steps/s) cold Jacobi-CG BE-step points → power-law fit
    "heat3d_iter_points": ((65 ** 3, 1.867), (129 ** 3, 0.0604)),
}


def ref_baseline():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "reference_baseline.json")
    vals = dict(_REF_BASELINE_FALLBACK)
    try:
        with open(path) as f:
            data = json.load(f)
        for k in ("heat1d_steps_per_s", "bar1d_solve_ms",
                  "heat2d_steps_per_s", "elast2d_solve_ms",
                  "elast3d_2M_iterative_solve_s"):
            vals[k] = data[k]["value"]
        vals["heat3d_iter_points"] = (
            (65 ** 3, data["heat3d_64cubed_iterative_steps_per_s"]["value"]),
            (129 ** 3, data["heat3d_128cubed_iterative_steps_per_s"]["value"]))
    except Exception as e:
        log(f"[bench] reference_baseline.json unreadable "
            f"({type(e).__name__}) — using the snapshot constants")
    return vals


def _heat3d_iter_alpha(vals):
    import math
    (n1, s1), (n2, s2) = vals["heat3d_iter_points"]
    return math.log(s1 / s2) / math.log(n2 / n1)


def heat3d_ref_steps_per_s(num_nodes):
    """Reference-class (cold Jacobi-CG) BE steps/s at this mesh size:
    measured directly at 65³/129³ nodes, power-law interpolated elsewhere
    (fitted exponent ≈1.7 — CG iteration growth × per-iteration cost)."""
    vals = ref_baseline()
    (n1, s1), _ = vals["heat3d_iter_points"]
    return s1 * (n1 / num_nodes) ** _heat3d_iter_alpha(vals)


def elast3d_ref_seconds(ndof):
    """Reference-class (cold Jacobi-CG) solve seconds for the cantilever:
    measured at the flagship's exact 2,040,675-DOF system; off-size runs
    (small/medium CPU smoke scales) reuse the heat-iterative exponent."""
    vals = ref_baseline()
    ref_ndof = 3 * 161 * 65 * 65
    return vals["elast3d_2M_iterative_solve_s"] * (
        ndof / ref_ndof) ** _heat3d_iter_alpha(vals)


# ======================================================================
# Parent: crash/timeout isolation + solver fallback chain
# ======================================================================

def _attempt_plan(cfg_name):
    """[(extra_env, timeout_cap_s), ...] — fallback env chain.  The caps are
    UPPER bounds; :func:`run_parent` shrinks each attempt to the wall budget
    actually left under PDE_BENCH_DEADLINE."""
    if cfg_name == "elasticity3d":
        return [({"PDE_BENCH_SOLVER": os.environ.get("PDE_BENCH_SOLVER",
                                                     "df2")}, 1320),
                ({"PDE_BENCH_SOLVER": "df"}, 600),
                ({"PDE_BENCH_SOLVER": "mgf32"}, 420)]
    if cfg_name == "bar1d":
        # pure-host path: no TPU client in the child → no thread contention
        # on the single host core (VERDICT r2 item 10)
        env = {"JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu"}
        return [(env, 600), (env, 600)]
    return [({}, 1320), ({}, 600)]


def run_parent():
    """Deadline-aware attempt loop (round-4 rework, VERDICT r3 item 1).

    The driver kills bench.py ~25-26 min in (BENCH_r03: rc=124 with the old
    1500+1200+900 s plan).  The parent therefore treats PDE_BENCH_DEADLINE
    (default 1380 s) as the TOTAL wall budget:

    * the FIRST child gets nearly all of it — one process pays one channel
      warmup; kill+respawn risks a fresh 9-17 min restart-window warmup
      (CLAUDE.md), so in-child solver fallback is preferred over respawning;
    * later attempts (child crashed early) get whatever time is left;
    * the child BANKS metric lines progressively (provisional after the
      warm-up solve, upgraded after each timed rep), and the parent emits the
      last banked line from a killed child rather than discarding it.
    """
    t_start = time.monotonic()
    deadline = t_start + float(os.environ.get("PDE_BENCH_DEADLINE", "1380"))
    cfg_name = os.environ.get("PDE_BENCH_CONFIG", "elasticity3d")
    plan = _attempt_plan(cfg_name)
    banked = None
    for i, (extra_env, cap_s) in enumerate(plan):
        remaining = deadline - time.monotonic()
        if remaining < 150:
            log(f"[bench] only {remaining:.0f}s of budget left — "
                f"skipping attempt {i + 1}")
            break
        timeout_s = int(min(cap_s, remaining - 40))
        env = dict(os.environ)
        env.update(extra_env)
        env["PDE_BENCH_CHILD"] = "1"
        env["PDE_BENCH_CHILD_BUDGET"] = str(max(timeout_s - 10, 60))
        log(f"[bench] attempt {i + 1}/{len(plan)} config={cfg_name} "
            f"env={extra_env} timeout={timeout_s}s "
            f"(budget left {remaining:.0f}s)")
        try:
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)],
                stdout=subprocess.PIPE, stderr=None, text=True, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)))
        except OSError as e:
            log(f"[bench] spawn failed: {e}")
            continue
        stdout_text = ""
        killed = False
        try:
            stdout_text, _ = proc.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            killed = True
            log(f"[bench] attempt {i + 1} timed out after {timeout_s}s — "
                f"killing child pid {proc.pid}")
            proc.kill()
            try:
                stdout_text, _ = proc.communicate(timeout=30)
            except subprocess.TimeoutExpired:
                stdout_text = ""
        result_line = None
        for line in (stdout_text or "").splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "metric" in parsed:
                    result_line = line  # keep the LAST (best) banked line
                    continue
            if line:
                log(f"[bench child stdout] {line}")
        if result_line is not None:
            banked = result_line
            if not killed and proc.returncode == 0:
                print(banked, flush=True)
                return 0
            log(f"[bench] attempt {i + 1} banked a metric before "
                f"{'timeout' if killed else f'rc={proc.returncode}'} — kept")
        log(f"[bench] attempt {i + 1} "
            f"{'killed' if killed else f'exited rc={proc.returncode}'}"
            + ("" if banked else " with no metric")
            + ("; retrying with fallback" if i + 1 < len(plan) else ""))
        if i + 1 < len(plan):
            time.sleep(15)  # let the tunnel/worker settle before respawning
    if banked is not None:
        print(banked, flush=True)
        return 0
    log("[bench] all attempts failed — no metric to report")
    return 1


# Child-side wall budget (set by the parent): emit early, skip optional work
# near the end rather than losing the whole attempt to the parent's kill.
_CHILD_T0 = time.monotonic()


def child_time_left():
    budget = os.environ.get("PDE_BENCH_CHILD_BUDGET")
    if not budget:
        return float("inf")
    return float(budget) - (time.monotonic() - _CHILD_T0)


# ======================================================================
# Child-side helpers
# ======================================================================

def rewarm_channel():
    stall = _fault_budget().pop("stall", 0)
    if stall > 0:
        log(f"[bench] injected channel stall: {stall:.0f}s")
        time.sleep(stall)
    if _fault_take("warm"):
        return False
    try:
        import jax.numpy as jnp
        _ = float(jnp.zeros(()))
        return True
    except Exception as e:  # worker restarting — give it time
        log(f"[bench] channel re-warm failed: {type(e).__name__}: {e}")
        return False


def warm_channel(attempts=5):
    """First device→host transfer (the expensive one) with worker-restart
    patience."""
    for _ in range(attempts):
        if rewarm_channel():
            return
        time.sleep(20)
    raise RuntimeError("device channel never came up")


def warm_channel_async():
    """Start the first device→host pull on a BACKGROUND thread.

    Remote compiles and host→device uploads proceed while that first pull
    is blocked (probed on the live tunnel: a fresh jit compile finished in
    0.8 s while the warmup transfer was still waiting), so the flagship's
    setup uploads and the ~160 s fused-round compile overlap the 40-993 s
    channel warmup instead of following it.  Returns join(timeout) — call
    it once a pull has to succeed; it logs the overlapped warmup time."""
    import threading
    state = {}
    t0 = time.perf_counter()

    def _run():
        try:
            warm_channel()
            state["dt"] = time.perf_counter() - t0
        except Exception as e:
            state["err"] = e

    th = threading.Thread(target=_run, daemon=True)
    th.start()

    def join(timeout=None):
        th.join(timeout)
        if th.is_alive():
            log("[bench] channel warmup still blocked — first real pull "
                "will synchronize")
            return False
        if "err" in state:
            log(f"[bench] background channel warmup failed: {state['err']} "
                f"(solve-path retries will re-warm)")
            return False
        log(f"[bench] transfer-channel warmup: {state['dt']:.1f}s "
            f"(overlapped with setup/compile)")
        return True

    return join


def device_retry(fn, what, attempts=3):
    """Run fn(); on transient device/tunnel errors re-warm and retry."""
    for k in range(attempts):
        try:
            if _fault_take("pull"):
                raise RuntimeError(
                    "injected transient tunnel fault (PDE_BENCH_FAULT)")
            return fn()
        except Exception as e:
            log(f"[bench] {what} failed (attempt {k + 1}/{attempts}): "
                f"{type(e).__name__}: {e}")
            if k == attempts - 1:
                raise
            time.sleep(10 * (k + 1))
            if not rewarm_channel():
                time.sleep(30)
                rewarm_channel()


def worker_health_probe(min_tflops=None, attempts=3):
    """bf16 matmul TFLOP/s check: the tunneled v5e degrades under sustained
    load (measured 18 TFLOP/s ≈ 5% of peak in a bad state).  Returns the
    measured TFLOP/s; waits + retries while degraded."""
    import jax
    import jax.numpy as jnp

    if (os.environ.get("PDE_BENCH_PROBE", "1") in ("0", "off")
            or jax.default_backend() != "tpu"):
        return None
    if min_tflops is None:
        min_tflops = float(os.environ.get("PDE_BENCH_PROBE_MIN_TFLOPS", 50.0))
    n, reps = 4096, 32

    @jax.jit
    def chain(a):
        def body(_, x):
            y = a @ x
            return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))
        return jax.lax.fori_loop(0, reps, body, a)

    a = jnp.ones((n, n), jnp.bfloat16) * jnp.bfloat16(0.001)
    tf = None
    for k in range(attempts):
        float(jnp.max(jnp.abs(chain(a))))  # compile+warm / sync
        t0 = time.perf_counter()
        float(jnp.max(jnp.abs(chain(a))))
        dt = time.perf_counter() - t0
        tf = 2 * n**3 * reps / dt / 1e12
        log(f"[bench] worker health probe: {tf:.0f} TFLOP/s bf16 "
            f"({'healthy' if tf >= min_tflops else 'DEGRADED'})")
        if tf >= min_tflops or k == attempts - 1:
            break
        log("[bench] degraded worker — resting 30s before re-probe")
        time.sleep(30)
    return tf


def timed_rep_count(probe_tf, base=2, degraded=4):
    """Best-of rep count for the timed measurements.

    On a DEGRADED worker (probe below the healthy threshold) each timed
    rep is cheap relative to the setup already paid, and the chip's
    slowdown states are intermittent (BENCH_NOTES "chip-health caveat":
    identical programs 3.9→10.5→21.7 s back-to-back) — more reps are more
    chances to catch a fast window.  Returns ``base`` when the probe was
    skipped or healthy."""
    if probe_tf is None:
        return base
    thresh = float(os.environ.get("PDE_BENCH_PROBE_MIN_TFLOPS", 50.0))
    return degraded if probe_tf < thresh else base


# ======================================================================
# Secondary configs
# ======================================================================

def bench_heat3d():
    """Transient 3D heat: backward-Euler steps/s (BASELINE 'steps/s' metric)."""
    import jax
    import jax.numpy as jnp

    from pde_solver_tpu.mesh import box_mesh
    from pde_solver_tpu.models import heat

    scale = os.environ.get("PDE_BENCH_SCALE",
                           "full" if jax.default_backend() == "tpu" else "small")
    # xl (128³ ≈ 2.1M DOF) crosses transient_mg_threshold → MG-PCG steps
    cells = {"small": 16, "medium": 40, "full": 64, "xl": 128}[scale]
    # xl runs 50 steps too: the scan-marginal step is ~17 ms (BENCH_NOTES
    # "xl transient anatomy"), so more steps amortize the one-time program
    # entry and the metric reflects stepping throughput
    num_steps = 50
    t0 = time.perf_counter()
    warm_channel()
    log(f"[bench] warmup: {time.perf_counter() - t0:.1f}s")
    heat3d_probe_tf = worker_health_probe()

    mesh = box_mesh(cells, cells, cells, (0, 0, 0), (1.0, 1.0, 1.0))
    log(f"[bench] heat3d transient: {cells}³ cells, {mesh.num_nodes} DOF, "
        f"{num_steps} backward-Euler steps")
    p = heat.HeatProblem(
        mesh=mesh, diffusivity=1.0,
        bc_builder=lambda m: [(m.boundary_mask(), 0.0)],
        T_initial=20.0, dt=0.01, num_steps=num_steps)

    ref_steps_s = heat3d_ref_steps_per_s((cells + 1) ** 3)

    def metric_line(steps_s, **extra):
        out = {
            "metric": f"heat3d_{cells}cubed_backward_euler_steps_per_s",
            "value": round(steps_s, 2),
            "unit": "steps/s",
            # measured: cold Jacobi-CG BE step of the same system
            "vs_baseline": round(steps_s / ref_steps_s, 3),
        }
        out.update(extra)
        return out

    t0 = time.perf_counter()
    _, _, info = device_retry(lambda: heat.solve_heat_problem(p),
                              "heat3d warm-up solve")
    warmup_scan_s = info.get("scan_seconds") or info["solve_seconds"]
    log(f"[bench] warm-up run (incl. compile): {time.perf_counter() - t0:.1f}s "
        f"iters={info['cg_iterations']} relres={info['relative_residual']:.1e}")
    # bank a provisional line (parent keeps a killed child's last metric)
    emit(metric_line(num_steps / warmup_scan_s,
                     provisional="warmup_scan_includes_compile"))
    # best of 2 (4 on a degraded worker): the tunneled worker shows
    # sporadic slowdown states that inflate long scans 2-5× (see
    # BENCH_NOTES "chip-health caveat"); the fastest post-compile run is
    # the honest device capability.
    scans = []
    fetches = []
    for rep in range(timed_rep_count(heat3d_probe_tf)):
        try:
            t0 = time.perf_counter()
            times, values, info = heat.solve_heat_problem(p)
            total = time.perf_counter() - t0
        except Exception as e:
            log(f"[bench] timed[{rep}] failed: {type(e).__name__}: {e}")
            rewarm_channel()
            continue
        scan_s = info.get("scan_seconds") or info["solve_seconds"]
        scans.append(scan_s)
        fetches.append(info.get("fetch_seconds", 0.0))
        log(f"[bench] timed[{rep}]: total={total:.2f}s scan={scan_s:.2f}s "
            f"setup={info.get('setup_seconds', 0.0):.2f}s "
            f"fetch={info.get('fetch_seconds', 0.0):.2f}s "
            f"(CG iters total {info['cg_iterations']}, "
            f"relres {info['relative_residual']:.1e})")
        emit(metric_line(num_steps / min(scans)))  # bank best-so-far
        if child_time_left() < 120:
            log("[bench] child budget nearly spent — skipping further reps")
            break
    if not scans:
        # both timed reps died on the tunnel — the successful warm-up
        # measurement (compile-inclusive, so pessimistic) is still a
        # reportable number; never leave the child without a metric.
        log("[bench] both timed reps failed — falling back to the "
            f"warm-up measurement ({warmup_scan_s:.2f}s, incl. compile)")
        scans = [warmup_scan_s]
    steps_s = num_steps / min(scans)
    log(f"[bench] → {steps_s:.1f} steps/s (best of {len(scans)})")
    # fetch capability = the best rep, same accounting as steps/s (tunnel
    # throughput varies 9-40 MB/s rep to rep)
    fetch_s = min(fetches) if fetches else info.get("fetch_seconds", 0.0)
    emit(metric_line(steps_s, fetch_seconds=round(fetch_s, 2)))


def bench_heat1d():
    """BASELINE config 1: 2 m rod, 256 nodes, 20→0 °C, backward Euler."""
    from pde_solver_tpu.mesh import interval_mesh
    from pde_solver_tpu.models import heat

    warm_channel()
    num_steps = 400
    p = heat.HeatProblem(
        mesh=interval_mesh(255, 0.0, 2.0), diffusivity=1.0,
        bc_builder=lambda m: [(m.face_mask(0, 0), 20.0),
                              (m.face_mask(0, 1), 0.0)],
        T_initial=0.0, dt=0.05, num_steps=num_steps)
    device_retry(lambda: heat.solve_heat_problem(p), "heat1d compile")
    t0 = time.perf_counter()
    _, values, info = device_retry(lambda: heat.solve_heat_problem(p),
                                   "heat1d timed solve")
    steps_s = num_steps / (info.get("scan_seconds") or info["solve_seconds"])
    x = np.linspace(0.0, 2.0, 256)
    err = float(np.linalg.norm(values[-1] - 20.0 * (1 - x / 2.0))
                / np.linalg.norm(20.0 * (1 - x / 2.0)))
    log(f"[bench] heat1d: {steps_s:.0f} steps/s, steady-limit relL2={err:.1e}")
    emit({
        "metric": "heat1d_256nodes_backward_euler_steps_per_s",
        "value": round(steps_s, 1), "unit": "steps/s",
        # measured: fresh spsolve of (M+dtK) per step
        "vs_baseline": round(steps_s / ref_baseline()["heat1d_steps_per_s"], 3),
    })


def bench_bar1d():
    """BASELINE config 2: 2 m aluminum bar, fixed-free, static KU=F.

    Runs on the CPU backend (parent sets JAX_PLATFORMS=cpu): the solve is a
    pure-host sparse LU and the TPU client's background threads were
    measured stealing ~97% of the single host core (71 ms for a 2 ms
    solve)."""
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from pde_solver_tpu.models.elasticity import solve_bar_1d

    solve_bar_1d(2.0, 255, 70e9, 0.01, 500.0)  # warm caches
    ms = np.inf
    for _rep in range(3):
        t0 = time.perf_counter()
        x, field, info = solve_bar_1d(2.0, 255, 70e9, 0.01, 500.0)
        ms = min(ms, (time.perf_counter() - t0) * 1e3)
    exact = 500.0 * (2.0 - x) / 0.01
    err = float(np.abs(field[10:-10] - exact[10:-10]).max() / exact.max())
    log(f"[bench] bar1d: {ms:.1f} ms/solve (backend={jax.default_backend()}), "
        f"interior stress err={err:.1e}")
    emit({
        "metric": "bar1d_256nodes_static_solve_ms",
        "value": round(ms, 2), "unit": "ms",
        # VERDICT r4 weak #6: the config-2 denominator (fresh spsolve of a
        # tridiagonal system, 0.15 ms) is near-free, so a speed RATIO at
        # this size is noise — the record is the wall time itself.  The
        # ratio is kept only as an explicitly-labeled informational field.
        "vs_baseline": None,
        "vs_baseline_note": "denominator near-free (tridiagonal LU 0.15 ms);"
                            " wall-time is the record for this config",
        "informational_ratio": round(
            ref_baseline()["bar1d_solve_ms"] / ms, 3),
    })


def bench_heat2d_cn():
    """BASELINE config 3: 1 m² plate, 128² mesh, Crank–Nicolson stepping."""
    from pde_solver_tpu.mesh import rectangle_mesh
    from pde_solver_tpu.models import heat

    warm_channel()
    num_steps = 50
    p = heat.HeatProblem(
        mesh=rectangle_mesh(128, 128, (0.0, 0.0), (1.0, 1.0)),
        diffusivity=1.0, bc_builder=lambda m: [(m.boundary_mask(), 0.0)],
        T_initial=20.0, dt=0.001, num_steps=num_steps, theta=0.5)
    device_retry(lambda: heat.solve_heat_problem(p), "heat2d compile")
    _, values, info = device_retry(lambda: heat.solve_heat_problem(p),
                                   "heat2d timed solve")
    steps_s = num_steps / (info.get("scan_seconds") or info["solve_seconds"])
    log(f"[bench] heat2d CN: {steps_s:.1f} steps/s "
        f"(iters {info['cg_iterations']}, relres {info['relative_residual']:.1e})")
    emit({
        "metric": "heat2d_128sq_crank_nicolson_steps_per_s",
        "value": round(steps_s, 2), "unit": "steps/s",
        # measured: fresh spsolve of (M+θdtK) per step
        "vs_baseline": round(steps_s / ref_baseline()["heat2d_steps_per_s"], 3),
    })


def bench_elast2d():
    """BASELINE config 4: 1 m² steel plate, plane stress, clamped + load."""
    from pde_solver_tpu.mesh import rectangle_mesh
    from pde_solver_tpu.models.elasticity import solve_elasticity_nd

    warm_channel()
    mesh = rectangle_mesh(256, 256, (0.0, 0.0), (1.0, 1.0))
    body = np.array([0.0, -7.65e4])
    device_retry(
        lambda: solve_elasticity_nd(mesh, 210e9, 0.3, body, "plane_stress"),
        "elast2d compile")
    _, info = device_retry(
        lambda: solve_elasticity_nd(mesh, 210e9, 0.3, body, "plane_stress"),
        "elast2d timed solve")
    ms = info["solve_seconds"] * 1e3
    mdof = info["num_dofs"] * max(info["cg_iterations"], 1) / info["solve_seconds"] / 1e6
    log(f"[bench] elast2d 256²: {ms:.0f} ms/solve, {mdof:.0f} MDOF/s, "
        f"relres {info['relative_residual']:.1e}")
    emit({
        "metric": "elasticity2d_256sq_plane_stress_solve_ms",
        "value": round(ms, 1), "unit": "ms",
        # measured: fresh spsolve (SuperLU) of the same 132k-DOF system
        "vs_baseline": round(ref_baseline()["elast2d_solve_ms"] / ms, 3),
    })


def bench_spmv():
    """Finest-level stencil SpMV: ms/apply + HBM roofline fraction."""
    scale = os.environ.get("PDE_BENCH_SCALE", "full")
    cells = {"small": "32 16 16", "medium": "96 32 32",
             "full": "160 64 64", "xl": "256 128 64"}.get(scale, "160 64 64")
    out = subprocess.run(
        [sys.executable, "benchmarks/spmv_bench.py", *cells.split(), "50"],
        capture_output=True, text=True)
    log(out.stdout + out.stderr)


# ======================================================================
# Flagship: 2M-DOF 3D elasticity
# ======================================================================

def bench_flagship():
    import jax
    import jax.numpy as jnp

    from pde_solver_tpu.mesh import box_mesh
    from pde_solver_tpu.models.elasticity import lame_parameters, von_mises_fields
    from pde_solver_tpu.ops import assembly, multigrid as mg
    from pde_solver_tpu.ops.bc import DirichletBC
    from pde_solver_tpu.ops.linsolve import prepare_system

    backend = jax.default_backend()
    scale = os.environ.get("PDE_BENCH_SCALE",
                           "full" if backend == "tpu" else "small")
    cells = {"small": (32, 16, 16), "medium": (96, 32, 32),
             "full": (160, 64, 64), "xl": (160, 64, 64)}[scale]
    cells_env = os.environ.get("PDE_BENCH_CELLS")
    if cells_env:
        # explicit mesh override for scaling studies ("224 96 96")
        cells = tuple(int(x) for x in cells_env.split())
    log(f"[bench] backend={backend} scale={scale} cells={cells}")

    warm_join = warm_channel_async()

    E, nu = 210e9, 0.3
    lam, mu = lame_parameters(E, nu, "3d")
    mesh = box_mesh(*cells, (0, 0, 0), (1.0, 0.2, 0.2))
    ndof = mesh.num_nodes * 3
    log(f"[bench] nodes={mesh.num_nodes} DOF={ndof}")

    t_setup0 = time.perf_counter()

    # --- spec fast path: a prior run of this exact problem persisted the
    # prepared RHS/scales + the hierarchy's content key, so assembly AND
    # prepare_system can be skipped entirely (the hierarchy itself rebuilds
    # from its disk entry with device-side CS expansion — uploads only).
    from pde_solver_tpu.ops.linsolve import ScaledSystem
    from pde_solver_tpu.utils import diskcache

    speckey = ("elasticity3d-cantilever-v1", cells, E, nu,
               (0.0, 0.0, -9.81 * 7800.0))
    sysm = None
    h = None
    # the spec fast path rebuilds the hierarchy with dense operators —
    # incompatible with PDE_TPU_CS routing (would silently disable it)
    cs_on = os.environ.get("PDE_TPU_CS", "0").lower() not in ("0", "off",
                                                              "false")
    spec = None if cs_on else diskcache.load("benchspec", speckey)
    if spec is not None:
        import ast
        try:
            ckey = ast.literal_eval(spec["meta"]["ckey"])
            h = device_retry(
                lambda: mg.load_hierarchy_from_disk(ckey, 3, jnp.float32),
                "hierarchy disk rebuild")
            if h is not None:
                sysm = ScaledSystem(
                    ckey[2], None, spec["b_hat"], spec["gvals"],
                    spec["free"], "block", None, None, spec["CinvT"],
                    ckey=ckey)
                log(f"[bench] spec fast path: assembly+prepare skipped, "
                    f"hierarchy rebuilt from disk "
                    f"({time.perf_counter() - t_setup0:.1f}s)")
        except Exception as e:
            log(f"[bench] spec fast path unusable ({type(e).__name__}: {e})")
            sysm = h = None

    if sysm is None:
        t0 = time.perf_counter()
        K = assembly.assemble_elasticity_stencil(mesh, lam, mu)
        b = assembly.assemble_vector_load(mesh,
                                          np.array([0.0, 0.0, -9.81 * 7800.0]))
        bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 0.0)],
                                    mesh.node_shape, vdim=3)
        log(f"[bench] assembly: {time.perf_counter() - t0:.1f}s")

        t0 = time.perf_counter()
        sysm = prepare_system(K, mesh, bc, b, 3)
        log(f"[bench] prepare (mask+block-scale): "
            f"{time.perf_counter() - t0:.1f}s")

        def builder(mc):
            return (assembly.assemble_elasticity_stencil(mc, lam, mu),
                    DirichletBC.from_masks([(mc.face_mask(0, 0), 0.0)],
                                           mc.node_shape, vdim=3))

        t0 = time.perf_counter()
        h = device_retry(
            lambda: mg.build_hierarchy_cached(mesh, sysm, builder, vdim=3,
                                              dtype=jnp.float32,
                                              cache_key=sysm.ckey),
            "hierarchy build+upload")
        log(f"[bench] hierarchy build+upload ({len(h.levels)} levels): "
            f"{time.perf_counter() - t0:.1f}s")
        if sysm.ckey is not None:
            diskcache.store(
                "benchspec", speckey,
                {"b_hat": np.asarray(sysm.b_hat),
                 "gvals": np.asarray(sysm.gvals),
                 "free": np.asarray(sysm.free),
                 "CinvT": np.asarray(sysm.CinvT)},
                meta={"ckey": repr(sysm.ckey)})

    # V(2,1) cycle for the flagship df2 rounds: measured 0.600 s vs 0.638 s
    # for the symmetric V(2,2) at identical iteration count/residual
    # (BENCH_NOTES "smoothing sweep"; benchmarks/df2_sweep.py).  Same
    # device arrays — only the static smoothing degrees change.
    smooth = os.environ.get("PDE_BENCH_SMOOTH", "2,1")
    if smooth:
        pre_s, post_s = (int(x) for x in smooth.split(","))
        if (pre_s, post_s) != (h.pre_smooth, h.post_smooth):
            h = h._replace(pre_smooth=pre_s, post_smooth=post_s)
            log(f"[bench] MG cycle: V({pre_s},{post_s})")

    solver_start = os.environ.get("PDE_BENCH_SOLVER", "df2")
    ladder = None
    if solver_start != "mgf32":
        t0 = time.perf_counter()
        try:
            ladder = device_retry(
                lambda: mg.build_df_ladder(h, sysm, sysm.b_hat),
                "df ladder build+upload")
            jax.block_until_ready(ladder.Whi)
            log(f"[bench] double-f32 ladder upload: "
                f"{time.perf_counter() - t0:.1f}s")
        except Exception as e:
            # df2/df need the ladder; mgf32 does not — degrade in-process
            # instead of dying (a respawn risks a fresh channel warmup).
            log(f"[bench] ladder build failed ({type(e).__name__}: {e}) — "
                f"falling back to the mgf32 chain")
            solver_start = "mgf32"
    setup_s = time.perf_counter() - t_setup0
    log(f"[bench] total pre-solve setup: {setup_s:.1f}s "
        f"(child budget left {child_time_left():.0f}s)")

    # VERDICT r3 item 1b: probe worker health BEFORE the warm-up solve when
    # the transfer channel is already up (join(0) is non-blocking, so a slow
    # warmup keeps overlapping the warm-up solve's compile instead).
    if warm_join(timeout=0) and child_time_left() > 120:
        worker_health_probe(attempts=1)

    bench_tol = float(os.environ.get("PDE_BENCH_TOL", 1e-7))
    # ‖b̂‖ from the HOST copy: the solver then dispatches its fused round
    # program without any device→host pull first, so the big compile can
    # run while the background channel warmup is still blocked.
    bnorm_host = max(float(np.linalg.norm(
        np.asarray(sysm.b_hat, np.float64).reshape(-1))), 1e-300)

    inner = int(os.environ.get("PDE_BENCH_INNER", 10))

    def solve_df2():
        x_hi, x_lo, iters, relres = mg.solve_fcycle_df2(
            h, ladder, bench_tol, inner_iters=inner, max_rounds=12,
            bnorm=bnorm_host)
        return (x_hi, x_lo), iters, relres

    def solve_df():
        x_hi, x_lo, iters, relres = mg.solve_fcycle_df(
            h, ladder, bench_tol, inner_iters=inner, max_rounds=12,
            bnorm=bnorm_host)
        return (x_hi, x_lo), iters, relres

    def solve_mgf32():
        """Last-resort fallback (df2 AND df unusable): f32 MG-PCG inner
        solves + host float64 residual refinement.  A bare f32 MG-PCG
        floors near κ·ε32 (measured 7.1e-3 relative on this cantilever);
        the host-refreshed rounds recover ~1e-7-grade residuals at the cost
        of a few single-core stencil applies."""
        from pde_solver_tpu.ops import df32 as _df32

        lv0 = h.levels[0]
        if lv0.host_weights is not None:
            lv_host = lv0
        elif lv0.host_pairs is not None:
            w64 = [np.asarray(hi, np.float64) + np.asarray(lo)
                   for hi, lo in zip(*lv0.host_pairs)]
            lv_host = lv0._replace(host_weights=w64)
        else:  # CS disk rebuild carries the compact split, not f64 weights
            wc_hi, wc_lo, shi, slo = lv0.host_cs
            ns = tuple(int(s) for s in lv0.free.shape[:3])
            hi = mg._expand_cs_np(wc_hi, shi, ns, 3)
            lo = mg._expand_cs_np(wc_lo, slo, ns, 3)
            w64 = [hi[k].astype(np.float64) + lo[k]
                   for k in range(hi.shape[0])]
            lv_host = lv0._replace(host_weights=w64)
        b64 = np.asarray(sysm.b_hat, np.float64)
        bnorm = max(float(np.linalg.norm(b64.reshape(-1))), 1e-300)
        x64 = np.zeros_like(b64)
        total = 0
        relres = 1.0
        for _round in range(6):
            r = b64 - mg._host_apply(lv_host, x64, 3, 3)
            relres = float(np.linalg.norm(r.reshape(-1))) / bnorm
            if relres <= max(bench_tol, 1e-7):
                break
            scale = float(np.max(np.abs(r)))
            d32, k, _ = mg.solve_mg(h, (r / scale).astype(np.float32), None,
                                    1e-5, 200)
            x64 = x64 + scale * np.asarray(d32, np.float64)
            total += int(k)
        hi, lo = _df32.df_from_f64(x64)
        return (jnp.asarray(hi), jnp.asarray(lo)), total, relres

    chain = {"df2": [("df2", solve_df2), ("df", solve_df),
                     ("mgf32", solve_mgf32)],
             "df": [("df", solve_df), ("mgf32", solve_mgf32)],
             "mgf32": [("mgf32", solve_mgf32)]}[solver_start]

    from pde_solver_tpu.utils.observability import device_trace

    target_seconds = 5.0          # BASELINE.md config-5 wall-time target
    ref_seconds = elast3d_ref_seconds(ndof)

    def metric_line(value_s, kind, iters, relres, **extra):
        out = {
            "metric": "elasticity3d_cantilever_2MDOF_solve_seconds",
            "value": round(value_s, 3),
            "unit": "s",
            # measured: cold Jacobi-CG of the exact flagship system (671.5 s
            # at full scale) — the charitable reference class; the literal
            # reference behavior (fresh LU per call) extrapolates to ~3.8
            # DAYS at 2M DOF (reference_baseline.json fresh-LU ladder)
            "vs_baseline": round(ref_seconds / value_s, 3),
            "vs_target": round(target_seconds / value_s, 3),
            "solver": kind,
            "relres": float(f"{relres:.3e}"),
            "setup_seconds": round(setup_s, 1),
        }
        out.update(extra)
        return out

    solver_used = None
    x_hat = None
    solve_s = float("inf")
    iters = 0
    relres = float("nan")
    for kind, solver in chain:
        # warm-up run (compiles); transient tunnel errors retried in place
        try:
            t0 = time.perf_counter()
            x_hat, iters, relres = device_retry(
                solver, f"{kind} warm-up solve", attempts=3)
            warmup_solve_s = time.perf_counter() - t0
            log(f"[bench] {kind} warm-up solve (incl. jit compile, "
                f"overlapping any remaining channel warmup): "
                f"{warmup_solve_s:.1f}s  iters={iters} relres={relres:.2e}")
        except Exception as e:
            log(f"[bench] solver {kind} unusable ({type(e).__name__}: {e}) — "
                f"falling back")
            rewarm_channel()
            continue
        if not math.isfinite(relres) or relres > 1e-3:
            # a DIVERGED solve must never be banked as the flagship number
            # (r5 scaling study: df2 NaN'd at 9.8M DOF and the old code
            # reported relres=NaN with a huge vs_baseline) — fall through
            # to the next solver kind
            log(f"[bench] {kind} solve did not converge "
                f"(relres={relres!r}) — falling back")
            continue
        # BANK a provisional metric now (VERDICT r3 item 1c): a real
        # converged solve, wall time compile-inclusive — if anything after
        # this point wedges, the parent still has a line to report.  Each
        # timed rep below re-emits; the parent keeps the LAST line.
        emit(metric_line(warmup_solve_s, kind, iters, relres,
                         provisional="warmup_includes_jit_compile"))
        # warm-up solve pulled scalars → channel is up; collect its timing
        # line, then gate the TIMED reps on a healthy worker.
        warm_join(timeout=5)
        probe_tf = None
        if child_time_left() > 150:
            probe_tf = worker_health_probe()
        # timed runs: best of 2 (4 on a degraded worker — each rep is
        # another chance at a fast window); keep any successful rep even
        # if the others crash
        ok = 0
        for rep in range(timed_rep_count(probe_tf)):
            try:
                t0 = time.perf_counter()
                with device_trace("elasticity3d_solve"):
                    x_hat, iters, relres = solver()
                rep_s = time.perf_counter() - t0
                log(f"[bench] timed solve[{rep}] ({kind}): {rep_s:.3f}s  "
                    f"iters={iters} relres={relres:.2e}")
                if not math.isfinite(relres) or relres > 1e-3:
                    log(f"[bench] timed rep diverged — not banking it")
                    continue
                ok += 1
                solve_s = min(solve_s, rep_s)
                emit(metric_line(solve_s, kind, iters, relres))
            except Exception as e:
                log(f"[bench] timed solve[{rep}] failed: "
                    f"{type(e).__name__}: {e}")
                rewarm_channel()
            if child_time_left() < 60:
                log("[bench] child budget nearly spent — skipping further reps")
                break
        if ok > 0:
            solver_used = kind
            break
    if solver_used is None:
        log("[bench] every solver path failed — no timed measurement "
            "(a provisional warm-up line may already be banked)")
        raise SystemExit(3)

    mdof = ndof * max(iters, 1) / solve_s / 1e6
    log(f"[bench] throughput: {mdof:.0f} MDOF/s across MG-PCG iterations")

    # SpMV roofline fraction (BASELINE.md north star: ≥60% of the HBM
    # roofline for the finest-level stencil apply).  Optional: the metric is
    # already banked above, so a wedge here can no longer void the record.
    spmv_frac = None
    if child_time_left() > 120:
        try:
            spmv_frac = _spmv_roofline(h, sysm, mesh)
        except Exception as e:
            log(f"[bench] roofline measurement skipped: {type(e).__name__}: {e}")

    # physics sanity + postprocess timing (excluded from the metric)
    if child_time_left() > 60:
        try:
            t0 = time.perf_counter()
            from pde_solver_tpu.ops import df32 as _df
            x_np = _df.df_to_f64(np.asarray(x_hat[0]), np.asarray(x_hat[1]))
            log(f"[bench] solution retrieval: {time.perf_counter() - t0:.1f}s")
            t0 = time.perf_counter()
            u = sysm.from_hat_x(x_np)
            vm_stress, _ = von_mises_fields(mesh, u, lam, mu)
            log(f"[bench] postprocess (host): {time.perf_counter() - t0:.1f}s  "
                f"max von Mises={float(vm_stress.max()):.3e} Pa")
        except Exception as e:  # never let postprocess void the measurement
            log(f"[bench] postprocess skipped: {type(e).__name__}: {e}")

    extra = {}
    if spmv_frac is not None:
        extra["spmv_roofline_frac"] = round(spmv_frac[0], 3)
        extra["spmv_streaming_frac"] = round(spmv_frac[1], 3)
    emit(metric_line(solve_s, solver_used, iters, relres, **extra))


def _spmv_roofline(h, sysm, mesh):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from pde_solver_tpu.ops.pallas_kernels import (CSFlatStencilOperator,
                                                   FlatStencilOperator)

    fine_w = h.levels[0].weights
    if not isinstance(fine_w, (FlatStencilOperator, CSFlatStencilOperator)):
        return None

    @partial(jax.jit, static_argnames=("reps",))
    def _chain(op, xf, reps):
        def body(_, xx):
            y = op.apply_flat(xx)
            return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))
        return jax.lax.fori_loop(0, reps, body, xf)

    xf = fine_w.to_flat(jnp.asarray(sysm.b_hat, jnp.float32))
    reps = 50
    float(jnp.sum(_chain(fine_w, xf, reps)[0, 0, 0]))  # compile+warm
    t0 = time.perf_counter()
    float(jnp.sum(_chain(fine_w, xf, reps)[0, 0, 0]))
    spmv_ms = (time.perf_counter() - t0) / reps * 1e3
    if isinstance(fine_w, CSFlatStencilOperator):
        # constant-interior kernel: weights ride as scalars; traffic is
        # masks + residual windows + x + y (the roofline fraction is then
        # compute-bound and mostly informational)
        traffic = (fine_w.masks.size * 4 + fine_w.Wwin.size
                   * fine_w.Wwin.dtype.itemsize
                   + 2 * 3 * mesh.num_nodes * 4)
    else:
        traffic = (fine_w.Wf.size * fine_w.Wf.dtype.itemsize
                   + 2 * 3 * mesh.num_nodes * 4)
    roof_ms = traffic / 819e9 * 1e3  # v5e nameplate HBM
    spmv_frac = roof_ms / spmv_ms
    # Honest achievable bound (BASELINE.md "Honest SpMV roofline"): blocked
    # 135-plane streaming on this part achieves ~332 GB/s (measured,
    # benchmarks/kernel_floor.py W-streaming-only), and the kernel runs at
    # ~97 % of that bound — the nameplate fraction is a statement about the
    # access pattern, not kernel inefficiency.
    stream_ms = traffic / 332e9 * 1e3
    stream_frac = stream_ms / spmv_ms
    log(f"[bench] finest SpMV: {spmv_ms:.3f} ms/apply, traffic "
        f"{traffic/1e6:.0f} MB, HBM roofline {roof_ms:.3f} ms → "
        f"{spmv_frac*100:.0f}% of nameplate, {stream_frac*100:.0f}% of the "
        f"measured 332 GB/s streaming bound")
    return spmv_frac, stream_frac


def run_child():
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin ignores JAX_PLATFORMS — forcing CPU needs the
        # config update too (tests/conftest.py note); without it the child
        # blocks minutes on tunnel init even for pure-CPU configs
        import jax
        jax.config.update("jax_platforms", "cpu")
    cfg_name = os.environ.get("PDE_BENCH_CONFIG", "elasticity3d")
    sub = {"heat3d": bench_heat3d, "heat1d": bench_heat1d,
           "bar1d": bench_bar1d, "heat2d_cn": bench_heat2d_cn,
           "elast2d": bench_elast2d, "spmv": bench_spmv}.get(cfg_name)
    if sub is not None:
        sub()
    else:
        bench_flagship()


def main():
    if (os.environ.get("PDE_BENCH_CHILD") == "1"
            or os.environ.get("PDE_BENCH_NO_WRAP") == "1"):
        run_child()
        return
    raise SystemExit(run_parent())


if __name__ == "__main__":
    main()
