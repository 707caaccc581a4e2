#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md config 5): 3D static elasticity on a
1 m × 0.2 m × 0.2 m cantilever under gravity at ~2M DOF — wall time of the
PCG solve (mixed-precision MG-PCG with f64 refinement) on one TPU chip.
Target < 5 s → ``vs_baseline`` = target_seconds / measured_seconds
(>1 beats the target).

Methodology: the axon-tunneled TPU charges minutes of warmup to the first
device→host transfer and tens of seconds to XLA compiles; both are one-time
session costs, not solver throughput.  The bench therefore (1) warms the
transfer channel, (2) runs the full solve once to populate jit caches and
device-resident operators, then (3) times a fresh solve (from x=0) of the
same system.  Assembly/upload/postprocess times are reported on stderr.

Secondary metrics via PDE_BENCH_CONFIG:
  heat3d     backward-Euler steps/s, 3D heat 64³ cells (275k DOF)
  heat1d     BASELINE config 1: 1D rod 256 nodes, BE steps/s
  bar1d      BASELINE config 2: 1D bar static solve wall time
  heat2d_cn  BASELINE config 3: 2D 128² plate, Crank–Nicolson steps/s
  elast2d    BASELINE config 4: 2D plane stress, solve wall time / MDOF/s
  spmv       finest-level stencil SpMV ms + HBM roofline fraction

Env knobs: PDE_BENCH_SCALE=small|medium|full|xl (default full on TPU;
xl = 128³ heat3d, crosses the transient-MG threshold),
PDE_BENCH_CONFIG (above), PDE_TPU_TRACE_DIR (capture a jax.profiler trace
around the timed flagship solve).
"""

import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


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
    num_steps = 50 if scale != "xl" else 20
    t0 = time.perf_counter()
    _ = float(jnp.zeros(()))
    log(f"[bench] warmup: {time.perf_counter() - t0:.1f}s")

    mesh = box_mesh(cells, cells, cells, (0, 0, 0), (1.0, 1.0, 1.0))
    log(f"[bench] heat3d transient: {cells}³ cells, {mesh.num_nodes} DOF, "
        f"{num_steps} backward-Euler steps")
    p = heat.HeatProblem(
        mesh=mesh, diffusivity=1.0,
        bc_builder=lambda m: [(m.boundary_mask(), 0.0)],
        T_initial=20.0, dt=0.01, num_steps=num_steps)

    t0 = time.perf_counter()
    _, _, info = heat.solve_heat_problem(p)
    log(f"[bench] warm-up run (incl. compile): {time.perf_counter() - t0:.1f}s "
        f"iters={info['cg_iterations']} relres={info['relative_residual']:.1e}")
    # best of 2: the tunneled worker shows sporadic slowdown states that
    # inflate long scans 2-5× (see BENCH_NOTES "chip-health caveat");
    # the faster of two post-compile runs is the honest device capability.
    scans = []
    for rep in range(2):
        t0 = time.perf_counter()
        times, values, info = heat.solve_heat_problem(p)
        total = time.perf_counter() - t0
        scan_s = info.get("scan_seconds") or info["solve_seconds"]
        scans.append(scan_s)
        log(f"[bench] timed[{rep}]: total={total:.2f}s scan={scan_s:.2f}s "
            f"setup={info.get('setup_seconds', 0.0):.2f}s "
            f"(CG iters total {info['cg_iterations']}, "
            f"relres {info['relative_residual']:.1e})")
    steps_s = num_steps / min(scans)
    log(f"[bench] → {steps_s:.1f} steps/s (best of {len(scans)})")
    print(json.dumps({
        "metric": f"heat3d_{cells}cubed_backward_euler_steps_per_s",
        "value": round(steps_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_s / 10.0, 3),  # ref-class: ~10 PETSc solves/s
    }))


def bench_heat1d():
    """BASELINE config 1: 2 m rod, 256 nodes, 20→0 °C, backward Euler."""
    import jax.numpy as jnp
    from pde_solver_tpu.mesh import interval_mesh
    from pde_solver_tpu.models import heat

    _ = float(jnp.zeros(()))
    num_steps = 400
    p = heat.HeatProblem(
        mesh=interval_mesh(255, 0.0, 2.0), diffusivity=1.0,
        bc_builder=lambda m: [(m.face_mask(0, 0), 20.0),
                              (m.face_mask(0, 1), 0.0)],
        T_initial=0.0, dt=0.05, num_steps=num_steps)
    heat.solve_heat_problem(p)  # compile
    t0 = time.perf_counter()
    _, values, info = heat.solve_heat_problem(p)
    steps_s = num_steps / (info.get("scan_seconds") or info["solve_seconds"])
    x = np.linspace(0.0, 2.0, 256)
    err = float(np.linalg.norm(values[-1] - 20.0 * (1 - x / 2.0))
                / np.linalg.norm(20.0 * (1 - x / 2.0)))
    log(f"[bench] heat1d: {steps_s:.0f} steps/s, steady-limit relL2={err:.1e}")
    print(json.dumps({
        "metric": "heat1d_256nodes_backward_euler_steps_per_s",
        "value": round(steps_s, 1), "unit": "steps/s",
        "vs_baseline": round(steps_s / 100.0, 3),  # ref-class: ~100 solves/s
    }))


def bench_bar1d():
    """BASELINE config 2: 2 m aluminum bar, fixed-free, static KU=F."""
    import jax.numpy as jnp
    from pde_solver_tpu.models.elasticity import solve_bar_1d

    _ = float(jnp.zeros(()))
    solve_bar_1d(2.0, 255, 70e9, 0.01, 500.0)  # compile/warm caches
    ms = np.inf  # best of 3: the 1-core host competes with the TPU
    for _rep in range(3):  # client's background threads (2 ms pure-CPU)
        t0 = time.perf_counter()
        x, field, info = solve_bar_1d(2.0, 255, 70e9, 0.01, 500.0)
        ms = min(ms, (time.perf_counter() - t0) * 1e3)
    exact = 500.0 * (2.0 - x) / 0.01
    err = float(np.abs(field[10:-10] - exact[10:-10]).max() / exact.max())
    log(f"[bench] bar1d: {ms:.1f} ms/solve, interior stress err={err:.1e}")
    print(json.dumps({
        "metric": "bar1d_256nodes_static_solve_ms",
        "value": round(ms, 2), "unit": "ms",
        "vs_baseline": round(20.0 / ms, 3),  # ref-class LU+overhead ~20 ms
    }))


def bench_heat2d_cn():
    """BASELINE config 3: 1 m² plate, 128² mesh, Crank–Nicolson stepping."""
    import jax.numpy as jnp
    from pde_solver_tpu.mesh import rectangle_mesh
    from pde_solver_tpu.models import heat

    _ = float(jnp.zeros(()))
    num_steps = 50
    p = heat.HeatProblem(
        mesh=rectangle_mesh(128, 128, (0.0, 0.0), (1.0, 1.0)),
        diffusivity=1.0, bc_builder=lambda m: [(m.boundary_mask(), 0.0)],
        T_initial=20.0, dt=0.001, num_steps=num_steps, theta=0.5)
    heat.solve_heat_problem(p)  # compile
    _, values, info = heat.solve_heat_problem(p)
    steps_s = num_steps / (info.get("scan_seconds") or info["solve_seconds"])
    log(f"[bench] heat2d CN: {steps_s:.1f} steps/s "
        f"(iters {info['cg_iterations']}, relres {info['relative_residual']:.1e})")
    print(json.dumps({
        "metric": "heat2d_128sq_crank_nicolson_steps_per_s",
        "value": round(steps_s, 2), "unit": "steps/s",
        "vs_baseline": round(steps_s / 20.0, 3),  # ref-class: ~20 solves/s
    }))


def bench_elast2d():
    """BASELINE config 4: 1 m² steel plate, plane stress, clamped + load."""
    import jax.numpy as jnp
    from pde_solver_tpu.mesh import rectangle_mesh
    from pde_solver_tpu.models.elasticity import solve_elasticity_nd

    _ = float(jnp.zeros(()))
    mesh = rectangle_mesh(256, 256, (0.0, 0.0), (1.0, 1.0))
    body = np.array([0.0, -7.65e4])
    solve_elasticity_nd(mesh, 210e9, 0.3, body, "plane_stress")  # compile
    _, info = solve_elasticity_nd(mesh, 210e9, 0.3, body, "plane_stress")
    ms = info["solve_seconds"] * 1e3
    mdof = info["num_dofs"] * max(info["cg_iterations"], 1) / info["solve_seconds"] / 1e6
    log(f"[bench] elast2d 256²: {ms:.0f} ms/solve, {mdof:.0f} MDOF/s, "
        f"relres {info['relative_residual']:.1e}")
    print(json.dumps({
        "metric": "elasticity2d_256sq_plane_stress_solve_ms",
        "value": round(ms, 1), "unit": "ms",
        "vs_baseline": round(2000.0 / ms, 3),  # ref-class sparse LU ~2 s
    }))


def bench_spmv():
    """Finest-level stencil SpMV: ms/apply + HBM roofline fraction."""
    import subprocess
    scale = os.environ.get("PDE_BENCH_SCALE", "full")
    cells = {"small": "32 16 16", "medium": "96 32 32",
             "full": "160 64 64"}[scale]
    out = subprocess.run(
        [sys.executable, "benchmarks/spmv_bench.py", *cells.split(), "50"],
        capture_output=True, text=True)
    log(out.stdout + out.stderr)


def main():
    cfg_name = os.environ.get("PDE_BENCH_CONFIG", "elasticity3d")
    sub = {"heat3d": bench_heat3d, "heat1d": bench_heat1d,
           "bar1d": bench_bar1d, "heat2d_cn": bench_heat2d_cn,
           "elast2d": bench_elast2d, "spmv": bench_spmv}.get(cfg_name)
    if sub is not None:
        sub()
        return
    import jax
    import jax.numpy as jnp

    from pde_solver_tpu.config import get_config
    from pde_solver_tpu.mesh import box_mesh
    from pde_solver_tpu.models.elasticity import lame_parameters, von_mises_fields
    from pde_solver_tpu.ops import assembly, multigrid as mg
    from pde_solver_tpu.ops.bc import DirichletBC
    from pde_solver_tpu.ops.linsolve import np_stencil_apply, prepare_system

    backend = jax.default_backend()
    scale = os.environ.get("PDE_BENCH_SCALE",
                           "full" if backend == "tpu" else "small")
    cells = {"small": (32, 16, 16), "medium": (96, 32, 32),
             "full": (160, 64, 64)}[scale]
    log(f"[bench] backend={backend} scale={scale} cells={cells}")

    t0 = time.perf_counter()
    _ = float(jnp.zeros(()))  # warm the device→host channel (minutes, one-time)
    log(f"[bench] transfer-channel warmup: {time.perf_counter() - t0:.1f}s")

    E, nu = 210e9, 0.3
    lam, mu = lame_parameters(E, nu, "3d")
    mesh = box_mesh(*cells, (0, 0, 0), (1.0, 0.2, 0.2))
    ndof = mesh.num_nodes * 3
    log(f"[bench] nodes={mesh.num_nodes} DOF={ndof}")

    t0 = time.perf_counter()
    K = assembly.assemble_elasticity_stencil(mesh, lam, mu)
    b = assembly.assemble_vector_load(mesh, np.array([0.0, 0.0, -9.81 * 7800.0]))
    bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 0.0)],
                                mesh.node_shape, vdim=3)
    log(f"[bench] assembly: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    sysm = prepare_system(K, mesh, bc, b, 3)
    log(f"[bench] prepare (mask+block-scale): {time.perf_counter() - t0:.1f}s")

    def builder(mc):
        return (assembly.assemble_elasticity_stencil(mc, lam, mu),
                DirichletBC.from_masks([(mc.face_mask(0, 0), 0.0)],
                                       mc.node_shape, vdim=3))

    t0 = time.perf_counter()
    h = mg.build_hierarchy(mesh, sysm, builder, vdim=3, dtype=jnp.float32)
    log(f"[bench] hierarchy build+upload ({len(h.levels)} levels): "
        f"{time.perf_counter() - t0:.1f}s")

    cfg = get_config()
    t0 = time.perf_counter()
    ladder = mg.build_df_ladder(h, sysm, sysm.b_hat)
    jax.block_until_ready(ladder.Whi)
    log(f"[bench] double-f32 ladder upload: {time.perf_counter() - t0:.1f}s")

    bench_tol = float(os.environ.get("PDE_BENCH_TOL", 1e-7))
    solver_kind = os.environ.get("PDE_BENCH_SOLVER", "df2")

    def full_solve():
        """Double-float32 F-cycle (Pallas-applied fine levels): per-round
        fused df2 (ONE program + ONE scalar pull per round) by default;
        stall detection stops at the df32 floor.  tol 1e-7 covers the ≤1e-6
        L2-vs-FEniCS target with margin (measured floor ≈5e-8)."""
        fcycle = (mg.solve_fcycle_df2 if solver_kind == "df2"
                  else mg.solve_fcycle_df)
        x_hi, x_lo, iters, relres = fcycle(
            h, ladder, bench_tol, inner_iters=14, max_rounds=12)
        return (x_hi, x_lo), iters, relres

    t0 = time.perf_counter()
    x_hat, iters, relres = full_solve()
    log(f"[bench] warm-up solve (incl. jit compile): "
        f"{time.perf_counter() - t0:.1f}s  iters={iters} relres={relres:.2e}")

    from pde_solver_tpu.utils.observability import device_trace
    # best of 2 (see BENCH_NOTES chip-health caveat: the tunneled worker
    # has sporadic slowdown states; the faster run is the device capability)
    solve_s = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        with device_trace("elasticity3d_solve"):
            x_hat, iters, relres = full_solve()
        rep_s = time.perf_counter() - t0
        log(f"[bench] timed solve[{rep}]: {rep_s:.3f}s  MG-PCG iters={iters} "
            f"relres={relres:.2e}")
        solve_s = min(solve_s, rep_s)
    mdof = ndof * max(iters, 1) / solve_s / 1e6
    log(f"[bench] throughput: {mdof:.0f} MDOF/s across MG-PCG iterations")

    # SpMV roofline fraction (BASELINE.md north star: ≥60% of the HBM
    # roofline for the finest-level stencil apply).
    spmv_frac = None
    from pde_solver_tpu.ops.pallas_kernels import FlatStencilOperator
    fine_w = h.levels[0].weights
    if isinstance(fine_w, FlatStencilOperator):
        import jax as _jax
        from functools import partial as _partial

        @_partial(_jax.jit, static_argnames=("reps",))
        def _chain(op, xf, reps):
            def body(_, xx):
                y = op.apply_flat(xx)
                return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))
            return _jax.lax.fori_loop(0, reps, body, xf)

        xf = fine_w.to_flat(jnp.asarray(sysm.b_hat, jnp.float32))
        reps = 50
        float(jnp.sum(_chain(fine_w, xf, reps)[0, 0, 0]))  # compile+warm
        t0 = time.perf_counter()
        float(jnp.sum(_chain(fine_w, xf, reps)[0, 0, 0]))
        spmv_ms = (time.perf_counter() - t0) / reps * 1e3
        traffic = (fine_w.Wf.size * fine_w.Wf.dtype.itemsize
                   + 2 * 3 * mesh.num_nodes * 4)
        roof_ms = traffic / 819e9 * 1e3  # v5e HBM
        spmv_frac = roof_ms / spmv_ms
        log(f"[bench] finest SpMV: {spmv_ms:.3f} ms/apply, traffic "
            f"{traffic/1e6:.0f} MB, HBM roofline {roof_ms:.3f} ms → "
            f"{spmv_frac*100:.0f}% of roofline")

    # physics sanity + postprocess timing (excluded from the metric)
    t0 = time.perf_counter()
    from pde_solver_tpu.ops import df32 as _df
    x_np = _df.df_to_f64(np.asarray(x_hat[0]), np.asarray(x_hat[1]))
    log(f"[bench] solution retrieval: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    u = sysm.from_hat_x(x_np)
    vm_stress, _ = von_mises_fields(mesh, u, lam, mu)
    log(f"[bench] postprocess (host): {time.perf_counter() - t0:.1f}s  "
        f"max von Mises={float(vm_stress.max()):.3e} Pa")

    target_seconds = 5.0
    out = {
        "metric": "elasticity3d_cantilever_2MDOF_solve_seconds",
        "value": round(solve_s, 3),
        "unit": "s",
        "vs_baseline": round(target_seconds / solve_s, 3),
    }
    if spmv_frac is not None:
        out["spmv_roofline_frac"] = round(spmv_frac, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
