"""Per-component timing of the transient MG-PCG step at large DOF.

Decomposes the xl (128³ = 2.1M DOF) heat3d step cost: fine SpMV, one
V-cycle, one preconditioned CG iteration, and the full θ-step inside the
scan — so the 64³→128³ scaling anomaly (8.9 → ~90 ms/iter, ~10× the
static elasticity V-cycle at the same DOF) gets attributed to a specific
stage.  Run from /root/repo:  python benchmarks/transient_profile.py [c]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(y):
    return float(jnp.max(jnp.abs(y)))


def timeit(label, fn, reps=3):
    fn()  # compile+warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:44s}: {ms:9.2f} ms", flush=True)
    return ms


def main():
    cells = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from pde_solver_tpu.mesh import box_mesh
    from pde_solver_tpu.ops import assembly, multigrid as mg
    from pde_solver_tpu.ops.bc import DirichletBC
    from pde_solver_tpu.ops.linsolve import prepare_system
    from pde_solver_tpu.ops.timestepping import _combine, run_transient
    from pde_solver_tpu.config import config_overrides

    print(f"backend={jax.default_backend()} cells={cells}³", flush=True)
    t0 = time.perf_counter()
    _ = float(jnp.zeros(()))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    dt = 0.01
    mesh = box_mesh(cells, cells, cells, (0, 0, 0), (1.0, 1.0, 1.0))
    print(f"nodes={mesh.num_nodes}", flush=True)
    K = assembly.assemble_scalar_stencil(mesh, "stiffness")
    M = assembly.assemble_scalar_stencil(mesh, "mass")
    bc = DirichletBC.from_masks([(mesh.boundary_mask(), 0.0)],
                                mesh.node_shape)
    A_np = _combine(K, M, alpha=dt, beta=1.0)  # backward Euler, theta=1
    t0 = time.perf_counter()
    sysm = prepare_system(A_np, mesh, bc, np.zeros(mesh.node_shape), 1)
    print(f"prepare {time.perf_counter() - t0:.1f}s", flush=True)

    def mg_builder(mc):
        return (_combine(assembly.assemble_scalar_stencil(mc, "stiffness"),
                         assembly.assemble_scalar_stencil(mc, "mass"),
                         alpha=dt, beta=1.0),
                DirichletBC.from_masks([(mc.boundary_mask(), 0.0)],
                                       mc.node_shape))

    t0 = time.perf_counter()
    h = mg.build_hierarchy(mesh, sysm, mg_builder, vdim=1, dtype=jnp.float32)
    print(f"hierarchy {time.perf_counter() - t0:.1f}s "
          f"({len(h.levels)} levels)", flush=True)
    h_struct, level_arrays = mg.hierarchy_struct(h)

    lv = h.levels[0]
    flat = mg._is_flat_op(lv.weights)
    print(f"finest level flat/Pallas: {flat}", flush=True)
    rng = np.random.default_rng(0)
    r_grid = jnp.asarray(rng.standard_normal(mesh.node_shape),
                         dtype=jnp.float32)

    # --- fine SpMV + layout conversions, chained ------------------------
    if flat:
        op = lv.weights
        rf = op.to_flat(r_grid)

        @partial(jax.jit, static_argnames=("reps",))
        def chain_spmv(x, reps):
            def body(_, xx):
                y = op.apply_flat(xx)
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, reps, body, x)

        ms = timeit("fine SpMV flat (20 chained)",
                    lambda: sync(chain_spmv(rf, 20)))
        print(f"  -> per apply: {ms / 20:.2f} ms", flush=True)

        conv_rt = jax.jit(lambda x: op.to_flat(op.from_flat(x)))
        timeit("grid<->flat round trip", lambda: sync(conv_rt(rf)))
    else:
        rf = r_grid

    # --- one V-cycle, chained -------------------------------------------
    @partial(jax.jit, static_argnames=("hs", "reps"))
    def chain_vc(hs, arrs, x, reps):
        hh = mg.hierarchy_from_arrays(hs, arrs)
        fio = mg._is_flat_op(hh.levels[0].weights)

        def body(_, xx):
            z = mg.v_cycle(hh, xx, flat_io=fio)
            return z / jnp.maximum(jnp.max(jnp.abs(z)), 1e-30)
        return jax.lax.fori_loop(0, reps, body, x)

    ms = timeit("V-cycle (10 chained)",
                lambda: sync(chain_vc(h_struct, level_arrays, rf, 10)))
    print(f"  -> per V-cycle: {ms / 10:.2f} ms", flush=True)

    # --- mg_pcg fixed-iteration solves (the per-step inner solve) -------
    @partial(jax.jit, static_argnames=("hs", "iters"))
    def pcg_n(hs, arrs, bb, iters):
        hh = mg.hierarchy_from_arrays(hs, arrs)
        _, _, relres = mg.mg_pcg(hh, bb, jnp.zeros_like(bb), 0.0, iters,
                                 resync_every=0)
        return relres

    t2 = timeit("mg_pcg 2 iters",
                lambda: float(pcg_n(h_struct, level_arrays, r_grid, 2)))
    t8 = timeit("mg_pcg 8 iters",
                lambda: float(pcg_n(h_struct, level_arrays, r_grid, 8)))
    print(f"  -> per PCG iteration (slope): {(t8 - t2) / 6.0:.2f} ms",
          flush=True)

    # --- full transient step (6-step scan through run_transient) --------
    u0 = np.asarray(bc.apply_values(jnp.full(mesh.node_shape, 20.0)),
                    dtype=np.float64)

    def run6():
        with config_overrides(transient_mg_threshold=100, mg_threshold=100,
                              transient_checkpoint_every=0):
            return run_transient(
                K, M, mesh, bc, np.zeros(mesh.node_shape), u0,
                dt=dt, num_steps=6,
                mg_level_builder=lambda mc: (
                    assembly.assemble_scalar_stencil(mc, "stiffness"),
                    assembly.assemble_scalar_stencil(mc, "mass"),
                    DirichletBC.from_masks([(mc.boundary_mask(), 0.0)],
                                           mc.node_shape)))

    res = run6()
    print(f"scan warm-up: {res.scan_seconds:.2f}s "
          f"({res.total_cg_iterations} iters)", flush=True)
    res = run6()
    per_step = res.scan_seconds / 6.0 * 1e3
    per_iter = res.scan_seconds / max(res.total_cg_iterations, 1) * 1e3
    print(f"scan: {res.scan_seconds:.2f}s over 6 steps = {per_step:.1f} "
          f"ms/step, {res.total_cg_iterations} iters = {per_iter:.1f} "
          f"ms/iter, relres {res.max_relative_residual:.1e}", flush=True)


if __name__ == "__main__":
    main()
