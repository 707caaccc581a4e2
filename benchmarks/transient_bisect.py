"""Bisect the transient-scan slowdown: step-in-scan vs step-standalone.

transient_scanfirst.py showed the 128³ MG-PCG scan costs ~91 ms/iter while
the same mg_pcg standalone costs ~2-5 ms/iter (+~33 ms grid→flat entry) —
and the scan cost is invariant to the bf16-matmul probe (it measured the
same in an 81 TFLOP/s window and a 30 TFLOP/s one).  This script times, in
ONE process/window: (a) one jitted θ-step OUTSIDE lax.scan, (b) a 1-step
scan, (c) a 6-step scan, (d) the step with the inner solve removed — so
the gap gets pinned to scan-wrapping, the step body, or mg_pcg-in-step.
Run from /root/repo:  python benchmarks/transient_bisect.py [c]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(label, fn, reps=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:46s}: {ms:9.2f} ms", flush=True)
    return ms


def main():
    cells = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from pde_solver_tpu.mesh import box_mesh
    from pde_solver_tpu.ops import assembly, multigrid as mg
    from pde_solver_tpu.ops.bc import DirichletBC
    from pde_solver_tpu.ops.linsolve import prepare_system
    from pde_solver_tpu.ops import timestepping as ts

    print(f"backend={jax.default_backend()} cells={cells}³", flush=True)
    t0 = time.perf_counter()
    _ = float(jnp.zeros(()))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    dt = 0.01
    mesh = box_mesh(cells, cells, cells, (0, 0, 0), (1.0, 1.0, 1.0))
    K = assembly.assemble_scalar_stencil(mesh, "stiffness")
    M = assembly.assemble_scalar_stencil(mesh, "mass")
    bc = DirichletBC.from_masks([(mesh.boundary_mask(), 0.0)],
                                mesh.node_shape)
    A_np = ts._combine(K, M, alpha=dt, beta=1.0)
    B_np = ts._combine(K, M, alpha=0.0, beta=1.0)
    sysm = prepare_system(A_np, mesh, bc, np.zeros(mesh.node_shape), 1)

    def builder(mc):
        return (ts._combine(assembly.assemble_scalar_stencil(mc, "stiffness"),
                            assembly.assemble_scalar_stencil(mc, "mass"),
                            alpha=dt, beta=1.0),
                DirichletBC.from_masks([(mc.boundary_mask(), 0.0)],
                                       mc.node_shape))

    h = mg.build_hierarchy(mesh, sysm, builder, vdim=1, dtype=jnp.float32)
    h_struct, level_arrays = mg.hierarchy_struct(h)
    print(f"built ({len(h.levels)} levels)", flush=True)

    offsets, scaled, gvals = sysm.offsets, sysm.weights, sysm.gvals
    Ag_np = ts.np_stencil_apply(A_np, gvals, mesh.dim, 1)
    free_np = np.asarray(bc.free_mask, dtype=np.float64)
    B_list = [np.asarray(B_np.get(o, np.zeros_like(scaled[i])), np.float64)
              for i, o in enumerate(offsets)]
    args = dict(
        offsets=offsets,
        A32=tuple(jnp.asarray(W, jnp.float32) for W in scaled),
        A64=None,
        B_w=tuple(jnp.asarray(W, jnp.float32) for W in B_list),
        free=jnp.asarray(free_np, jnp.float32),
        g=jnp.asarray(gvals, jnp.float32),
        s=jnp.asarray(sysm.s, jnp.float32), Ct=None, CinvT=None,
        b_src=jnp.zeros(mesh.node_shape, jnp.float32),
        Ag=jnp.asarray(Ag_np, jnp.float32),
        inner_tol=1e-6, maxiter=2000, refine=0, grid_dim=mesh.dim, vdim=1,
        mode="f32", h_struct=h_struct, level_arrays=level_arrays)
    u0 = jnp.asarray(bc.apply_values(jnp.full(mesh.node_shape, 20.0)),
                     jnp.float32)
    carry0 = (u0, jnp.asarray(0, jnp.int32), jnp.asarray(0.0, jnp.float32))

    @partial(jax.jit, static_argnames=("offsets", "maxiter", "refine",
                                       "grid_dim", "vdim", "mode",
                                       "h_struct"))
    def one_step(offsets, A32, A64, B_w, free, g, s, Ct, CinvT, b_src, Ag,
                 inner_tol, maxiter, refine, grid_dim, vdim, mode, h_struct,
                 level_arrays, carry):
        c2, u = ts._transient_step_body(
            offsets, A32, A64, B_w, free, g, s, Ct, CinvT, b_src, Ag,
            inner_tol, maxiter, refine, grid_dim, vdim, mode, h_struct,
            level_arrays, carry)
        return c2

    def run_one():
        c = one_step(carry=carry0, **args)
        return float(c[2])  # scalar pull = sync

    timeit("one step, jitted standalone", run_one)

    @partial(jax.jit, static_argnames=("offsets", "maxiter", "refine",
                                       "grid_dim", "vdim", "mode",
                                       "h_struct", "nsteps"))
    def scan_n(offsets, A32, A64, B_w, free, g, s, Ct, CinvT, b_src, Ag,
               inner_tol, maxiter, refine, grid_dim, vdim, mode, h_struct,
               level_arrays, carry, nsteps):
        def step(c, _):
            c2, u = ts._transient_step_body(
                offsets, A32, A64, B_w, free, g, s, Ct, CinvT, b_src, Ag,
                inner_tol, maxiter, refine, grid_dim, vdim, mode, h_struct,
                level_arrays, c)
            return c2, u

        c, snaps = jax.lax.scan(step, carry, None, length=nsteps)
        return c

    def run_scan(n):
        c = scan_n(carry=carry0, nsteps=n, **args)
        return float(c[2])

    t1 = timeit("1-step lax.scan", lambda: run_scan(1))
    t6 = timeit("6-step lax.scan", lambda: run_scan(6))
    print(f"  -> marginal per scan step: {(t6 - t1) / 5.0:.1f} ms",
          flush=True)

    # step body with the inner solve stubbed out (identity "solve"):
    # isolates B-apply + scaling + masking cost
    @partial(jax.jit, static_argnames=("offsets", "grid_dim", "vdim"))
    def step_nosolve(offsets, B_w, free, g, s, b_src, Ag, grid_dim, vdim, u):
        rhs = ts._stencil_apply(offsets, B_w, u, grid_dim, vdim)
        bt = free * (rhs - Ag) + g
        b_hat = bt * s
        return jnp.max(jnp.abs(b_hat))

    def run_nosolve():
        return float(step_nosolve(args["offsets"], args["B_w"], args["free"],
                                  args["g"], args["s"], args["b_src"],
                                  args["Ag"], mesh.dim, 1, u0))

    timeit("step minus inner solve (B+scale+mask)", run_nosolve)


if __name__ == "__main__":
    main()
