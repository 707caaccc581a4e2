"""Scan-FIRST control for transient_profile.py.

transient_profile measured components fast (V-cycle 5 ms, mg_pcg slope
2.2 ms/iter) but the 6-step scan at 162 ms/iter — 20× the component sum —
AFTER ~30 compile/measure rounds.  The tunneled v5e degrades under
sustained load (CLAUDE.md), so this script runs ONLY the scan, first
thing, bracketed by bf16-matmul health probes.  If the scan is fast here,
the xl 1.82 steps/s record is a degraded-worker artifact, not a code cost.
Run from /root/repo:  python benchmarks/transient_scanfirst.py [c]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def probe_tflops():
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def chain(a):
        def body(_, x):
            y = x @ x
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30).astype(x.dtype)
        return jax.lax.fori_loop(0, 8, body, a)

    _ = float(jnp.max(jnp.abs(chain(a))))
    t0 = time.perf_counter()
    _ = float(jnp.max(jnp.abs(chain(a))))
    dt = time.perf_counter() - t0
    return 8 * 2 * n**3 / dt / 1e12


def main():
    cells = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from pde_solver_tpu.mesh import box_mesh
    from pde_solver_tpu.ops import assembly
    from pde_solver_tpu.ops.bc import DirichletBC
    from pde_solver_tpu.ops.timestepping import run_transient
    from pde_solver_tpu.config import config_overrides

    print(f"backend={jax.default_backend()} cells={cells}³", flush=True)
    t0 = time.perf_counter()
    _ = float(jnp.zeros(()))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)
    print(f"probe before: {probe_tflops():.0f} TFLOP/s", flush=True)

    dt = 0.01
    mesh = box_mesh(cells, cells, cells, (0, 0, 0), (1.0, 1.0, 1.0))
    K = assembly.assemble_scalar_stencil(mesh, "stiffness")
    M = assembly.assemble_scalar_stencil(mesh, "mass")
    bc = DirichletBC.from_masks([(mesh.boundary_mask(), 0.0)],
                                mesh.node_shape)
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
    print(f"scan warm-up (incl. compile+hierarchy): {res.scan_seconds:.2f}s "
          f"({res.total_cg_iterations} iters)", flush=True)
    for rep in range(3):
        res = run6()
        per_step = res.scan_seconds / 6.0 * 1e3
        per_iter = res.scan_seconds / max(res.total_cg_iterations, 1) * 1e3
        print(f"scan[{rep}]: {res.scan_seconds:.2f}s = {per_step:.1f} ms/step"
              f", {res.total_cg_iterations} iters = {per_iter:.1f} ms/iter, "
              f"relres {res.max_relative_residual:.1e}", flush=True)
    print(f"probe after: {probe_tflops():.0f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
