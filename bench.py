#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md config 5): 3D static elasticity on a
1 m × 0.2 m × 0.2 m cantilever under gravity at ~2M DOF, PCG solve wall
time on one TPU chip.  Target: < 5 s → ``vs_baseline`` is
``target_seconds / measured_seconds`` (>1 beats the target).

Supplementary metrics (stderr): CG iterations, achieved residual, MDOF/s
processed by the SpMV (DOF × iterations / solve time), SpMV effective
bandwidth vs the HBM roofline, and the smaller BASELINE configs.

Env knobs: PDE_BENCH_SCALE=small|full (default full on TPU, small on CPU).
"""

import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def bench_elasticity_3d(cells, repeat_solve: bool = False):
    import jax
    import jax.numpy as jnp

    from pde_solver_tpu.config import set_config
    from pde_solver_tpu.mesh import box_mesh
    from pde_solver_tpu.models.elasticity import solve_elasticity_nd

    nxc, nyc, nzc = cells
    mesh = box_mesh(nxc, nyc, nzc, (0, 0, 0), (1.0, 0.2, 0.2))
    ndof = mesh.num_nodes * 3
    log(f"[bench] 3D elasticity cantilever: cells={cells}, "
        f"nodes={mesh.num_nodes}, DOF={ndof}")

    body = np.array([0.0, 0.0, -9.81 * 7800.0])
    t0 = time.perf_counter()
    vm, info = solve_elasticity_nd(mesh, 210e9, 0.3, body, "3d", "stress")
    t1 = time.perf_counter()
    log(f"[bench] total={t1 - t0:.2f}s  assembly={info['assembly_seconds']:.2f}s "
        f"solve={info['solve_seconds']:.2f}s post={info['postprocess_seconds']:.2f}s "
        f"iters={info['cg_iterations']} relres={info['relative_residual']:.2e} "
        f"converged={info['converged']}")
    solve_s = info["solve_seconds"]
    iters = max(info["cg_iterations"], 1)
    mdof_s = ndof * iters / solve_s / 1e6
    log(f"[bench] CG throughput: {mdof_s:.0f} MDOF/s "
        f"({solve_s / iters * 1e3:.2f} ms/iteration)")
    return {
        "ndof": ndof,
        "solve_seconds": solve_s,
        "iterations": info["cg_iterations"],
        "relative_residual": info["relative_residual"],
        "converged": info["converged"],
        "mdof_per_s": mdof_s,
        "vm_max": float(np.max(vm)),
    }


def main():
    import jax

    backend = jax.default_backend()
    scale = os.environ.get("PDE_BENCH_SCALE",
                           "full" if backend == "tpu" else "small")
    log(f"[bench] backend={backend} scale={scale}")

    if scale == "full":
        cells = (160, 64, 64)   # 161×65×65 nodes × 3 ≈ 2.04M DOF
    else:
        cells = (32, 12, 12)

    res = bench_elasticity_3d(cells)

    target_seconds = 5.0
    print(json.dumps({
        "metric": "elasticity3d_cantilever_2MDOF_solve_seconds",
        "value": round(res["solve_seconds"], 3),
        "unit": "s",
        "vs_baseline": round(target_seconds / res["solve_seconds"], 3),
    }))


if __name__ == "__main__":
    main()
