"""A/B the constant-interior (CS) Pallas operator on SCALAR heat transients.

BENCH_NOTES "CS decision": at the elasticity flagship the CS fold needs
11.9 effective sweeps and loses to the streamed-bf16 smoother, but the
scalar-heat stencil folds to ~3-4 effective sweeps (1 interior sweep +
8 sparse face classes), where the same marginal-sweep arithmetic
(~23 us/sweep) predicts ~0.8x the dense f32 apply.  This script measures
the real thing end-to-end: 3D heat backward-Euler stepping through
``heat.solve_heat_problem`` with PDE_TPU_CS toggled in-process (the MG
cache key carries the routing, so hierarchies cannot alias).

Run on the real chip from /root/repo (no PYTHONPATH):
    python benchmarks/cs_scalar_ab.py            # 128^3 xl + 64^3 full
    PDE_CSAB_CELLS=128 python benchmarks/cs_scalar_ab.py

One process for everything (fresh processes risk restart-window warmups).
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")  # run from /root/repo (no PYTHONPATH on TPU)


def main():
    import jax.numpy as jnp

    from pde_solver_tpu.mesh import box_mesh
    from pde_solver_tpu.models import heat

    # channel warmup before any timing
    t0 = time.perf_counter()
    float(jnp.zeros(()))
    print(f"[csab] channel warmup {time.perf_counter() - t0:.1f}s", flush=True)

    cells_list = [int(c) for c in
                  os.environ.get("PDE_CSAB_CELLS", "128,64").split(",")]
    num_steps = 50
    results = {}
    for cells in cells_list:
        mesh = box_mesh(cells, cells, cells, (0, 0, 0), (1.0, 1.0, 1.0))
        p = heat.HeatProblem(
            mesh=mesh, diffusivity=1.0,
            bc_builder=lambda m: [(m.boundary_mask(), 0.0)],
            T_initial=20.0, dt=0.01, num_steps=num_steps)
        for mode in ("0", "1"):
            os.environ["PDE_TPU_CS"] = mode
            tag = f"{cells}^3 cs={mode}"
            t0 = time.perf_counter()
            _, _, info = heat.solve_heat_problem(p)  # warm-up + compile
            warm = time.perf_counter() - t0
            print(f"[csab] {tag} warmup {warm:.1f}s "
                  f"scan={info.get('scan_seconds'):.3f}s "
                  f"iters={info['cg_iterations']} "
                  f"relres={info['relative_residual']:.2e}", flush=True)
            scans = []
            for rep in range(3):
                _, _, info = heat.solve_heat_problem(p)
                scans.append(info.get("scan_seconds")
                             or info["solve_seconds"])
                print(f"[csab] {tag} rep{rep} scan={scans[-1]:.3f}s "
                      f"setup={info.get('setup_seconds', 0.0):.2f}s "
                      f"iters={info['cg_iterations']}", flush=True)
            results[tag] = {"best_scan_s": min(scans),
                            "steps_per_s": num_steps / min(scans),
                            "iters": info["cg_iterations"],
                            "relres": info["relative_residual"]}
    os.environ["PDE_TPU_CS"] = "0"
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
