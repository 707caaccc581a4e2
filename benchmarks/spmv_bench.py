"""SpMV micro-benchmark on the real TPU: dense-XLA vs Pallas flat kernels.

Times the scaled elasticity stencil apply at bench shapes with proper
synchronization (the axon tunnel's block_until_ready is a no-op — only
scalar pulls synchronize; see CLAUDE.md).  Run from /root/repo:

    python benchmarks/spmv_bench.py [cells_x cells_y cells_z] [reps]

Prints ms/apply and the HBM-roofline fraction for each variant.
"""

import os
import sys
import time
from functools import partial

import numpy as np

# Script-dir import fix (PYTHONPATH must stay unset on the axon TPU image).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync_scalar(x):
    return float(jnp.sum(x[..., :1, :1]))


@partial(jax.jit, static_argnames=("offsets", "grid_dim", "vdim", "reps"))
def _xla_chain(offsets, weights, x, grid_dim, vdim, reps):
    from pde_solver_tpu.ops.linsolve import _stencil_apply

    def body(_, x):
        y = _stencil_apply(offsets, weights, x, grid_dim, vdim)
        return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))

    return jax.lax.fori_loop(0, reps, body, x)


@partial(jax.jit, static_argnames=("reps",))
def _pallas_chain(op, x_flat, reps):
    def body(_, x):
        y = op.apply_flat(x)
        return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))

    return jax.lax.fori_loop(0, reps, body, x_flat)


@partial(jax.jit, static_argnames=("reps",))
def _pallas_grid_chain(op, x_grid, reps):
    """apply() on grid-layout vectors — includes the to_flat/from_flat
    layout conversions the MG code pays per apply."""
    def body(_, x):
        y = op.apply(x)
        return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))

    return jax.lax.fori_loop(0, reps, body, x_grid)


@partial(jax.jit, static_argnames=("reps",))
def _convert_chain(op, x_grid, reps):
    """Layout round-trip only (no SpMV): isolates conversion cost."""
    def body(_, x):
        y = op.from_flat(op.to_flat(x))
        return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))

    return jax.lax.fori_loop(0, reps, body, x_grid)


def main():
    args = sys.argv[1:]
    cells = tuple(int(a) for a in args[:3]) if len(args) >= 3 else (160, 64, 64)
    reps = int(args[3]) if len(args) > 3 else 20

    from pde_solver_tpu.mesh import box_mesh
    from pde_solver_tpu.models.elasticity import lame_parameters
    from pde_solver_tpu.ops import assembly
    from pde_solver_tpu.ops.bc import DirichletBC
    from pde_solver_tpu.ops.linsolve import np_stencil_apply, prepare_system
    from pde_solver_tpu.ops.pallas_kernels import FlatStencilOperator

    print(f"backend={jax.default_backend()} cells={cells} reps={reps}",
          flush=True)
    t0 = time.perf_counter()
    _ = float(jnp.zeros(()))
    print(f"warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    lam, mu = lame_parameters(210e9, 0.3, "3d")
    mesh = box_mesh(*cells, (0, 0, 0), (1.0, 0.2, 0.2))
    N = mesh.num_nodes
    print(f"nodes={N} DOF={3 * N}", flush=True)
    t0 = time.perf_counter()
    K = assembly.assemble_elasticity_stencil(mesh, lam, mu)
    b = assembly.assemble_vector_load(mesh, np.array([0.0, 0.0, -9.81 * 7800.0]))
    bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 0.0)],
                                mesh.node_shape, vdim=3)
    sysm = prepare_system(K, mesh, bc, b, 3)
    print(f"assembly+prepare: {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(sysm.b_hat.shape).astype(np.float32)
    y_ref = np_stencil_apply(dict(zip(sysm.offsets, sysm.weights)),
                             x_np.astype(np.float64), 3, 3)
    ref_scale = np.abs(y_ref).max()

    n_off = len(sysm.offsets)
    w_bytes_f32 = n_off * 9 * N * 4
    x_bytes = 3 * N * 4
    HBM_BW = 819e9  # v5e

    def report(name, ms, w_bytes):
        traffic = w_bytes + 2 * x_bytes
        roof_ms = traffic / HBM_BW * 1e3
        print(f"{name:28s}: {ms:8.3f} ms/apply   traffic={traffic/1e6:.0f}MB"
              f"  roofline={roof_ms:.3f}ms  frac={roof_ms/ms*100:.0f}%",
              flush=True)

    # --- dense XLA ---
    w32 = tuple(jnp.asarray(W, jnp.float32) for W in sysm.weights)
    x = jnp.asarray(x_np)
    sync_scalar(_xla_chain(sysm.offsets, w32, x, 3, 3, reps))  # compile+warm
    t0 = time.perf_counter()
    sync_scalar(_xla_chain(sysm.offsets, w32, x, 3, 3, reps))
    report("dense XLA", (time.perf_counter() - t0) / reps * 1e3, w_bytes_f32)
    y1 = _xla_chain(sysm.offsets, w32, x, 3, 3, 1)
    rel = np.abs(np.asarray(y1) * ref_scale / np.abs(np.asarray(y1)).max()
                 - y_ref).max() / ref_scale
    print(f"    rel-vs-f64: {rel:.2e}", flush=True)

    # --- pallas variants ---
    for name, kw in (
        ("pallas resident f32", dict(resident=True)),
        ("pallas resident bf16", dict(resident=True,
                                      weight_dtype=jnp.bfloat16)),
        ("pallas windowed f32", dict(resident=False)),
        ("pallas resident f32 b4096", dict(resident=True, block=4096)),
        ("pallas resident bf16 b4096", dict(resident=True, block=4096,
                                            weight_dtype=jnp.bfloat16)),
        ("pallas resident f32 b8192", dict(resident=True, block=8192)),
        ("pallas resident bf16 b8192", dict(resident=True, block=8192,
                                            weight_dtype=jnp.bfloat16)),
        ("pallas resident bf16 b16384", dict(resident=True, block=16384,
                                             weight_dtype=jnp.bfloat16)),
    ):
        try:
            op = FlatStencilOperator(sysm.offsets, sysm.weights,
                                     mesh.node_shape, vdim=3,
                                     interpret=False, **kw)
            xf = op.to_flat(x)
            y = np.asarray(op.from_flat(_pallas_chain(op, xf, 1)))
            rel = np.abs(y * ref_scale / np.abs(y).max() - y_ref).max() / ref_scale
            sync_scalar(_pallas_chain(op, xf, reps))  # compile+warm
            t0 = time.perf_counter()
            sync_scalar(_pallas_chain(op, xf, reps))
            ms = (time.perf_counter() - t0) / reps * 1e3
            wb = op.Wf.size * op.Wf.dtype.itemsize
            report(name, ms, wb)
            print(f"    rel-vs-f64: {rel:.2e}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # --- layout-conversion overhead (what MG pays per grid-layout apply) ---
    op = FlatStencilOperator(sysm.offsets, sysm.weights, mesh.node_shape,
                             vdim=3, interpret=False, resident=True)
    xg = jnp.asarray(x_np)
    for name, chain in (("pallas GRID apply (with conv)", _pallas_grid_chain),
                        ("layout round-trip only", _convert_chain)):
        sync_scalar(chain(op, xg, reps))
        t0 = time.perf_counter()
        sync_scalar(chain(op, xg, reps))
        print(f"{name:28s}: {(time.perf_counter()-t0)/reps*1e3:8.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
