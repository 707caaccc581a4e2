"""A/B the constant-interior (CS) kernel against the dense flat kernel on
the REAL flagship system (2M-DOF cantilever elasticity) — the decisive
measurement for routing PDE_TPU_CS=1 (VERDICT r3 item 2).

Times, per operator, the same fori_loop apply chain bench.py's roofline
uses.  Also times the CS main pass alone (window contribution isolated)
and reports the builder's fold statistics.

Usage: python benchmarks/cs_ab.py [nx ny nz reps]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pde_solver_tpu.mesh import box_mesh
from pde_solver_tpu.models.elasticity import lame_parameters
from pde_solver_tpu.ops import assembly
from pde_solver_tpu.ops.bc import DirichletBC
from pde_solver_tpu.ops.linsolve import prepare_system
from pde_solver_tpu.ops.pallas_kernels import (CSFlatStencilOperator,
                                               FlatStencilOperator,
                                               _cs_main_call)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("reps",))
def _chain(op, xf, reps):
    def body(_, xx):
        y = op.apply_flat(xx)
        return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))
    return jax.lax.fori_loop(0, reps, body, xf)


def time_chain(op, xf, reps):
    float(jnp.sum(_chain(op, xf, reps)[0, 0, 0]))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(_chain(op, xf, reps)[0, 0, 0]))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    cells = tuple(int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 \
        else (160, 64, 64)
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 50
    _ = float(jnp.zeros(()))  # channel warmup fence
    mesh = box_mesh(*cells, (0, 0, 0), (1.0, 0.2, 0.2))
    lam, mu = lame_parameters(210e9, 0.3, "3d")
    K = assembly.assemble_elasticity_stencil(mesh, lam, mu)
    bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 0.0)],
                                mesh.node_shape, vdim=3)
    b = assembly.assemble_vector_load(mesh, np.array([0.0, 0.0, -7.65e4]))
    sysm = prepare_system(K, mesh, bc, b, 3)
    log(f"[cs_ab] {mesh.num_nodes} nodes, {len(sysm.offsets)} offsets")

    t0 = time.perf_counter()
    cs = CSFlatStencilOperator.try_build(sysm.offsets, sysm.weights,
                                         mesh.node_shape, vdim=3)
    log(f"[cs_ab] try_build: {time.perf_counter() - t0:.1f}s")
    if cs is None:
        log("[cs_ab] CS refused — nothing to measure")
        return
    nw = cs.base.n_off * 9
    eff = sum(np.count_nonzero(sv) / nw for sv in cs.sets)
    log(f"[cs_ab] fold: {len(cs.sets)} sets, {eff:.2f} effective sweeps, "
        f"windows {cs.n_win}/{cs.base.n_rows // 8} octets "
        f"({cs.n_win * 8 / cs.base.n_rows * 100:.1f}% rows), "
        f"Wwin {cs.Wwin.size * 4 / 1e6:.0f} MB")

    dense = FlatStencilOperator(sysm.offsets, sysm.weights, mesh.node_shape,
                                vdim=3)
    dense16 = dense.as_weight_dtype(jnp.bfloat16)
    x = dense.to_flat(jnp.asarray(sysm.b_hat, jnp.float32))

    # Interleave the three arms across rounds: the tunneled worker's speed
    # drifts over minutes, so sequential per-arm timing biases whichever arm
    # runs last.  Per-arm min across rounds is the drift-robust statistic.
    arms = [("dense f32", dense), ("dense bf16", dense16), ("CS full", cs)]
    best = {name: float("inf") for name, _ in arms}
    for rnd in range(3):
        for name, op in arms:
            ms = time_chain(op, x, reps)
            best[name] = min(best[name], ms)
            log(f"[cs_ab] round {rnd} {name}: {ms:.3f} ms/apply")
    ms_d, ms_d16, ms_c = (best[n] for n, _ in arms)
    log(f"[cs_ab] BEST dense f32:  {ms_d:.3f} ms/apply")
    log(f"[cs_ab] BEST dense bf16: {ms_d16:.3f} ms/apply")
    log(f"[cs_ab] BEST CS full:    {ms_c:.3f} ms/apply "
        f"({ms_d / ms_c:.2f}x vs f32, {ms_d16 / ms_c:.2f}x vs bf16)")

    # CS main pass alone (isolate the window-pass contribution)
    bb = cs.base

    @functools.partial(jax.jit, static_argnames=("reps",))
    def _chain_main(masks, xf, reps):
        def body(_, xx):
            x_pad = jnp.pad(xx, ((0, 0), (bb.halo_r, bb.halo_r), (0, 0)))
            y = _cs_main_call(masks, x_pad, bb.n_off, bb.vdim, bb.rb,
                              bb.halo_r, bb.deltas, cs.sets, bb.interpret)
            return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))
        return jax.lax.fori_loop(0, reps, body, xf)

    float(jnp.sum(_chain_main(cs.masks, x, reps)[0, 0, 0]))
    t0 = time.perf_counter()
    float(jnp.sum(_chain_main(cs.masks, x, reps)[0, 0, 0]))
    ms_m = (time.perf_counter() - t0) / reps * 1e3
    log(f"[cs_ab] CS main pass only: {ms_m:.3f} ms "
        f"(window pass ≈ {ms_c - ms_m:.3f} ms)")

    # numerical parity on device
    yd = dense.apply_flat(x)
    yc = cs.apply_flat(x)
    rel = float(jnp.max(jnp.abs(yc - yd)) / jnp.max(jnp.abs(yd)))
    log(f"[cs_ab] CS vs dense rel err: {rel:.2e}")


if __name__ == "__main__":
    main()
