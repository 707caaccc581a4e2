"""Per-component timing of the 2M-DOF MG F-cycle on the real TPU.

Breaks one df2 round into its pieces so optimization effort goes where the
time is.  Run from /root/repo:  python benchmarks/mg_profile.py [sx sy sz]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(label, fn, reps=5):
    fn()  # compile+warm
    # sync via scalar pull inside fn
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:44s}: {ms:9.2f} ms", flush=True)
    return ms


def main():
    args = sys.argv[1:]
    cells = tuple(int(a) for a in args[:3]) if len(args) >= 3 else (160, 64, 64)
    from pde_solver_tpu.mesh import box_mesh
    from pde_solver_tpu.models.elasticity import lame_parameters
    from pde_solver_tpu.ops import assembly, multigrid as mg
    from pde_solver_tpu.ops.bc import DirichletBC
    from pde_solver_tpu.ops.linsolve import prepare_system
    from pde_solver_tpu.ops.df32 import jit_df_residual

    print(f"backend={jax.default_backend()} cells={cells}", flush=True)
    t0 = time.perf_counter()
    _ = float(jnp.zeros(()))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    lam, mu = lame_parameters(210e9, 0.3, "3d")
    mesh = box_mesh(*cells, (0, 0, 0), (1.0, 0.2, 0.2))
    K = assembly.assemble_elasticity_stencil(mesh, lam, mu)
    b = assembly.assemble_vector_load(mesh, np.array([0.0, 0.0, -9.81 * 7800.0]))
    bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 0.0)],
                                mesh.node_shape, vdim=3)
    sysm = prepare_system(K, mesh, bc, b, 3)

    def builder(mc):
        return (assembly.assemble_elasticity_stencil(mc, lam, mu),
                DirichletBC.from_masks([(mc.face_mask(0, 0), 0.0)],
                                       mc.node_shape, vdim=3))

    h = mg.build_hierarchy(mesh, sysm, builder, vdim=3, dtype=jnp.float32)
    ladder = mg.build_df_ladder(h, sysm, sysm.b_hat)
    print(f"hierarchy {len(h.levels)} levels; setup "
          f"{time.perf_counter() - t0:.0f}s", flush=True)

    d, vdim = 3, 3
    lv = h.levels[0]
    b32 = jnp.asarray(ladder.bhi0)
    x0 = jnp.zeros_like(b32)

    # --- pieces -------------------------------------------------------
    # NB: every jit takes its arrays as ARGS — a jitted closure over large
    # device arrays inlines them into the remote-compile HTTP request
    # (413 error over the axon tunnel, see CLAUDE.md).
    from pde_solver_tpu.ops.linsolve import _stencil_apply

    @partial(jax.jit, static_argnames=("offs",))
    def apply_w(offs, w, x):
        return _stencil_apply(offs, w, x, d, vdim)

    timeit("fine apply (true f32 op)",
           lambda: float(jnp.sum(
               apply_w(lv.offsets, lv.weights, b32)[0, 0, 0])))
    timeit("fine apply (smoother op)",
           lambda: float(jnp.sum(
               apply_w(lv.offsets, lv.w_smooth, b32)[0, 0, 0])))

    @partial(jax.jit, static_argnames=("offs",))
    def df_res(offs, Whi, Wlo, bhi, blo, x):
        return jit_df_residual(offs, Whi, Wlo, bhi, blo, x,
                               jnp.zeros_like(x), d, vdim)

    timeit("df32 residual (finest, dense weights)",
           lambda: float(df_res(lv.offsets, ladder.Whi[0], ladder.Wlo[0],
                                ladder.bhi0, ladder.blo0, b32)[1]))

    h_struct = (tuple(lv.offsets for lv in h.levels),
                tuple(lv.omega for lv in h.levels),
                d, vdim, h.pre_smooth, h.post_smooth, h.coarse_iters)
    level_arrays = tuple((lv.weights, lv.free, lv.s, lv.C, lv.Cinv, lv.Ainv,
                          lv.w_lo) for lv in h.levels)

    @partial(jax.jit, static_argnames=("hs",))
    def vc(hs, arrs, r):
        (offsets_per_level, omegas, gd, vd, pre, post, ci) = hs
        levels = [mg.MGLevel(offsets_per_level[i], a[0], a[1], omegas[i],
                             a[2], a[3], a[4], a[5], w_lo=a[6])
                  for i, a in enumerate(arrs)]
        hh = mg.MGHierarchy(tuple(levels), gd, vd, pre, post, ci)
        return mg.v_cycle(hh, r)

    timeit("one V-cycle (all levels)",
           lambda: float(jnp.sum(vc(h_struct, level_arrays, b32)[0, 0, 0])))

    @partial(jax.jit, static_argnames=("hs", "iters"))
    def pcg_n(hs, arrs, bb, iters):
        (offsets_per_level, omegas, gd, vd, pre, post, ci) = hs
        levels = [mg.MGLevel(offsets_per_level[i], a[0], a[1], omegas[i],
                             a[2], a[3], a[4], a[5], w_lo=a[6])
                  for i, a in enumerate(arrs)]
        hh = mg.MGHierarchy(tuple(levels), gd, vd, pre, post, ci)
        x, k, rr = mg.mg_pcg(hh, bb, jnp.zeros_like(bb), 0.0, iters)
        return x, k

    for it in (1, 14):
        timeit(f"mg_pcg level0 x{it} iters",
               lambda it=it: float(jnp.sum(
                   pcg_n(h_struct, level_arrays, b32, it)[0][0, 0, 0])))

    timeit("restrict_hat level0→1",
           lambda: float(jnp.sum(mg._jit_restrict_hat64(
               ladder.scale32[0], ladder.scale32[1], ladder.free32[1],
               b32, d)[0, 0, 0])))

    # --- chained pieces (true in-program costs, no dispatch latency) ---
    from jax import lax

    def norm(y):
        return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))

    @partial(jax.jit, static_argnames=("offs", "reps"))
    def chain_apply(offs, w, x, reps):
        return lax.fori_loop(
            0, reps, lambda _, xx: norm(_stencil_apply(offs, w, xx, d, vdim)),
            x)

    rg = jnp.asarray(np.asarray(ladder.bhi0))  # grid layout
    CH = 20
    timeit("chain20: fine apply f32 (grid io)",
           lambda: float(jnp.sum(chain_apply(lv.offsets, lv.weights, rg,
                                             CH)[0, 0, 0])) / CH, reps=2)
    timeit("chain20: fine apply bf16 smoother (grid io)",
           lambda: float(jnp.sum(chain_apply(lv.offsets, lv.w_smooth, rg,
                                             CH)[0, 0, 0])) / CH, reps=2)

    op0 = lv.weights
    xf0 = op0.to_flat(rg)

    @partial(jax.jit, static_argnames=("reps",))
    def chain_flat(op, x, reps):
        return lax.fori_loop(0, reps,
                             lambda _, xx: norm(op.apply_flat(xx)), x)

    timeit("chain20: fine apply f32 (flat io)",
           lambda: float(jnp.sum(chain_flat(op0, xf0, CH)[0, 0, 0])) / CH,
           reps=2)

    @partial(jax.jit, static_argnames=("hs", "reps"))
    def chain_vc(hs, arrs, r, reps):
        (offsets_per_level, omegas, gd, vd, pre, post, ci) = hs
        levels = [mg.MGLevel(offsets_per_level[i], a[0], a[1], omegas[i],
                             a[2], a[3], a[4], a[5], w_lo=a[6])
                  for i, a in enumerate(arrs)]
        hh = mg.MGHierarchy(tuple(levels), gd, vd, pre, post, ci)
        return lax.fori_loop(0, reps,
                             lambda _, xx: norm(mg.v_cycle(hh, xx)), r)

    timeit("chain20: one V-cycle (grid io)",
           lambda: float(jnp.sum(chain_vc(h_struct, level_arrays, rg,
                                          CH)[0, 0, 0])) / CH, reps=2)

    @partial(jax.jit, static_argnames=("reps",))
    def chain_rp(fs, cs, cfree, ffree, r, reps):
        def body(_, xx):
            rc = mg._restrict_hat(
                mg.MGLevel(lv.offsets, None, ffree, 1.0, None, fs[0], fs[1]),
                mg.MGLevel(lv.offsets, None, cfree, 1.0, None, cs[0], cs[1]),
                xx, d, vdim)
            e = mg._prolong_hat(
                mg.MGLevel(lv.offsets, None, ffree, 1.0, None, fs[0], fs[1]),
                mg.MGLevel(lv.offsets, None, cfree, 1.0, None, cs[0], cs[1]),
                rc, d, vdim)
            return norm(xx + e)
        return lax.fori_loop(0, reps, body, r)

    lv1 = h.levels[1]
    timeit("chain20: restrict+prolong L0↔L1 (block)",
           lambda: float(jnp.sum(chain_rp(
               (lv.C, lv.Cinv), (lv1.C, lv1.Cinv), lv1.free, lv.free,
               rg, CH)[0, 0, 0])) / CH, reps=2)

    # --- one fused round ---------------------------------------------
    h_struct = (tuple(lv.offsets for lv in h.levels),
                tuple(lv.omega for lv in h.levels),
                d, vdim, h.pre_smooth, h.post_smooth, h.coarse_iters)
    level_arrays = tuple((lv.weights, lv.free, lv.s, lv.C, lv.Cinv, lv.Ainv,
                          lv.w_lo) for lv in h.levels)
    Ainv32 = jnp.asarray(h.levels[-1].host_Ainv, dtype=jnp.float32)

    def one_round():
        x_hi, x_lo, rn2, k = mg._jit_round_df(
            h_struct, level_arrays, ladder.Whi, ladder.Wlo, ladder.scale32,
            ladder.free32, Ainv32, ladder.bhi0, ladder.blo0, x0, x0, 14)
        return float(rn2)

    timeit("ONE fused df2 round (inner_iters=14)", one_round, reps=3)


if __name__ == "__main__":
    main()
