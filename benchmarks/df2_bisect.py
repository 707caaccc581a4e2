"""Localize the 9.8M-DOF fused-df2 first-round NaN on the real chip.

Context (ROUND5_NOTES "Flagship scaling study"): at 256x112x112
(9.84M DOF) `solve_fcycle_df2`'s fused round program returns relres=nan
within its first rounds on the TPU, while (a) the IDENTICAL fused
program converges on CPU (/tmp/df2_cpu_repro.py: relres 8.3e-07 in 4
rounds) and (b) the host-driven `solve_fcycle_df` rounds over the SAME
ladder converge on the SAME chip (490 iters, relres 1.85e-07).  So the
failure is specific to the TPU compilation of the one fused program at
this size.  This script bisects it in ONE process (batched per the
restart-window playbook in CLAUDE.md):

  0 probe     : 32-matmul fori_loop chain (the only probe to trust)
  1 ref       : host-driven descend - r32, restricts, host f64 coarse e
  2 coarse32  : device f32 matmul (precision=HIGHEST) coarse solve,
                compared against the host f64 solve
  3 fdescend  : FUSED descend program (df residual + restricts + f32
                coarse matmul) - per-stage norms vs stage 1
  4 fround    : instrumented copy of multigrid._jit_round_df returning
                per-ascend-stage norms - localizes the first non-finite
  5 fround-hc : same fused round but the coarse correction is PASSED IN
                (host f64) - discriminates coarse-matmul vs ascend fusion

Usage (from /root/repo, never with PYTHONPATH set - axon breaks):
    timeout 2400 python benchmarks/df2_bisect.py [NX NY NZ]
Defaults to 256 112 112.  Needs the benchspec disk cache for that mesh
(any prior bench.py run at the shape populates it).
"""
import ast
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print("[bisect]", *a, flush=True)


def nrm(a):
    return jnp.sqrt(jnp.vdot(a.reshape(-1), a.reshape(-1)))


def main():
    cells = (256, 112, 112)
    if len(sys.argv) >= 4:
        cells = tuple(int(x) for x in sys.argv[1:4])
    E, nu = 210e9, 0.3
    inner_iters = int(os.environ.get("PDE_BENCH_INNER", 10))

    from pde_solver_tpu.utils import diskcache
    from pde_solver_tpu.ops import multigrid as mg
    from pde_solver_tpu.ops import df32
    from pde_solver_tpu.ops.linsolve import ScaledSystem

    log(f"backend={jax.default_backend()} cells={cells} "
        f"inner_iters={inner_iters}")

    # --- stage 0: chip health (amortized matmul chain, cf. BENCH_NOTES
    # "probe methodology caveat" - single dispatches measure the tunnel)
    t0 = time.time()
    float(jnp.zeros(()))  # channel warmup
    log(f"channel warmup: {time.time() - t0:.1f}s")
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def chain(a):
        def body(_, x):
            return jnp.tanh(x @ a) * (1.0 / n)
        return jax.lax.fori_loop(0, 32, body, a)

    chain(a).block_until_ready()
    t0 = time.time()
    chain(a).block_until_ready()
    tf = 32 * 2 * n**3 / (time.time() - t0) / 1e12
    log(f"probe: {tf:.0f} TFLOP/s bf16 "
        f"({'healthy' if tf > 50 else 'DEGRADED'})")

    # --- setup: spec fast path (as bench.py bench_flagship)
    speckey = ("elasticity3d-cantilever-v1", cells, E, nu,
               (0.0, 0.0, -9.81 * 7800.0))
    spec = diskcache.load("benchspec", speckey)
    if spec is None:
        log("FATAL: no benchspec disk entry for this shape - run bench.py "
            "once at it first (PDE_BENCH_CELLS)")
        return 2
    ckey = ast.literal_eval(spec["meta"]["ckey"])
    t0 = time.time()
    h = mg.load_hierarchy_from_disk(ckey, 3, jnp.float32)
    log(f"hierarchy from disk: {time.time() - t0:.1f}s "
        f"({len(h.levels)} levels)")
    h = h._replace(pre_smooth=2, post_smooth=1)  # bench V(2,1)
    sysm = ScaledSystem(ckey[2], None, spec["b_hat"], spec["gvals"],
                        spec["free"], "block", None, None, spec["CinvT"],
                        ckey=ckey)
    t0 = time.time()
    ladder = mg.build_df_ladder(h, sysm, sysm.b_hat)
    jax.block_until_ready(ladder.Whi)
    log(f"ladder: {time.time() - t0:.1f}s")

    d, vdim = h.grid_dim, h.vdim
    L = len(h.levels) - 1
    bnorm = max(float(np.linalg.norm(
        np.asarray(sysm.b_hat, np.float64).reshape(-1))), 1e-300)
    x_hi = jnp.zeros_like(ladder.bhi0)
    x_lo = jnp.zeros_like(ladder.bhi0)

    # --- stage 1: host-driven descend (the path that converges)
    t0 = time.time()
    r32, rnorm2 = df32.jit_df_residual(
        h.levels[0].offsets, ladder.Whi[0], ladder.Wlo[0],
        ladder.bhi0, ladder.blo0, x_hi, x_lo, d, vdim)
    rs = [r32]
    for m in range(L):
        rs.append(mg._jit_restrict_hat64(ladder.scale32[m],
                                         ladder.scale32[m + 1],
                                         ladder.free32[m + 1], rs[m], d))
    ref_norms = [float(nrm(r)) for r in rs]
    log(f"stage1 host-driven descend ({time.time() - t0:.1f}s): "
        f"relres0={float(jnp.sqrt(rnorm2)) / bnorm:.3e} "
        f"rs norms={['%.3e' % v for v in ref_norms]}")

    rL64 = np.asarray(rs[L], dtype=np.float64)
    e_host64 = (h.levels[-1].host_Ainv @ rL64.reshape(-1)).reshape(rL64.shape)
    log(f"stage1 host f64 coarse: |e|={np.linalg.norm(e_host64):.6e}")

    # --- stage 2: device f32 coarse matmul vs host f64
    Ainv32 = jnp.asarray(h.levels[-1].host_Ainv, dtype=jnp.float32)
    e_dev = jax.jit(lambda A, r: jnp.matmul(
        A, r.reshape(-1), precision=jax.lax.Precision.HIGHEST
    ).reshape(r.shape))(Ainv32, rs[L])
    e_dev_np = np.asarray(e_dev, np.float64)
    rel = (np.linalg.norm(e_dev_np - e_host64)
           / max(np.linalg.norm(e_host64), 1e-300))
    log(f"stage2 device f32 coarse: |e|={np.linalg.norm(e_dev_np):.6e} "
        f"reldiff vs host f64 = {rel:.3e} "
        f"finite={bool(np.isfinite(e_dev_np).all())}")

    # --- stage 3: FUSED descend program
    h_struct = (tuple(lv.offsets for lv in h.levels),
                tuple(lv.omega for lv in h.levels),
                d, vdim, h.pre_smooth, h.post_smooth, h.coarse_iters)

    @partial(jax.jit, static_argnames=("hs",))
    def fused_descend(hs, Whi, Wlo, scale32, free32, Ainv32, bhi, blo,
                      x_hi, x_lo):
        offs, _omegas, gd, vd, _pre, _post, _ci = hs
        r32, rnorm2 = df32.df_stencil_residual(
            offs[0], Whi[0], Wlo[0], bhi, blo, x_hi, x_lo, gd, vd)
        rs = [r32]
        for m in range(L):
            rs.append(mg._jit_restrict_hat64(scale32[m], scale32[m + 1],
                                             free32[m + 1], rs[m], gd))
        e = jnp.matmul(Ainv32, rs[L].reshape(-1),
                       precision=jax.lax.Precision.HIGHEST
                       ).reshape(rs[L].shape)
        return tuple(nrm(r) for r in rs) + (nrm(e),)

    t0 = time.time()
    out = fused_descend(h_struct, ladder.Whi, ladder.Wlo, ladder.scale32,
                        ladder.free32, Ainv32, ladder.bhi0, ladder.blo0,
                        x_hi, x_lo)
    vals = [float(v) for v in out]
    log(f"stage3 fused descend ({time.time() - t0:.1f}s): "
        f"norms={['%.3e' % v for v in vals]} "
        f"finite={all(np.isfinite(vals))}")

    # --- stages 4+5: instrumented fused round (mirrors
    # multigrid._jit_round_df with per-stage norms; host_coarse=True
    # substitutes the passed-in e0 for the on-device coarse matmul)
    @partial(jax.jit,
             static_argnames=("hs", "inner_iters", "host_coarse"))
    def fused_round_instr(hs, level_arrays, Whi, Wlo, scale32, free32,
                          Ainv32, bhi, blo, x_hi, x_lo, e0,
                          inner_iters, host_coarse):
        offs, omegas, gd, vd, pre, post, ci = hs
        levels = []
        for i, arrs in enumerate(level_arrays):
            weights, free, s, C, Cinv, Ainv, w_lo = arrs
            levels.append(mg.MGLevel(offs[i], weights, free, omegas[i],
                                     s, C, Cinv, Ainv, w_lo=w_lo))
        trace = []  # values only; trace_names() rebuilds labels statically
        r32, rnorm2 = df32.df_stencil_residual(
            offs[0], Whi[0], Wlo[0], bhi, blo, x_hi, x_lo, gd, vd)
        trace.append(rnorm2)
        rs = [r32]
        for m in range(L):
            rs.append(mg._jit_restrict_hat64(scale32[m], scale32[m + 1],
                                             free32[m + 1], rs[m], gd))
            trace.append(nrm(rs[m + 1]))
        if host_coarse:
            e = e0
        else:
            e = jnp.matmul(Ainv32, rs[L].reshape(-1),
                           precision=jax.lax.Precision.HIGHEST
                           ).reshape(rs[L].shape)
        trace.append(nrm(e))
        iters = jnp.asarray(0, jnp.int32)
        for m in range(L - 1, -1, -1):
            e = mg._jit_prolong_hat64(scale32[m], scale32[m + 1],
                                      free32[m], e, gd)
            trace.append(nrm(e))
            sub = mg.MGHierarchy(tuple(levels[m:]), gd, vd, pre, post, ci)
            zero = jnp.zeros_like(rs[m])
            for j in range(1 if m == 0 else 2):
                rho, _ = df32.df_stencil_residual(
                    offs[m], Whi[m], Wlo[m], rs[m], zero, e, zero, gd, vd)
                scale = jnp.maximum(jnp.sqrt(jnp.vdot(rho.reshape(-1),
                                                      rho.reshape(-1))),
                                    1e-30)
                trace.append(scale)
                d32, k, _ = mg.mg_pcg(sub, rho / scale,
                                      jnp.zeros_like(rho), 1e-5,
                                      inner_iters)
                trace.append(nrm(d32))
                e = e + scale * d32
                trace.append(nrm(e))
                iters = iters + k
        x_hi2, x_lo2 = df32.df_scale_add(x_hi, x_lo,
                                         jnp.asarray(1.0, jnp.float32), e)
        return (trace, x_hi2, x_lo2, iters)

    def trace_names():
        names = ["rnorm2"]
        names += [f"rs{m + 1}" for m in range(L)]
        names.append("e_coarse")
        for m in range(L - 1, -1, -1):
            names.append(f"L{m}_prolong")
            for j in range(1 if m == 0 else 2):
                names += [f"L{m}_c{j}_rho_scale", f"L{m}_c{j}_d32",
                          f"L{m}_c{j}_e"]
        return names

    level_arrays = tuple((lv.weights, lv.free, lv.s, lv.C, lv.Cinv,
                          lv.Ainv, lv.w_lo) for lv in h.levels)
    e0_dev = jnp.asarray(e_host64, dtype=jnp.float32)

    n_rounds = int(os.environ.get("BISECT_ROUNDS", 3))
    skip = set(os.environ.get("BISECT_SKIP", "").split(","))
    stages45 = () if "45" in skip else (
        (False, "stage4 instr round (dev coarse)"),
        (True, "stage5 instr round (HOST coarse)"))
    for host_coarse, label in stages45:
        xh, xl = x_hi, x_lo
        for rnd in range(n_rounds):
            t0 = time.time()
            vals, xh, xl, k = fused_round_instr(
                h_struct, level_arrays, ladder.Whi, ladder.Wlo,
                ladder.scale32, ladder.free32, Ainv32, ladder.bhi0,
                ladder.blo0, xh, xl, e0_dev, inner_iters, host_coarse)
            names = trace_names()
            vals = [float(v) for v in vals]
            wall = time.time() - t0
            bad = [nm for nm, v in zip(names, vals) if not np.isfinite(v)]
            _, r2 = df32.jit_df_residual(h.levels[0].offsets,
                                         ladder.Whi[0], ladder.Wlo[0],
                                         ladder.bhi0, ladder.blo0,
                                         xh, xl, d, vdim)
            relres = float(jnp.sqrt(r2)) / bnorm
            log(f"{label} round {rnd} ({wall:.1f}s): iters={int(k)} "
                f"relres={relres:.6e} "
                f"first_nonfinite={bad[0] if bad else 'NONE'}")
            for nm, v in zip(names, vals):
                log(f"    {nm:>18s} = {v:.6e}")
            if not np.isfinite(relres):
                break

    # --- stage 6: the PRODUCTION fused round (multigrid._jit_round_df,
    # exactly what solve_fcycle_df2 dispatches) - the program that NaN'd
    # in the bench runs.  If it NaNs here while stages 4/5 stay finite,
    # the failure is fusion-layout-dependent (the instrumentation's norm
    # taps change XLA's fusion decisions), not a logic bug.
    xh, xl = x_hi, x_lo
    for rnd in range(n_rounds if "6" not in skip else 0):
        t0 = time.time()
        xh, xl, rnorm2, k = mg._jit_round_df(
            h_struct, level_arrays, ladder.Whi, ladder.Wlo,
            ladder.scale32, ladder.free32, Ainv32, ladder.bhi0,
            ladder.blo0, xh, xl, inner_iters)
        _, r2 = df32.jit_df_residual(h.levels[0].offsets, ladder.Whi[0],
                                     ladder.Wlo[0], ladder.bhi0,
                                     ladder.blo0, xh, xl, d, vdim)
        relres = float(jnp.sqrt(r2)) / bnorm
        log(f"stage6 PRODUCTION round {rnd} ({time.time() - t0:.1f}s): "
            f"iters={int(k)} pre-norm2={float(rnorm2):.3e} "
            f"relres={relres:.6e}")
        if not np.isfinite(relres):
            log("stage6: NaN reproduced in the production fused round")
            break

    # --- stage 7: production round + lax.optimization_barrier taps.
    # The instrumented rounds (stages 4/5) are numerically IDENTICAL to
    # the production round except for norm taps consuming intermediates -
    # and they converge where production explodes.  optimization_barrier
    # is the semantics-free way to impose the same fusion boundaries.
    # Variants (which barrier placement is the minimal fix):
    #   level : barrier on e once per ascend level
    #   pcg   : barrier on mg_pcg's input (rho/scale) and output d32
    #   corr  : barrier on e after every correction
    @partial(jax.jit, static_argnames=("hs", "inner_iters", "variant"))
    def round_barrier(hs, level_arrays, Whi, Wlo, scale32, free32,
                      Ainv32, bhi, blo, x_hi, x_lo, inner_iters, variant):
        offs, omegas, gd, vd, pre, post, ci = hs
        levels = []
        for i, arrs in enumerate(level_arrays):
            weights, free, s, C, Cinv, Ainv, w_lo = arrs
            levels.append(mg.MGLevel(offs[i], weights, free, omegas[i],
                                     s, C, Cinv, Ainv, w_lo=w_lo))
        bar = jax.lax.optimization_barrier
        r32, rnorm2 = df32.df_stencil_residual(
            offs[0], Whi[0], Wlo[0], bhi, blo, x_hi, x_lo, gd, vd)
        rs = [r32]
        for m in range(L):
            rs.append(mg._jit_restrict_hat64(scale32[m], scale32[m + 1],
                                             free32[m + 1], rs[m], gd))
        e = jnp.matmul(Ainv32, rs[L].reshape(-1),
                       precision=jax.lax.Precision.HIGHEST
                       ).reshape(rs[L].shape)
        iters = jnp.asarray(0, jnp.int32)
        for m in range(L - 1, -1, -1):
            e = mg._jit_prolong_hat64(scale32[m], scale32[m + 1],
                                      free32[m], e, gd)
            sub = mg.MGHierarchy(tuple(levels[m:]), gd, vd, pre, post, ci)
            zero = jnp.zeros_like(rs[m])
            for _ in range(1 if m == 0 else 2):
                rho, _ = df32.df_stencil_residual(
                    offs[m], Whi[m], Wlo[m], rs[m], zero, e, zero, gd, vd)
                scale = jnp.maximum(jnp.sqrt(jnp.vdot(rho.reshape(-1),
                                                      rho.reshape(-1))),
                                    1e-30)
                rhs = rho / scale
                if variant == "pcg":
                    rhs = bar(rhs)
                d32, k, _ = mg.mg_pcg(sub, rhs, jnp.zeros_like(rho),
                                      1e-5, inner_iters)
                if variant == "pcg":
                    d32 = bar(d32)
                e = e + scale * d32
                if variant == "corr":
                    e = bar(e)
                iters = iters + k
            if variant == "level":
                e = bar(e)
        x_hi2, x_lo2 = df32.df_scale_add(x_hi, x_lo,
                                         jnp.asarray(1.0, jnp.float32), e)
        return x_hi2, x_lo2, rnorm2, iters

    for variant in os.environ.get("BISECT_VARIANTS",
                                  "level,pcg,corr").split(","):
        variant = variant.strip()
        if not variant:
            continue
        xh, xl = x_hi, x_lo
        for rnd in range(n_rounds):
            t0 = time.time()
            xh, xl, rnorm2, k = round_barrier(
                h_struct, level_arrays, ladder.Whi, ladder.Wlo,
                ladder.scale32, ladder.free32, Ainv32, ladder.bhi0,
                ladder.blo0, xh, xl, inner_iters, variant)
            _, r2 = df32.jit_df_residual(h.levels[0].offsets,
                                         ladder.Whi[0], ladder.Wlo[0],
                                         ladder.bhi0, ladder.blo0,
                                         xh, xl, d, vdim)
            relres = float(jnp.sqrt(r2)) / bnorm
            log(f"stage7 barrier[{variant}] round {rnd} "
                f"({time.time() - t0:.1f}s): iters={int(k)} "
                f"relres={relres:.6e}")
            if not np.isfinite(relres):
                break
    return 0


if __name__ == "__main__":
    sys.exit(main())
