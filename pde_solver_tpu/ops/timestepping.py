"""Implicit time stepping compiled as one ``lax.scan``.

Replaces the reference's Python time loop — which rebuilds the RHS form and
re-solves an unfactorized matrix every step and boxes every snapshot into
Python lists (fenics_mcp_server.py:309-318, :438-447, :707-716) — with a
single jit-compiled θ-scheme scan:

    (M + θ Δt K) u^{n+1} = (M − (1−θ) Δt K) u^n + Δt b

θ=1 is backward Euler (reference parity); θ=1/2 is Crank-Nicolson (new
capability, BASELINE.md config 3).  Each step solves with warm-started
Jacobi-PCG; snapshots stack on device and transfer once at the end.

Mixed-precision mode keeps the state in float64 while the CG inner loop runs
in float32; a fixed number of float64 refinement passes per step bounds
drift over long horizons.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pde_solver_tpu.config import SolverConfig, get_config
from pde_solver_tpu.mesh import StructuredMesh
from pde_solver_tpu.ops.bc import DirichletBC
from pde_solver_tpu.ops.cg import pcg
from pde_solver_tpu.ops.stencil import StencilOperator


class TransientResult(NamedTuple):
    values: np.ndarray        # [num_steps+1, *node_shape(, v)] float64 — u0 first
    times: np.ndarray         # [num_steps+1]
    total_cg_iterations: int
    max_relative_residual: float


def _combine(K: Dict, M: Dict, alpha: float, beta: float) -> Dict:
    """beta*M + alpha*K as a numpy stencil."""
    out = {}
    for o, W in M.items():
        out[o] = beta * W
    for o, W in K.items():
        out[o] = out.get(o, 0.0) + alpha * W
    return out


def run_transient(
    K_np: Dict,
    M_np: Dict,
    mesh: StructuredMesh,
    bc: DirichletBC,
    b_source_np: np.ndarray,
    u0_np: np.ndarray,
    dt: float,
    num_steps: int,
    theta: float = 1.0,
    vdim: int = 1,
    config: Optional[SolverConfig] = None,
) -> TransientResult:
    cfg = config or get_config()
    prec = cfg.resolve_precision()
    n = int(np.prod(mesh.node_shape)) * vdim
    maxiter = cfg.resolved_maxiter(n)

    A_np = _combine(K_np, M_np, alpha=theta * dt, beta=1.0)
    B_np = _combine(K_np, M_np, alpha=-(1.0 - theta) * dt, beta=1.0)

    state_dtype = jnp.float64 if prec in ("f64", "mixed") else jnp.float32
    cg_dtype = jnp.float64 if prec == "f64" else jnp.float32

    A_state = StencilOperator.from_numpy(A_np, mesh.node_shape, dtype=state_dtype, vdim=vdim)
    B_state = StencilOperator.from_numpy(B_np, mesh.node_shape, dtype=state_dtype, vdim=vdim)
    A_cg = A_state if cg_dtype == state_dtype else A_state.astype(cg_dtype)

    bc_s = bc.astype(state_dtype)
    bc_cg = bc.astype(cg_dtype)
    a_state = bc_s.constrain_operator(A_state.apply)
    a_cg = bc_cg.constrain_operator(A_cg.apply)
    diag = A_cg.diagonal() * bc_cg.free_mask + (1.0 - bc_cg.free_mask)
    inv_diag = 1.0 / jnp.where(diag == 0, jnp.ones_like(diag), diag)

    g = (bc_s.values * (1.0 - bc_s.free_mask)).astype(state_dtype)
    Ag = A_state.apply(g)
    b_src = jnp.asarray(dt * b_source_np, dtype=state_dtype)
    u0 = jnp.asarray(u0_np, dtype=state_dtype)

    inner_tol = cfg.tol if prec == "f64" else cfg.inner_tol
    refine = cfg.transient_refine_rounds if prec == "mixed" else 0
    snap_dtype = jnp.float32 if cfg.snapshot_dtype == "f32" and prec != "f64" else state_dtype

    def step(carry, _):
        u, iters_acc, res_acc = carry
        rhs = B_state.apply(u) + b_src
        bt = bc_s.free_mask * (rhs - Ag) + g

        if prec == "mixed":
            # f32 inner solve from warm start, then f64 refinement passes.
            x = u
            total = jnp.asarray(0, jnp.int32)
            for _r in range(1 + refine):
                r = bt - a_state(x)
                scale = jnp.maximum(jnp.max(jnp.abs(r)), 1e-300)
                d32, st = pcg(a_cg, (r / scale).astype(cg_dtype),
                              inv_diag=inv_diag, tol=inner_tol, maxiter=maxiter)
                x = x + scale * d32.astype(state_dtype)
                total = total + st.iterations
            r = bt - a_state(x)
            relres = jnp.sqrt(jnp.vdot(r.reshape(-1), r.reshape(-1))) / jnp.maximum(
                jnp.sqrt(jnp.vdot(bt.reshape(-1), bt.reshape(-1))), 1e-300)
            u_new, iters = x, total
        else:
            u_new, st = pcg(a_cg, bt.astype(cg_dtype), inv_diag=inv_diag,
                            tol=inner_tol, maxiter=maxiter, x0=u.astype(cg_dtype))
            u_new = u_new.astype(state_dtype)
            iters, relres = st.iterations, st.relative_residual
        return (u_new, iters_acc + iters, jnp.maximum(res_acc, relres)), u_new.astype(snap_dtype)

    @jax.jit
    def run(u_init):
        carry0 = (u_init, jnp.asarray(0, jnp.int32), jnp.asarray(0.0, state_dtype))
        (u_f, iters, res), snaps = jax.lax.scan(step, carry0, None, length=num_steps)
        return snaps, iters, res

    snaps, iters, res = run(u0)
    values = np.concatenate(
        [np.asarray(u0, dtype=np.float64)[None], np.asarray(snaps, dtype=np.float64)], axis=0
    )
    times = dt * np.arange(num_steps + 1, dtype=np.float64)
    return TransientResult(values=values, times=times,
                           total_cg_iterations=int(iters),
                           max_relative_residual=float(res))
