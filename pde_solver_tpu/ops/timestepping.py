"""Implicit time stepping compiled as one ``lax.scan``.

Replaces the reference's Python time loop — which rebuilds the RHS form and
re-solves an unfactorized matrix every step and boxes every snapshot into
Python lists (fenics_mcp_server.py:309-318, :438-447, :707-716) — with a
single jit-compiled θ-scheme scan:

    (M + θ Δt K) u^{n+1} = (M − (1−θ) Δt K) u^n + Δt b

θ=1 is backward Euler (reference parity); θ=1/2 is Crank-Nicolson (new
capability, BASELINE.md config 3).  The implicit operator gets Dirichlet
masking and symmetric Jacobi scaling baked into its stencil weights on host
(see ops.linsolve); each step solves with warm-started CG on the scaled
unit-diagonal system.  Snapshots stack on device and transfer once.

The whole scan is compiled behind a module-level jit whose cache keys on
(offsets, shapes, num_steps, mode) — repeated transients on the same mesh
shape dispatch once.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pde_solver_tpu.config import SolverConfig, get_config
from pde_solver_tpu.mesh import StructuredMesh
from pde_solver_tpu.ops.bc import DirichletBC
from pde_solver_tpu.ops.linsolve import (
    _cg_unit_diag,
    _stencil_apply,
    np_stencil_apply,
    prepare_system,
)


class TransientResult(NamedTuple):
    values: np.ndarray        # [num_steps+1, *node_shape(, v)] float64 — u0 first
    times: np.ndarray         # [num_steps+1]
    total_cg_iterations: int
    max_relative_residual: float


def _combine(K: Dict, M: Dict, alpha: float, beta: float) -> Dict:
    """beta*M + alpha*K as a numpy stencil."""
    out = {}
    for o, W in M.items():
        out[o] = beta * np.asarray(W, dtype=np.float64)
    for o, W in K.items():
        out[o] = out.get(o, 0.0) + alpha * np.asarray(W, dtype=np.float64)
    return out


@partial(jax.jit, static_argnames=("offsets", "num_steps", "maxiter",
                                   "refine", "grid_dim", "vdim", "mode",
                                   "snap32"))
def _transient_scan(offsets, A32, A64, B_w, free, g, s, b_src, Ag, u0,
                    inner_tol, num_steps, maxiter, refine, grid_dim, vdim,
                    mode, snap32):
    """One fused scan over implicit steps on the scaled system.

    mode: "f64" | "f32" | "mixed".  All weight tuples are aligned with
    ``offsets``; ``B_w`` is the unmasked explicit-side operator.
    """
    state_dtype = jnp.float64 if mode in ("f64", "mixed") else jnp.float32
    u0 = u0.astype(state_dtype)
    snap_dtype = jnp.float32 if snap32 else state_dtype

    def B(x):
        return _stencil_apply(offsets, B_w, x, grid_dim, vdim)

    def step(carry, _):
        u, iters_acc, res_acc = carry
        rhs = B(u) + b_src
        bt = free * (rhs - Ag) + g
        b_hat = s * bt
        x0_hat = u / s

        if mode == "f64":
            xh, k, relres = _cg_unit_diag(offsets, A64, b_hat, x0_hat,
                                          inner_tol, maxiter, grid_dim, vdim)
        elif mode == "f32":
            xh, k, relres = _cg_unit_diag(offsets, A32, b_hat, x0_hat,
                                          inner_tol, maxiter, grid_dim, vdim)
        else:  # mixed: f32 inner solves from warm start + f64 refinement
            def A64f(x):
                return _stencil_apply(offsets, A64, x, grid_dim, vdim)

            xh = x0_hat
            k = jnp.asarray(0, jnp.int32)
            for _r in range(1 + refine):
                r = b_hat - A64f(xh)
                scale = jnp.maximum(jnp.max(jnp.abs(r)), 1e-300)
                d32, ki, _ = _cg_unit_diag(offsets, A32,
                                           (r / scale).astype(jnp.float32),
                                           jnp.zeros(r.shape, jnp.float32),
                                           inner_tol, maxiter, grid_dim, vdim)
                xh = xh + scale * d32.astype(jnp.float64)
                k = k + ki
            r = b_hat - A64f(xh)
            bn = jnp.maximum(jnp.sqrt(jnp.vdot(b_hat.reshape(-1),
                                               b_hat.reshape(-1))), 1e-300)
            relres = jnp.sqrt(jnp.vdot(r.reshape(-1), r.reshape(-1))) / bn

        u_new = (s * xh).astype(state_dtype)
        return ((u_new, iters_acc + k,
                 jnp.maximum(res_acc, relres.astype(state_dtype))),
                u_new.astype(snap_dtype))

    carry0 = (u0, jnp.asarray(0, jnp.int32), jnp.asarray(0.0, state_dtype))
    (u_f, iters, res), snaps = jax.lax.scan(step, carry0, None, length=num_steps)
    return snaps, iters, res


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
    if prec == "mixed":
        # No f64 inside device scans: emulated-f64 programs compile 10-40×
        # slower and intermittently crash the tunneled TPU worker (see
        # CLAUDE.md).  Implicit stepping is contractive and each step is
        # solved to 1e-6 with a warm start, so a pure-f32 scan holds the
        # trajectory well below the time-discretization error.
        prec = "f32"
    d = mesh.dim
    n = int(np.prod(mesh.node_shape)) * vdim
    maxiter = cfg.resolved_maxiter(n)

    A_np = _combine(K_np, M_np, alpha=theta * dt, beta=1.0)
    B_np = _combine(K_np, M_np, alpha=-(1.0 - theta) * dt, beta=1.0)

    # Scaled, masked implicit operator (zero rhs — we only need the weights,
    # the per-step lift happens inside the scan with precomputed A g).
    if vdim != 1:
        raise NotImplementedError("transient stepping is scalar-field only")
    sysm = prepare_system(A_np, mesh, bc, np.zeros(u0_np.shape), vdim)
    offsets, scaled, s_np, gvals = (sysm.offsets, sysm.weights, sysm.s,
                                    sysm.gvals)
    Ag_np = np_stencil_apply(A_np, gvals, d, vdim)
    free_np = np.asarray(bc.free_mask, dtype=np.float64)
    B_list = [np.asarray(B_np.get(o, np.zeros_like(scaled[i])), dtype=np.float64)
              for i, o in enumerate(offsets)]

    state_dtype = jnp.float64 if prec in ("f64", "mixed") else jnp.float32
    A64 = tuple(jnp.asarray(W, dtype=jnp.float64) for W in scaled) \
        if prec in ("f64", "mixed") else None
    A32 = tuple(jnp.asarray(W, dtype=jnp.float32) for W in scaled) \
        if prec in ("f32", "mixed") else None
    if A32 is not None:
        # The per-step CG dominates the scan; apply it through the Pallas
        # flat-stencil kernel on TPU (_stencil_apply dispatches on the type).
        from pde_solver_tpu.ops.pallas_kernels import (PALLAS_MIN_DOF,
                                                       FlatStencilOperator,
                                                       pallas_enabled)
        if pallas_enabled() and n >= PALLAS_MIN_DOF:
            A32 = FlatStencilOperator(offsets, scaled, mesh.node_shape,
                                      vdim=vdim)
    B_w = tuple(jnp.asarray(W, dtype=state_dtype) for W in B_list)

    inner_tol = cfg.tol if prec == "f64" else cfg.transient_inner_tol
    refine = cfg.transient_refine_rounds if prec == "mixed" else 0
    snap32 = cfg.snapshot_dtype == "f32" and prec != "f64"

    snaps, iters, res = _transient_scan(
        offsets, A32, A64, B_w,
        jnp.asarray(free_np, dtype=state_dtype),
        jnp.asarray(gvals, dtype=state_dtype),
        jnp.asarray(s_np, dtype=state_dtype),
        jnp.asarray(dt * b_source_np, dtype=state_dtype),
        jnp.asarray(Ag_np, dtype=state_dtype),
        jnp.asarray(u0_np, dtype=state_dtype),
        inner_tol, int(num_steps), maxiter, refine, d, vdim, prec, snap32)

    values = np.concatenate(
        [np.asarray(u0_np, dtype=np.float64)[None],
         np.asarray(snaps, dtype=np.float64)], axis=0)
    times = dt * np.arange(num_steps + 1, dtype=np.float64)
    return TransientResult(values=values, times=times,
                           total_cg_iterations=int(iters),
                           max_relative_residual=float(res))
