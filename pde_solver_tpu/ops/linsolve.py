"""Linear-solve facade: stencil system + BC → solution, per precision policy.

One entry point used by every model (heat, elasticity, projections).  Hides
the f64-direct vs f32+refinement choice (``pde_solver_tpu.config``) and
returns float64 grid fields plus :class:`SolveStats`.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pde_solver_tpu.config import SolverConfig, get_config
from pde_solver_tpu.mesh import StructuredMesh
from pde_solver_tpu.ops.bc import DirichletBC
from pde_solver_tpu.ops.cg import SolveStats, pcg, solve_refined
from pde_solver_tpu.ops.stencil import StencilOperator


def _safe_inv(d: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / jnp.where(d == 0, jnp.ones_like(d), d)


def solve_stencil_system(
    stencil_np: Dict,
    mesh: StructuredMesh,
    bc: DirichletBC,
    rhs_np: np.ndarray,
    vdim: int = 1,
    config: Optional[SolverConfig] = None,
    x0: Optional[jnp.ndarray] = None,
) -> Tuple[np.ndarray, SolveStats]:
    """Solve A x = b with Dirichlet symmetric elimination.

    ``stencil_np``: numpy stencil from ``ops.assembly``; ``rhs_np``: the raw
    (unconstrained) load vector.  Returns (x float64 numpy, stats).
    """
    cfg = config or get_config()
    prec = cfg.resolve_precision()
    n = int(np.prod(mesh.node_shape)) * vdim
    maxiter = cfg.resolved_maxiter(n)

    b = jnp.asarray(rhs_np, dtype=jnp.float64)

    if prec == "f64":
        op = StencilOperator.from_numpy(stencil_np, mesh.node_shape, dtype=jnp.float64, vdim=vdim)
        bc64 = bc.astype(jnp.float64)
        apply_c = bc64.constrain_operator(op.apply)
        # Jacobi preconditioner: free-DOF diagonal + 1 on constrained DOFs.
        diag = op.diagonal() * bc64.free_mask + (1.0 - bc64.free_mask)
        bt = bc64.constrain_rhs(op.apply, b)
        x, stats = pcg(apply_c, bt, inv_diag=_safe_inv(diag), tol=cfg.tol,
                       maxiter=maxiter, x0=x0)
        return np.asarray(x, dtype=np.float64), stats

    if prec == "f32":
        op = StencilOperator.from_numpy(stencil_np, mesh.node_shape, dtype=jnp.float32, vdim=vdim)
        bc32 = bc.astype(jnp.float32)
        apply_c = bc32.constrain_operator(op.apply)
        diag = op.diagonal() * bc32.free_mask + (1.0 - bc32.free_mask)
        bt = bc32.constrain_rhs(op.apply, b.astype(jnp.float32))
        x, stats = pcg(apply_c, bt, inv_diag=_safe_inv(diag), tol=max(cfg.inner_tol, 1e-7),
                       maxiter=maxiter, x0=None if x0 is None else x0.astype(jnp.float32))
        return np.asarray(x, dtype=np.float64), stats

    # mixed: f32 inner CG + f64 refinement
    op64 = StencilOperator.from_numpy(stencil_np, mesh.node_shape, dtype=jnp.float64, vdim=vdim)
    op32 = op64.astype(jnp.float32)
    bc64 = bc.astype(jnp.float64)
    bc32 = bc.astype(jnp.float32)
    a64 = bc64.constrain_operator(op64.apply)
    a32 = bc32.constrain_operator(op32.apply)
    diag32 = op32.diagonal() * bc32.free_mask + (1.0 - bc32.free_mask)
    bt = bc64.constrain_rhs(op64.apply, b)
    x, stats = solve_refined(a32, a64, bt, inv_diag32=_safe_inv(diag32),
                             tol=cfg.tol, inner_tol=cfg.inner_tol,
                             maxiter=maxiter, refine_rounds=cfg.refine_rounds, x0=x0)
    return np.asarray(x, dtype=np.float64), stats
