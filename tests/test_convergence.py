"""Convergence-verdict reporting: explicit targets in SolveStats, and the
non-convergence warning surfaced through the dispatcher summary
(VERDICT r2 weak #4)."""

import numpy as np
import pytest

from pde_solver_tpu.config import config_overrides, get_config
from pde_solver_tpu.mesh import box_mesh
from pde_solver_tpu.ops import assembly
from pde_solver_tpu.ops.bc import DirichletBC, all_boundary
from pde_solver_tpu.ops.linsolve import solve_stencil_system
from pde_solver_tpu.schema import PDEParameters


def _system():
    mesh = box_mesh(8, 8, 8, (0, 0, 0), (1.0, 1.0, 1.0))
    K = assembly.assemble_scalar_stencil(mesh, "stiffness")
    bc = DirichletBC.from_masks([(all_boundary(mesh), 0.0)], mesh.node_shape)
    b = assembly.assemble_load(mesh)
    return mesh, K, bc, b


def test_forced_nonconvergence_is_reported():
    mesh, K, bc, b = _system()
    with config_overrides(maxiter=1, host_direct_threshold=0):
        x, stats = solve_stencil_system(K, mesh, bc, b)
    assert bool(stats.converged) is False
    assert stats.target is not None and stats.target > 0
    assert float(stats.relative_residual) > stats.target


def test_converged_solve_reports_target():
    mesh, K, bc, b = _system()
    with config_overrides(host_direct_threshold=0):
        x, stats = solve_stencil_system(K, mesh, bc, b)
    assert bool(stats.converged) is True
    # the verdict used max(requested tol, accuracy contract)
    cfg = get_config()
    assert stats.target == max(cfg.tol, cfg.accuracy_target)
    assert float(stats.relative_residual) <= stats.target


def _summary(converged):
    from pde_solver_tpu.agents.dispatcher_agent import DispatcherAgent

    params = PDEParameters(pde_type="heat", dim=2)
    solver_result = {
        "data_file": "data/x.pkl", "dim": 2,
        "meta": {"solver_stats": {
            "converged": converged, "relative_residual": 3.2e-3,
            "convergence_target": 1e-6, "cg_iterations": 1}},
    }
    plot_result = {"html_path": "plots/x.html"}
    return DispatcherAgent._generate_summary(params, solver_result,
                                             plot_result)


def test_summary_warns_on_nonconvergence():
    s = _summary(False)
    assert "WARNING" in s and "did NOT reach" in s
    assert "3.2" in s  # the achieved residual is shown


def test_summary_silent_when_converged():
    assert "WARNING" not in _summary(True)
