"""Pallas flat-stencil kernel correctness (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pde_solver_tpu.mesh import box_mesh, rectangle_mesh
from pde_solver_tpu.ops import assembly
from pde_solver_tpu.ops.bc import DirichletBC, all_boundary
from pde_solver_tpu.ops.linsolve import np_stencil_apply, prepare_system
from pde_solver_tpu.ops.pallas_kernels import FlatStencilOperator


@pytest.mark.parametrize("vdim", [1, 3])
def test_flat_stencil_matches_numpy(vdim):
    mesh = box_mesh(10, 6, 6, (0, 0, 0), (1.0, 0.5, 0.5))
    if vdim == 1:
        K = assembly.assemble_scalar_stencil(mesh, "stiffness")
        bc = DirichletBC.from_masks([(all_boundary(mesh), 2.0)], mesh.node_shape)
        rhs = assembly.assemble_load(mesh)
    else:
        K = assembly.assemble_elasticity_stencil(mesh, 1.3, 0.7)
        bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 0.0)],
                                    mesh.node_shape, vdim=3)
        rhs = assembly.assemble_vector_load(mesh, np.array([0.0, 1.0, -2.0]))
    sysm = prepare_system(K, mesh, bc, rhs, vdim)
    op = FlatStencilOperator(sysm.offsets, sysm.weights, mesh.node_shape,
                             vdim=vdim, block=512, interpret=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(sysm.b_hat.shape).astype(np.float32)
    y = np.asarray(op.apply(jnp.asarray(x)))
    y_ref = np_stencil_apply(dict(zip(sysm.offsets, sysm.weights)),
                             x.astype(np.float64), mesh.dim, vdim)
    rel = np.abs(y - y_ref).max() / max(np.abs(y_ref).max(), 1e-30)
    assert rel < 1e-5, rel  # f32 kernel vs f64 reference


def test_flat_stencil_2d():
    mesh = rectangle_mesh(12, 9, (0, 0), (1.0, 1.0))
    K = assembly.assemble_scalar_stencil(mesh, "mass")
    bc = DirichletBC.from_masks([(all_boundary(mesh), 0.0)], mesh.node_shape)
    sysm = prepare_system(K, mesh, bc, np.zeros(mesh.node_shape), 1)
    op = FlatStencilOperator(sysm.offsets, sysm.weights, mesh.node_shape,
                             vdim=1, block=256, interpret=True)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(mesh.node_shape).astype(np.float32)
    y = np.asarray(op.apply(jnp.asarray(x)))
    y_ref = np_stencil_apply(dict(zip(sysm.offsets, sysm.weights)),
                             x.astype(np.float64), 2, 1)
    assert np.abs(y - y_ref).max() < 1e-5 * np.abs(y_ref).max()


@pytest.mark.slow
def test_mg_solve_through_pallas_interpret(monkeypatch):
    """Full mixed-precision MG F-cycle with the finest level applied through
    the Pallas kernel (interpret mode on CPU) — must match the plain-XLA
    route to solver tolerance."""
    from pde_solver_tpu.config import SolverConfig
    from pde_solver_tpu.models import heat
    from pde_solver_tpu.ops import pallas_kernels

    mesh = box_mesh(16, 16, 16, (0.0, 0.0, 0.0), (1.0, 1.0, 1.0))

    def make():
        return heat.HeatProblem(
            mesh=mesh, diffusivity=1.0,
            bc_builder=lambda m: [(m.face_mask(0, 0), 100.0),
                                  (m.face_mask(0, 1), 0.0)],
            steady=True)

    cfg = SolverConfig(precision="mixed", use_multigrid=True, mg_threshold=100)
    monkeypatch.setenv("PDE_TPU_PALLAS", "1")
    monkeypatch.setattr(pallas_kernels, "PALLAS_MIN_DOF", 1000)
    _, v_pallas, info_p = heat.solve_heat_problem(make(), cfg)
    monkeypatch.setenv("PDE_TPU_PALLAS", "0")
    _, v_xla, info_x = heat.solve_heat_problem(make(), cfg)
    assert info_p["converged"] and info_x["converged"]
    scale = np.abs(v_xla).max()
    assert np.abs(v_pallas - v_xla).max() < 1e-6 * scale


def test_transient_scan_flat_cg_through_pallas_interpret(monkeypatch):
    """Transient scan whose per-step CG iterates in the Pallas flat layout
    (the flat-io `_cg_unit_diag` path) matches the XLA route."""
    from pde_solver_tpu.config import SolverConfig
    from pde_solver_tpu.models import heat
    from pde_solver_tpu.ops import pallas_kernels

    mesh = box_mesh(12, 12, 12, (0.0, 0.0, 0.0), (1.0, 1.0, 1.0))

    def make():
        return heat.HeatProblem(
            mesh=mesh, diffusivity=1.0,
            bc_builder=lambda m: [(m.boundary_mask(), 0.0)],
            T_initial=20.0, dt=0.01, num_steps=4)

    cfg = SolverConfig(precision="f32", transient_inner_tol=1e-8)
    monkeypatch.setenv("PDE_TPU_PALLAS", "1")
    monkeypatch.setattr(pallas_kernels, "PALLAS_MIN_DOF", 100)
    _, v_pallas, _ = heat.solve_heat_problem(make(), cfg)
    monkeypatch.setenv("PDE_TPU_PALLAS", "0")
    _, v_xla, _ = heat.solve_heat_problem(make(), cfg)
    scale = np.abs(v_xla).max()
    assert np.abs(v_pallas - v_xla).max() < 1e-6 * scale


def test_mg_elasticity_through_pallas_interpret(monkeypatch):
    """vdim=3 MG-PCG with the finest level flat (Pallas interpret): the
    flat-layout V-cycle/PCG state path must match the grid-layout route."""
    from pde_solver_tpu.config import SolverConfig
    from pde_solver_tpu.models.elasticity import solve_elasticity_nd
    from pde_solver_tpu.ops import pallas_kernels

    mesh = box_mesh(8, 4, 4, (0.0, 0.0, 0.0), (1.0, 0.25, 0.25))
    g = np.array([0.0, 0.0, -9.81 * 500.0])
    cfg = SolverConfig(precision="mixed", use_multigrid=True, mg_threshold=100)

    monkeypatch.setenv("PDE_TPU_PALLAS", "1")
    monkeypatch.setattr(pallas_kernels, "PALLAS_MIN_DOF", 100)
    v_pallas, info_p = solve_elasticity_nd(mesh, 1e6, 0.3, g, "3d", config=cfg)
    monkeypatch.setenv("PDE_TPU_PALLAS", "0")
    v_xla, info_x = solve_elasticity_nd(mesh, 1e6, 0.3, g, "3d", config=cfg)
    assert info_p["converged"] and info_x["converged"]
    scale = np.abs(v_xla).max()
    assert np.abs(v_pallas - v_xla).max() < 1e-6 * scale


# ---- constant-interior (CS-form) operator ----------------------------------

def _build_cs_case(vdim, cells=(100, 6, 6)):
    # x-extent long enough that the x-slab window octets (1024 nodes each)
    # leave a clean constant interior — mirrors the flagship aspect ratio
    from pde_solver_tpu.ops.pallas_kernels import CSFlatStencilOperator
    mesh = box_mesh(*cells, (0, 0, 0), (1.0, 0.5, 0.5))
    if vdim == 1:
        K = assembly.assemble_scalar_stencil(mesh, "stiffness")
        bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 1.0)],
                                    mesh.node_shape)
        rhs = assembly.assemble_load(mesh)
    else:
        K = assembly.assemble_elasticity_stencil(mesh, 1.3, 0.7)
        bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 0.0)],
                                    mesh.node_shape, vdim=3)
        rhs = assembly.assemble_vector_load(mesh, np.array([0.0, 1.0, -2.0]))
    sysm = prepare_system(K, mesh, bc, rhs, vdim)
    cs = CSFlatStencilOperator.try_build(
        sysm.offsets, sysm.weights, mesh.node_shape, vdim=vdim, block=512,
        interpret=True)
    return mesh, sysm, cs


@pytest.mark.parametrize("vdim", [1, pytest.param(3, marks=pytest.mark.slow)])
def test_cs_flat_matches_dense(vdim):
    """CS kernel (interior scalar pass + masked minor-axis faces + window-Δ
    octets) ≡ the dense flat kernel to f32 roundoff, including the exact
    zero tail the flat-io CG paths rely on."""
    mesh, sysm, cs = _build_cs_case(vdim)
    assert cs is not None, "cantilever stencil must be CS-representable"
    dense = FlatStencilOperator(sysm.offsets, sysm.weights, mesh.node_shape,
                                vdim=vdim, block=512, interpret=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(sysm.b_hat.shape).astype(np.float32)
    yd = np.asarray(dense.apply_flat(dense.to_flat(jnp.asarray(x))))
    yc = np.asarray(cs.apply_flat(cs.to_flat(jnp.asarray(x))))
    scale = max(np.abs(yd).max(), 1e-30)
    assert np.abs(yc - yd).max() < 2e-6 * scale
    # exact zero tail (padded rows beyond N)
    flat = yc.reshape(vdim, -1)
    assert not flat[:, cs.base.N:].any()
    # grid-space parity against the f64 reference too
    y_ref = np_stencil_apply(dict(zip(sysm.offsets, sysm.weights)),
                             x.astype(np.float64), mesh.dim, vdim)
    yg = np.asarray(cs.apply(jnp.asarray(x)))
    assert np.abs(yg - y_ref).max() < 1e-5 * max(np.abs(y_ref).max(), 1e-30)


def test_cs_flat_window_coverage_is_partial():
    """The point of the CS form: the window-Δ pass must cover a strict
    subset of rows (the violating octets), not the whole grid."""
    _, _, cs = _build_cs_case(3)
    assert cs is not None
    assert 0 < cs.n_win * 8 < cs.base.n_rows


def test_cs_flat_refuses_varying_coefficients():
    """Spatially varying weights (composite-core style) are not
    CS-representable — try_build must return None, not build a wrong op."""
    from pde_solver_tpu.ops.pallas_kernels import CSFlatStencilOperator
    mesh = box_mesh(12, 6, 6, (0, 0, 0), (1.0, 0.5, 0.5))
    K = assembly.assemble_scalar_stencil(mesh, "stiffness")
    bc = DirichletBC.from_masks([(all_boundary(mesh), 0.0)], mesh.node_shape)
    sysm = prepare_system(K, mesh, bc, np.zeros(mesh.node_shape), 1)
    rng = np.random.default_rng(3)
    weights = [np.asarray(W) * (1.0 + 0.01 * rng.standard_normal(W.shape))
               for W in sysm.weights]
    cs = CSFlatStencilOperator.try_build(sysm.offsets, weights,
                                         mesh.node_shape, vdim=1, block=512,
                                         interpret=True)
    assert cs is None


@pytest.mark.slow
def test_mg_elasticity_through_cs_interpret(monkeypatch):
    """PDE_TPU_CS=1 routes the finest MG level through the constant-interior
    kernel; the solve must match the dense-pallas route.  Small x-extent
    makes try_build refuse (all-boundary octets) — so use a long bar and
    verify the CS operator was actually selected."""
    from pde_solver_tpu.config import SolverConfig
    from pde_solver_tpu.models.elasticity import solve_elasticity_nd
    from pde_solver_tpu.ops import pallas_kernels

    mesh = box_mesh(60, 4, 4, (0.0, 0.0, 0.0), (1.0, 0.25, 0.25))
    g = np.array([0.0, 0.0, -9.81 * 500.0])
    cfg = SolverConfig(precision="mixed", use_multigrid=True,
                      mg_threshold=100)

    built = []
    orig = pallas_kernels.CSFlatStencilOperator.try_build.__func__

    def spy(cls, *a, **kw):
        op = orig(cls, *a, **kw)
        built.append(op)
        return op

    monkeypatch.setattr(pallas_kernels.CSFlatStencilOperator, "try_build",
                        classmethod(spy))
    monkeypatch.setenv("PDE_TPU_PALLAS", "1")
    monkeypatch.setenv("PDE_TPU_CS", "1")
    monkeypatch.setattr(pallas_kernels, "PALLAS_MIN_DOF", 100)
    v_cs, info_c = solve_elasticity_nd(mesh, 1e6, 0.3, g, "3d", config=cfg)
    assert any(op is not None for op in built), \
        "CS operator must build for the long-bar fine level"
    monkeypatch.setenv("PDE_TPU_CS", "0")
    v_dense, info_d = solve_elasticity_nd(mesh, 1e6, 0.3, g, "3d",
                                          config=cfg)
    assert info_c["converged"] and info_d["converged"]
    scale = np.abs(v_dense).max()
    assert np.abs(v_cs - v_dense).max() < 1e-6 * scale


def test_transient_scan_through_cs_interpret(monkeypatch):
    """PDE_TPU_CS=1 routes the transient per-step CG operator through the
    CS kernel; trajectories must match the dense-pallas route."""
    from pde_solver_tpu.models import heat
    from pde_solver_tpu.ops import pallas_kernels

    mesh = box_mesh(40, 6, 6, (0.0, 0.0, 0.0), (1.0, 0.2, 0.2))
    p = heat.HeatProblem(
        mesh=mesh, diffusivity=1.0,
        bc_builder=lambda m: [(all_boundary(m), 0.0)],
        T_initial=20.0, dt=0.01, num_steps=4)
    monkeypatch.setenv("PDE_TPU_PALLAS", "1")
    monkeypatch.setattr(pallas_kernels, "PALLAS_MIN_DOF", 100)
    monkeypatch.setenv("PDE_TPU_CS", "1")
    _, v_cs, info_c = heat.solve_heat_problem(p)
    monkeypatch.setenv("PDE_TPU_CS", "0")
    _, v_d, info_d = heat.solve_heat_problem(p)
    scale = max(np.abs(v_d).max(), 1e-30)
    assert np.abs(v_cs - v_d).max() < 1e-5 * scale


def test_cs_disk_cache_roundtrip(tmp_path, monkeypatch):
    """CS build artifacts round-trip through the disk cache: the rebuilt
    operator must produce identical results; a recorded refusal must
    short-circuit without re-paying the host scan."""
    monkeypatch.setenv("PDE_TPU_CACHE_DIR", str(tmp_path))
    from pde_solver_tpu.ops.pallas_kernels import CSFlatStencilOperator
    mesh = box_mesh(100, 6, 6, (0, 0, 0), (1.0, 0.5, 0.5))
    K = assembly.assemble_scalar_stencil(mesh, "stiffness")
    bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 1.0)],
                                mesh.node_shape)
    sysm = prepare_system(K, mesh, bc, assembly.assemble_load(mesh), 1)
    key = ("cs-test", 1)
    cs1 = CSFlatStencilOperator.try_build(
        sysm.offsets, sysm.weights, mesh.node_shape, vdim=1, block=512,
        interpret=True, cache_key=key)
    assert cs1 is not None
    # second build hits the disk entry (pass garbage weights to prove the
    # host scan is skipped — the cached artifacts win)
    garbage = [np.zeros_like(np.asarray(W)) for W in sysm.weights]
    cs2 = CSFlatStencilOperator.try_build(
        sysm.offsets, garbage, mesh.node_shape, vdim=1, block=512,
        interpret=True, cache_key=key)
    assert cs2 is not None
    rng = np.random.default_rng(0)
    x = rng.standard_normal(sysm.b_hat.shape).astype(np.float32)
    y1 = np.asarray(cs1.apply_flat(cs1.to_flat(jnp.asarray(x))))
    y2 = np.asarray(cs2.apply_flat(cs2.to_flat(jnp.asarray(x))))
    assert np.array_equal(y1, y2)


def test_static_cg_through_flat_op_interpret(monkeypatch):
    """The static (non-MG) mixed-precision CG path routes through the flat
    Pallas operator at pallas_wins sizes; results must match the XLA
    route (elast2d-class problems were XLA-only before r4)."""
    from pde_solver_tpu.config import SolverConfig
    from pde_solver_tpu.models.elasticity import solve_elasticity_nd
    from pde_solver_tpu.ops import linsolve, pallas_kernels

    mesh = rectangle_mesh(24, 24, (0.0, 0.0), (1.0, 1.0))
    g = np.array([0.0, -9.81 * 500.0])
    cfg = SolverConfig(precision="mixed", use_multigrid=False,
                       host_direct_threshold=0)

    monkeypatch.setenv("PDE_TPU_PALLAS", "1")
    monkeypatch.setattr(pallas_kernels, "PALLAS_MIN_DOF", 100)
    linsolve._FLAT_OP_CACHE.clear()
    v_p, info_p = solve_elasticity_nd(mesh, 1e6, 0.3, g, "plane_stress",
                                      config=cfg)
    assert linsolve._FLAT_OP_CACHE, "flat op must have been built+cached"
    monkeypatch.setenv("PDE_TPU_PALLAS", "0")
    v_x, info_x = solve_elasticity_nd(mesh, 1e6, 0.3, g, "plane_stress",
                                      config=cfg)
    assert info_p["converged"] and info_x["converged"]
    scale = np.abs(v_x).max()
    assert np.abs(v_p - v_x).max() < 1e-6 * scale


def test_fresh_cs_hierarchy_matches_dense_upload(monkeypatch):
    """Fresh compact build (VERDICT r4 item 1): a big translation-invariant
    level built fresh routes through the device-side CS expansion
    (`_flat_op_from_cs_dev`) — its flat weights, bf16 smoother copy, ladder
    (hi, lo) pairs and omega must be BIT-IDENTICAL to the dense host-pack
    upload path (PDE_TPU_FRESH_CS=0)."""
    from pde_solver_tpu.ops import multigrid as mg
    from pde_solver_tpu.ops import pallas_kernels

    mesh = box_mesh(16, 6, 6, (0, 0, 0), (1.0, 0.4, 0.4))
    K = assembly.assemble_elasticity_stencil(mesh, 1.3, 0.7)
    bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 0.0)],
                                mesh.node_shape, vdim=3)
    rhs = assembly.assemble_vector_load(mesh, np.array([0.0, 1.0, -2.0]))
    sysm = prepare_system(K, mesh, bc, rhs, 3)

    def builder(mc):
        return (assembly.assemble_elasticity_stencil(mc, 1.3, 0.7),
                DirichletBC.from_masks([(mc.face_mask(0, 0), 0.0)],
                                       mc.node_shape, vdim=3))

    monkeypatch.setenv("PDE_TPU_PALLAS", "1")
    monkeypatch.setattr(pallas_kernels, "PALLAS_MIN_DOF", 100)
    monkeypatch.setattr(mg, "_CS_LADDER_MIN_BYTES", 1024)
    h_cs = mg.build_hierarchy(mesh, sysm, builder, vdim=3, dtype=jnp.float32)
    lv = h_cs.levels[0]
    assert lv.host_cs is not None and lv.dev_pairs is not None

    monkeypatch.setenv("PDE_TPU_FRESH_CS", "0")
    h_dn = mg.build_hierarchy(mesh, sysm, builder, vdim=3, dtype=jnp.float32)
    lv_d = h_dn.levels[0]
    assert lv_d.host_cs is None and lv_d.dev_pairs is None

    assert np.array_equal(np.asarray(lv.weights.Wf),
                          np.asarray(lv_d.weights.Wf))
    assert lv.w_lo is not None and lv_d.w_lo is not None
    assert np.array_equal(np.asarray(lv.w_lo.Wf), np.asarray(lv_d.w_lo.Wf))
    assert lv.omega == lv_d.omega  # batched λmax pull ≡ sequential estimates

    lad_cs = mg.build_df_ladder(h_cs, sysm, sysm.b_hat)
    lad_dn = mg.build_df_ladder(h_dn, sysm, sysm.b_hat)
    for W_c, W_d in zip(lad_cs.Whi[0], lad_dn.Whi[0]):
        assert np.array_equal(np.asarray(W_c), np.asarray(W_d))
    for W_c, W_d in zip(lad_cs.Wlo[0], lad_dn.Wlo[0]):
        assert np.array_equal(np.asarray(W_c), np.asarray(W_d))
