"""Constant-interior stencil operator (CSOp): bitwise equality with the
dense per-node weight apply, and dense fallback for varying coefficients.

CSOp (constant interior weights + exact thickness-2 boundary slabs) is the
compressed weight representation for the Pallas flat-stencil kernels; it is
deliberately NOT wired into the XLA solve paths (measured: no speedup under
XLA fusion — see ops/linsolve.py CSOp docstring and BENCH_NOTES.md).
"""

import numpy as np
import jax.numpy as jnp

from pde_solver_tpu.mesh import box_mesh
from pde_solver_tpu.ops import assembly
from pde_solver_tpu.ops.bc import DirichletBC, all_boundary
from pde_solver_tpu.ops.linsolve import (_stencil_apply, make_cs_op,
                                         prepare_system)


def _scalar_system():
    mesh = box_mesh(10, 8, 6, (0, 0, 0), (1.0, 0.8, 0.6))
    K = assembly.assemble_scalar_stencil(mesh, "stiffness")
    bc = DirichletBC.from_masks([(all_boundary(mesh), 0.0)], mesh.node_shape)
    b = assembly.assemble_load(mesh)
    return mesh, prepare_system(K, mesh, bc, b, 1)


def _block_system():
    mesh = box_mesh(12, 6, 6, (0, 0, 0), (1.0, 0.2, 0.2))
    K = assembly.assemble_elasticity_stencil(mesh, 1.21e11, 8.08e10)
    bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 0.0)],
                                mesh.node_shape, vdim=3)
    b = assembly.assemble_vector_load(mesh, np.array([0.0, 0.0, -7.65e4]))
    return mesh, prepare_system(K, mesh, bc, b, 3)


def test_cs_apply_matches_dense_scalar():
    mesh, sysm = _scalar_system()
    cs = make_cs_op(sysm.offsets, sysm.weights, 3, 1, jnp.float64)
    assert cs is not None  # uniform κ → translation-invariant interior
    x = np.random.default_rng(1).standard_normal(mesh.node_shape)
    dense = tuple(jnp.asarray(W) for W in sysm.weights)
    y_d = np.asarray(_stencil_apply(sysm.offsets, dense, jnp.asarray(x), 3, 1))
    y_c = np.asarray(_stencil_apply(sysm.offsets, cs, jnp.asarray(x), 3, 1))
    assert np.array_equal(y_d, y_c)


def test_cs_apply_matches_dense_block():
    # The CS apply expands the 3x3 block product into scalar multiplies, which
    # changes the accumulation order vs the dense batched-einsum path — exact
    # to a few ulps, not bitwise.  (Scalar stencils keep bitwise equality; see
    # test_cs_apply_matches_dense_scalar.)
    mesh, sysm = _block_system()
    for dtype in (jnp.float64, jnp.float32):
        cs = make_cs_op(sysm.offsets, sysm.weights, 3, 3, dtype)
        assert cs is not None
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal(mesh.node_shape + (3,)),
            dtype=dtype)
        dense = tuple(jnp.asarray(W, dtype=dtype) for W in sysm.weights)
        y_d = np.asarray(_stencil_apply(sysm.offsets, dense, x, 3, 3))
        y_c = np.asarray(_stencil_apply(sysm.offsets, cs, x, 3, 3))
        tol = 16 * np.finfo(np.dtype(dtype)).eps
        scale = np.max(np.abs(y_d))
        assert np.allclose(y_d, y_c, rtol=tol, atol=tol * scale), dtype


def test_cs_fallback_for_varying_coefficients():
    mesh = box_mesh(8, 8, 8, (0, 0, 0), (1.0, 1.0, 1.0))
    coeff = np.random.default_rng(3).uniform(
        1.0, 2.0, size=(len(mesh.subelems),) + mesh.n_cells)
    K = assembly.assemble_scalar_stencil(mesh, "stiffness", cell_coeff=coeff)
    bc = DirichletBC.from_masks([(all_boundary(mesh), 0.0)], mesh.node_shape)
    sysm = prepare_system(K, mesh, bc, assembly.assemble_load(mesh), 1)
    assert make_cs_op(sysm.offsets, sysm.weights, 3, 1, jnp.float64) is None


def test_cs_fallback_for_tiny_grids():
    mesh = box_mesh(2, 2, 2, (0, 0, 0), (1.0, 1.0, 1.0))
    K = assembly.assemble_scalar_stencil(mesh, "stiffness")
    bc = DirichletBC.from_masks([(all_boundary(mesh), 0.0)], mesh.node_shape)
    sysm = prepare_system(K, mesh, bc, assembly.assemble_load(mesh), 1)
    assert make_cs_op(sysm.offsets, sysm.weights, 3, 1, jnp.float64) is None
