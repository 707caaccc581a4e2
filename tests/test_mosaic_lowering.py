"""TPU (Mosaic) lowering of every production Pallas kernel, on CPU.

Interpret-mode tests execute the kernel MATH but never run the Mosaic
compiler, so an entire class of real-chip-only failures is invisible to
them: i64 constants leaking into BlockSpec index maps (this package runs
with global x64, and Mosaic's convert_element_type rule infinitely
recurses on i64→i32 — found live as a RecursionError in
``_cs_window_call``'s ``s[w] // SUB`` index map), unsupported dtype casts,
non-legalizable ops.  ``jax.jit(f).trace(...).lower(lowering_platforms=
("tpu",))`` runs the full Mosaic lowering pipeline host-side with no TPU
attached — these tests pin every production kernel through it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pde_solver_tpu.mesh import box_mesh
from pde_solver_tpu.ops import assembly
from pde_solver_tpu.ops.bc import DirichletBC, all_boundary
from pde_solver_tpu.ops.linsolve import prepare_system
from pde_solver_tpu.ops.pallas_kernels import (CSFlatStencilOperator,
                                               FlatStencilOperator)


def _lower_tpu(fn, *args):
    """Trace + Mosaic-lower for TPU; raises on any lowering failure."""
    return jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def _system(vdim):
    mesh = box_mesh(20, 8, 8, (0, 0, 0), (1.0, 0.4, 0.4))
    if vdim == 1:
        K = assembly.assemble_scalar_stencil(mesh, "stiffness")
        bc = DirichletBC.from_masks([(all_boundary(mesh), 0.0)],
                                    mesh.node_shape)
        b = assembly.assemble_load(mesh)
    else:
        K = assembly.assemble_elasticity_stencil(mesh, 1.21e11, 8.08e10)
        bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 0.0)],
                                    mesh.node_shape, vdim=vdim)
        b = assembly.assemble_vector_load(mesh, np.array([0.0, 0.0, -1e4]))
    return mesh, prepare_system(K, mesh, bc, b, vdim)


@pytest.mark.parametrize("vdim", [1, 3])
@pytest.mark.parametrize("wdt", [jnp.float32, jnp.bfloat16])
def test_flat_resident_kernel_lowers_for_tpu(vdim, wdt):
    mesh, sysm = _system(vdim)
    op = FlatStencilOperator(sysm.offsets, sysm.weights, mesh.node_shape,
                             vdim=vdim, block=512, interpret=False,
                             weight_dtype=wdt, resident=True)
    x = op.to_flat(jnp.asarray(sysm.b_hat, jnp.float32))
    _lower_tpu(lambda o, xf: o.apply_flat(xf), op, x)


@pytest.mark.parametrize("vdim", [1, 3])
def test_flat_windowed_kernel_lowers_for_tpu(vdim):
    mesh, sysm = _system(vdim)
    op = FlatStencilOperator(sysm.offsets, sysm.weights, mesh.node_shape,
                             vdim=vdim, block=512, interpret=False,
                             resident=False)
    x = op.to_flat(jnp.asarray(sysm.b_hat, jnp.float32))
    _lower_tpu(lambda o, xf: o.apply_flat(xf), op, x)


@pytest.mark.parametrize("vdim", [1, 3])
def test_cs_kernels_lower_for_tpu(vdim):
    """Both CS passes: the scalar-FMA main kernel and the dynamic-octet
    window kernel (scalar-prefetch index maps — the live RecursionError)."""
    mesh, sysm = _system(vdim)
    # default block=4096: smaller blocks push the window fraction past the
    # builder's MAX_WINDOW_FRAC refusal on this small grid
    cs = CSFlatStencilOperator.try_build(sysm.offsets, sysm.weights,
                                         mesh.node_shape, vdim=vdim,
                                         interpret=False)
    assert cs is not None, "uniform-coefficient system must be CS-foldable"
    assert cs.n_win > 0
    assert cs.win_octs.dtype == jnp.int32
    x = cs.to_flat(jnp.asarray(sysm.b_hat, jnp.float32))
    _lower_tpu(lambda o, xf: o.apply_flat(xf), cs, x)
