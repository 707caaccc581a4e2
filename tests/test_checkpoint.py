"""Transient checkpoint/resume (SURVEY §5): interrupted scans resume from
the persisted carry and reproduce the uninterrupted trajectory bitwise."""

import os

import numpy as np
import pytest

from pde_solver_tpu.config import config_overrides
from pde_solver_tpu.mesh import rectangle_mesh
from pde_solver_tpu.ops import assembly, timestepping
from pde_solver_tpu.ops.bc import DirichletBC, all_boundary
from pde_solver_tpu.ops.timestepping import run_transient


def _problem():
    mesh = rectangle_mesh(12, 10, (0.0, 0.0), (1.0, 1.0))
    K = assembly.assemble_scalar_stencil(mesh, "stiffness")
    M = assembly.assemble_scalar_stencil(mesh, "mass")
    bc = DirichletBC.from_masks([(all_boundary(mesh), 0.0)], mesh.node_shape)
    b = assembly.assemble_load(mesh)
    u0 = np.asarray(bc.apply_values(20.0 * np.ones(mesh.node_shape)))
    return mesh, K, M, bc, b, u0


def test_checkpointed_run_matches_plain(tmp_path):
    mesh, K, M, bc, b, u0 = _problem()
    ref = run_transient(K, M, mesh, bc, b, u0, dt=0.01, num_steps=10)
    with config_overrides(transient_checkpoint_every=4,
                          checkpoint_dir=str(tmp_path)):
        ck = run_transient(K, M, mesh, bc, b, u0, dt=0.01, num_steps=10)
    np.testing.assert_array_equal(ck.values, ref.values)
    assert ck.total_cg_iterations == ref.total_cg_iterations
    assert not os.listdir(tmp_path)  # checkpoint removed on completion


def test_interrupted_run_resumes(tmp_path, monkeypatch):
    mesh, K, M, bc, b, u0 = _problem()
    ref = run_transient(K, M, mesh, bc, b, u0, dt=0.01, num_steps=12)
    monkeypatch.setattr(timestepping, "_CKPT_TEST_ABORT", 1)
    with config_overrides(transient_checkpoint_every=4,
                          checkpoint_dir=str(tmp_path)):
        with pytest.raises(RuntimeError, match="checkpoint test abort"):
            run_transient(K, M, mesh, bc, b, u0, dt=0.01, num_steps=12)
    # one chunk of 4 steps persisted
    files = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    assert len(files) == 1
    with np.load(os.path.join(tmp_path, files[0])) as z:
        assert int(z["step"]) == 4
    # resume and complete
    monkeypatch.setattr(timestepping, "_CKPT_TEST_ABORT", 0)
    with config_overrides(transient_checkpoint_every=4,
                          checkpoint_dir=str(tmp_path)):
        ck = run_transient(K, M, mesh, bc, b, u0, dt=0.01, num_steps=12)
    np.testing.assert_array_equal(ck.values, ref.values)
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".npz")]


def test_checkpoint_key_covers_boundary_values(tmp_path, monkeypatch):
    """A checkpoint from T_boundary=5 must not be resumed by a run with
    T_boundary=7 (the content key covers the lift/BC data)."""
    mesh = rectangle_mesh(12, 10, (0.0, 0.0), (1.0, 1.0))
    K = assembly.assemble_scalar_stencil(mesh, "stiffness")
    M = assembly.assemble_scalar_stencil(mesh, "mass")
    b = assembly.assemble_load(mesh)
    u0 = np.zeros(mesh.node_shape)
    bc5 = DirichletBC.from_masks([(all_boundary(mesh), 5.0)],
                                 mesh.node_shape)
    bc7 = DirichletBC.from_masks([(all_boundary(mesh), 7.0)],
                                 mesh.node_shape)
    ref7 = run_transient(K, M, mesh, bc7, b, u0, dt=0.01, num_steps=8)
    # interrupt a T=5 run, leaving its checkpoint behind
    monkeypatch.setattr(timestepping, "_CKPT_TEST_ABORT", 1)
    with config_overrides(transient_checkpoint_every=4,
                          checkpoint_dir=str(tmp_path)):
        with pytest.raises(RuntimeError, match="checkpoint test abort"):
            run_transient(K, M, mesh, bc5, b, u0, dt=0.01, num_steps=8)
    assert [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    # a T=7 run must ignore it and produce the correct trajectory
    monkeypatch.setattr(timestepping, "_CKPT_TEST_ABORT", 0)
    with config_overrides(transient_checkpoint_every=4,
                          checkpoint_dir=str(tmp_path)):
        ck7 = run_transient(K, M, mesh, bc7, b, u0, dt=0.01, num_steps=8)
    np.testing.assert_array_equal(ck7.values, ref7.values)


def test_resume_with_shorter_target_is_consistent(tmp_path, monkeypatch):
    """A checkpoint ahead of a (shorter) re-request is discarded — the
    result matches the fresh short run with consistent values/times."""
    mesh, K, M, bc, b, u0 = _problem()
    ref2 = run_transient(K, M, mesh, bc, b, u0, dt=0.01, num_steps=2)
    monkeypatch.setattr(timestepping, "_CKPT_TEST_ABORT", 1)
    with config_overrides(transient_checkpoint_every=4,
                          checkpoint_dir=str(tmp_path)):
        with pytest.raises(RuntimeError, match="checkpoint test abort"):
            run_transient(K, M, mesh, bc, b, u0, dt=0.01, num_steps=12)
    monkeypatch.setattr(timestepping, "_CKPT_TEST_ABORT", 0)
    with config_overrides(transient_checkpoint_every=4,
                          checkpoint_dir=str(tmp_path)):
        ck2 = run_transient(K, M, mesh, bc, b, u0, dt=0.01, num_steps=2)
    assert ck2.values.shape[0] == ck2.times.shape[0] == 3
    np.testing.assert_array_equal(ck2.values, ref2.values)
    np.testing.assert_array_equal(ck2.times, ref2.times)


def test_checkpointed_run_applies_snapshot_thinning(tmp_path):
    """The checkpointed path thins snapshots like the plain path — the
    stored trajectory and the on-disk checkpoint stay budget-bounded."""
    mesh, K, M, bc, b, u0 = _problem()
    with config_overrides(snapshot_max_frames=5):
        ref = run_transient(K, M, mesh, bc, b, u0, dt=0.01, num_steps=20)
    with config_overrides(transient_checkpoint_every=8,
                          checkpoint_dir=str(tmp_path),
                          snapshot_max_frames=5):
        ck = run_transient(K, M, mesh, bc, b, u0, dt=0.01, num_steps=20)
    assert ck.values.shape[0] == ref.values.shape[0] <= 7
    np.testing.assert_array_equal(ck.values, ref.values)
    np.testing.assert_array_equal(ck.times, ref.times)
