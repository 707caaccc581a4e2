"""Tunnel-aware trajectory fetch (VERDICT r4 item 4): over-budget pulls are
thinned on device to the plot frame cap and cast to bf16; times stay aligned
with the kept frames; full precision remains available on request."""

import numpy as np

from pde_solver_tpu.config import config_overrides
from pde_solver_tpu.mesh import rectangle_mesh
from pde_solver_tpu.models import heat


def _problem(num_steps):
    mesh = rectangle_mesh(12, 10, (0.0, 0.0), (1.0, 1.0))
    return heat.HeatProblem(
        mesh=mesh, diffusivity=1.0,
        bc_builder=lambda m: [(m.face_mask(0, 0), 20.0),
                              (m.face_mask(0, 1), 0.0)],
        T_initial=5.0, dt=0.01, num_steps=num_steps)


def test_fetch_thinning_matches_full_trajectory():
    p = _problem(40)
    times_full, values_full, _ = heat.solve_heat_problem(p)
    assert values_full.shape[0] == 41
    # force the over-budget path: tiny budget, keep ≤10 frames
    with config_overrides(fetch_budget_bytes=1, fetch_frames=10):
        times_th, values_th, info = heat.solve_heat_problem(p)
    # u0 exact + ≤ fetch_frames+1 kept frames, last frame present
    assert values_th.shape[0] <= 12
    assert times_th[0] == 0.0 and np.isclose(times_th[-1], times_full[-1])
    # every kept frame matches the full trajectory at its time to bf16 grade
    for t, v in zip(times_th, values_th):
        j = int(np.argmin(np.abs(times_full - t)))
        assert np.isclose(times_full[j], t)
        ref = values_full[j]
        assert np.abs(v - ref).max() <= 8e-3 * max(np.abs(ref).max(), 1e-30)


def test_fetch_cast_only_when_few_frames():
    """Over budget in f32 but the bf16 payload FITS → cast only, no thin
    (the budget binds the kept-frame count since the r5 xl rehearsal)."""
    p = _problem(6)
    times_full, values_full, _ = heat.solve_heat_problem(p)
    # budget: above the bf16 payload (half the f32 bytes), below f32
    bf16_total = 2 * values_full.size  # snaps ⊆ values; generous bound
    with config_overrides(fetch_budget_bytes=3 * bf16_total // 2,
                          fetch_frames=30):
        times_th, values_th, _ = heat.solve_heat_problem(p)
    assert values_th.shape == values_full.shape
    assert np.allclose(times_th, times_full)
    scale = np.abs(values_full).max()
    assert np.abs(values_th - values_full).max() <= 8e-3 * scale
    assert np.abs(values_th - values_full).max() > 0  # bf16 actually engaged


def test_fetch_full_precision_by_default_at_small_sizes():
    p = _problem(8)
    times_a, values_a, _ = heat.solve_heat_problem(p)
    with config_overrides(fetch_budget_bytes=0):  # explicit full-precision
        times_b, values_b, _ = heat.solve_heat_problem(p)
    assert np.array_equal(values_a, values_b)


def test_fetch_budget_binds_below_frame_cap():
    """When even fetch_frames bf16 frames exceed the budget, thinning goes
    deeper until the payload fits (never below 2 kept frames)."""
    p = _problem(40)
    times_full, values_full, _ = heat.solve_heat_problem(p)
    nodes = values_full.shape[1]
    # budget for ~4 bf16 frames
    with config_overrides(fetch_budget_bytes=4 * nodes * 2 + 1,
                          fetch_frames=30):
        times_th, values_th, _ = heat.solve_heat_problem(p)
    assert values_th.shape[0] <= 6  # u0 + ≤4 kept + possible last append
    assert np.isclose(times_th[-1], times_full[-1])
    for t, v in zip(times_th, values_th):
        j = int(np.argmin(np.abs(times_full - t)))
        assert np.isclose(times_full[j], t)
        ref = values_full[j]
        assert np.abs(v - ref).max() <= 8e-3 * max(np.abs(ref).max(), 1e-30)
