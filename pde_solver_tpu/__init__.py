"""pde_solver_tpu — a TPU-native PDE-solving framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``ziyu0425/PDE-Solver`` stack (natural-language heat / linear-elasticity FEM
solving with interactive visualization).  The reference delegates all numerics
to FEniCS/DOLFIN + PETSc (C++/C); here the solve core is a structured-mesh P1
finite-element library built for TPUs:

* structured simplicial meshes with closed-form connectivity
  (``pde_solver_tpu.mesh``) matching DOLFIN's Interval/Rectangle/Box meshes,
* stencil-form operators assembled by vectorized slice-adds
  (``pde_solver_tpu.ops.assembly``),
* matrix-free Jacobi-preconditioned CG with float64 iterative refinement
  (``pde_solver_tpu.ops.cg``),
* jit-compiled backward-Euler / Crank-Nicolson stepping via ``lax.scan``
  (``pde_solver_tpu.ops.timestepping``),
* Pallas TPU kernels for the hot stencil ops (``pde_solver_tpu.ops.pallas_kernels``),
* multi-chip domain decomposition over ``jax.sharding.Mesh``
  (``pde_solver_tpu.parallel``).

The public tool API (``pde_solver_tpu.api``) mirrors the reference MCP tool
surface exactly (same names, signatures, defaults and result metadata) so that
the agent layer routes queries unchanged.
"""

import os as _os

import jax

# The framework uses explicit dtypes everywhere; x64 is enabled so float64
# residual/refinement passes are available (TPU emulates f64 — used only for
# occasional high-precision steps, never the hot path).
jax.config.update("jax_enable_x64", True)

# Honor JAX_PLATFORMS=cpu even under TPU plugins that ignore the env var
# (the axon plugin initializes its tunnel regardless, blocking entry points
# like `python app.py --cli` for minutes): mirror the env var into the
# config knob before any backend initializes.
if _os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: OFF by default.  On the axon-tunneled
# TPU a cache *hit* ships the serialized executable to the device server at
# ~50 KB/s — far slower than recompiling.  The framework instead keeps every
# jitted program small (see ops.linsolve).  Opt in with
# PDE_TPU_COMPILE_CACHE=/path when running on directly-attached hardware.
_cache_dir = _os.environ.get("PDE_TPU_COMPILE_CACHE")
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs — not fatal
        pass

__version__ = "0.1.0"

from pde_solver_tpu.schema import PDEParameters  # noqa: E402,F401
from pde_solver_tpu.fields import TimeSeriesField, SolveResult, PlotResult  # noqa: E402,F401
