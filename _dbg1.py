import time, numpy as np, jax, jax.numpy as jnp
from pde_solver_tpu.mesh import box_mesh
from pde_solver_tpu.ops import assembly, multigrid as mg
from pde_solver_tpu.ops.bc import DirichletBC
from pde_solver_tpu.ops.linsolve import prepare_system, _jit_residual64, _jit_axpy64, _jit_cg, _stencil_apply
from pde_solver_tpu.models.elasticity import lame_parameters
from functools import partial

lam_, mu_ = lame_parameters(210e9, 0.3, "3d")
mesh = box_mesh(160, 64, 64, (0,0,0), (1.0,0.2,0.2))
K = assembly.assemble_elasticity_stencil(mesh, lam_, mu_)
bc = DirichletBC.from_masks([(mesh.face_mask(0,0), 0.0)], mesh.node_shape, vdim=3)
b = assembly.assemble_vector_load(mesh, np.array([0,0,-9.81*7800.0]))
sysm = prepare_system(K, mesh, bc, b, 3)
def builder(mc):
    return (assembly.assemble_elasticity_stencil(mc, lam_, mu_),
            DirichletBC.from_masks([(mc.face_mask(0,0), 0.0)], mc.node_shape, vdim=3))
h = mg.build_hierarchy(mesh, sysm, builder, vdim=3, dtype=jnp.float32)
print("levels:", len(h.levels), "omegas:", [f"{lv.omega:.3f}" for lv in h.levels])
w64 = tuple(jnp.asarray(W, dtype=jnp.float64) for W in sysm.weights)
w32f = h.levels[0].weights
b64 = jnp.asarray(sysm.b_hat)
bnorm2 = float(np.vdot(sysm.b_hat.reshape(-1), sysm.b_hat.reshape(-1)))

@partial(jax.jit, static_argnames=("offsets",))
def true_res32(offsets, w32, r32, d32):
    rho = r32 - _stencil_apply(offsets, w32, d32, 3, 3)
    return (jnp.linalg.norm(rho.reshape(-1)) / jnp.linalg.norm(r32.reshape(-1)))

x64 = jnp.zeros_like(b64)
for rnd in range(4):
    r32, rnorm2, s = _jit_residual64(sysm.offsets, w64, b64, x64, 3, 3)
    relres = float(np.sqrt(float(rnorm2)/bnorm2))
    d32, k, relrec = mg.solve_mg(h, r32, None, 1e-6, 300)
    tr = float(true_res32(sysm.offsets, w32f, r32, d32))
    print(f"round {rnd}: f64 relres={relres:.3e} | inner iters={int(k)} recursive={float(relrec):.2e} true_f32={tr:.2e}")
    x64 = _jit_axpy64(x64, s, d32)
