"""Where do the 90 ms/iter go in the 128^3 transient MG step? (one process)"""
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from pde_solver_tpu.mesh import box_mesh
from pde_solver_tpu.ops import assembly, multigrid as mg
from pde_solver_tpu.ops.bc import DirichletBC
from pde_solver_tpu.ops.linsolve import prepare_system
from pde_solver_tpu.ops.timestepping import _combine
from pde_solver_tpu.ops.pallas_kernels import FlatStencilOperator

def t_block(fn, n=3):
    fn()  # compile+warm
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); jax.block_until_ready(fn()); best = min(best, time.perf_counter()-t0)
    return best

jax.block_until_ready(jnp.zeros(())); print("warm done", flush=True)
cells = 128
mesh = box_mesh(cells, cells, cells, (0,0,0), (1.,1.,1.))
dt = 0.01
t0=time.perf_counter()
K = assembly.assemble_scalar_stencil(mesh, "stiffness")
M = assembly.assemble_scalar_stencil(mesh, "mass")
A_np = _combine(K, M, alpha=dt, beta=1.0)
bc = DirichletBC.from_masks([(mesh.boundary_mask(), 0.0)], mesh.node_shape)
sysm = prepare_system(A_np, mesh, bc, np.zeros(mesh.node_shape), 1)
print(f"assembly+prepare {time.perf_counter()-t0:.1f}s", flush=True)

def A_builder(mesh_c):
    K_c = assembly.assemble_scalar_stencil(mesh_c, "stiffness")
    M_c = assembly.assemble_scalar_stencil(mesh_c, "mass")
    bc_c = DirichletBC.from_masks([(mesh_c.boundary_mask(), 0.0)], mesh_c.node_shape)
    return _combine(K_c, M_c, alpha=dt, beta=1.0), bc_c

t0=time.perf_counter()
h = mg.build_hierarchy(mesh, sysm, A_builder, vdim=1, dtype=jnp.float32)
print(f"hierarchy build {time.perf_counter()-t0:.1f}s levels={len(h.levels)} "
      f"fine_pallas={not isinstance(h.levels[0].weights, tuple)} "
      f"bf16={h.levels[0].w_lo is not None}", flush=True)

# 1. fine apply cost
lv0 = h.levels[0]
x = jnp.asarray(np.random.default_rng(0).standard_normal(mesh.node_shape), jnp.float32)
if not isinstance(lv0.weights, tuple):
    op = lv0.weights
    xf = op.to_flat(x)
    ap = jax.jit(lambda v: op.apply_flat(v))
    print(f"fine Pallas f32 apply_flat: {t_block(lambda: ap(xf))*1e3:.2f} ms", flush=True)
    if lv0.w_lo is not None:
        ap2 = jax.jit(lambda v: lv0.w_lo.apply_flat(v))
        print(f"fine Pallas bf16 apply_flat: {t_block(lambda: ap2(xf))*1e3:.2f} ms", flush=True)

# 2. standalone mg_pcg at fixed iterations
b = jnp.asarray(np.random.default_rng(1).standard_normal(mesh.node_shape), jnp.float32)
for iters in (2, 6):
    def run():
        xh, k, rr = mg.mg_pcg(h, b, jnp.zeros_like(b), 0.0, iters, resync_every=0)
        return xh
    s = t_block(run, n=2)
    print(f"mg_pcg {iters} iters: {s*1e3:.1f} ms -> {s/iters*1e3:.1f} ms/iter", flush=True)

# 3. the real scan, 4 steps
from pde_solver_tpu.models import heat
p = heat.HeatProblem(mesh=mesh, diffusivity=1.0,
                     bc_builder=lambda m: [(m.boundary_mask(), 0.0)],
                     T_initial=20.0, dt=dt, num_steps=4)
t0=time.perf_counter(); _,_,info = heat.solve_heat_problem(p)
print(f"scan4 first(total) {time.perf_counter()-t0:.1f}s scan={info.get('scan_seconds'):.2f}s iters={info['cg_iterations']}", flush=True)
t0=time.perf_counter(); _,_,info = heat.solve_heat_problem(p)
print(f"scan4 second scan={info.get('scan_seconds'):.2f}s iters={info['cg_iterations']} -> {info.get('scan_seconds')/4*1e3:.0f} ms/step", flush=True)
