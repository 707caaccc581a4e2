"""Per-round relres/time curve of solve_fcycle_df at bench scale; sweep inner_iters."""
import time, numpy as np, jax, jax.numpy as jnp
from pde_solver_tpu.mesh import box_mesh
from pde_solver_tpu.ops import assembly, multigrid as mg, df32
from pde_solver_tpu.ops.bc import DirichletBC
from pde_solver_tpu.ops.linsolve import prepare_system
from pde_solver_tpu.ops.multigrid import (_jit_ascend_df, _jit_restrict_hat64,
                                          build_df_ladder)
from pde_solver_tpu.ops.df32 import jit_df_residual, jit_df_update

t0=time.time()
mesh = box_mesh(160, 64, 64, (0,0,0), (1.0, 0.2, 0.2))
lam, mu = 1.21e11, 8.08e10
K = assembly.assemble_elasticity_stencil(mesh, lam, mu)
bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 0.0)], mesh.node_shape, vdim=3)
b = assembly.assemble_vector_load(mesh, np.array([0.0, 0.0, -7.65e4]))
sysm = prepare_system(K, mesh, bc, b, 3)
def builder(mc):
    return (assembly.assemble_elasticity_stencil(mc, lam, mu),
            DirichletBC.from_masks([(mc.face_mask(0, 0), 0.0)], mc.node_shape, vdim=3))
h = mg.build_hierarchy(mesh, sysm, builder, vdim=3, dtype=jnp.float32)
ladder = build_df_ladder(h, sysm, sysm.b_hat)
print(f"setup {time.time()-t0:.0f}s, levels={len(h.levels)}", flush=True)

d, vdim = h.grid_dim, h.vdim
L = len(h.levels) - 1
host_Ainv = h.levels[-1].host_Ainv
def h_struct_from(m):
    return (tuple(lv.offsets for lv in h.levels[m:]),
            tuple(lv.omega for lv in h.levels[m:]),
            d, vdim, h.pre_smooth, h.post_smooth, h.coarse_iters)
def level_arrays_from(m):
    return tuple((lv.weights, lv.free, lv.s, lv.C, lv.Cinv, lv.Ainv)
                 for lv in h.levels[m:])
bnorm = float(np.sqrt(float(jnp.vdot(ladder.bhi0.reshape(-1), ladder.bhi0.reshape(-1)))))
offsets0 = h.levels[0].offsets

def run(inner_iters, n_corr0, n_corr, max_rounds, label):
    x_hi = jnp.zeros_like(ladder.bhi0); x_lo = jnp.zeros_like(ladder.bhi0)
    t_start = time.time(); total = 0
    for rnd in range(max_rounds):
        r32, rnorm2 = jit_df_residual(offsets0, ladder.Whi[0], ladder.Wlo[0],
                                      ladder.bhi0, ladder.blo0, x_hi, x_lo, d, vdim)
        relres = float(np.sqrt(float(rnorm2))) / bnorm
        print(f"  [{label}] round {rnd}: relres={relres:.2e}  t={time.time()-t_start:.2f}s  iters={total}", flush=True)
        if relres <= 1e-8 or not np.isfinite(relres): break
        rs = [r32]
        for m in range(L):
            rs.append(_jit_restrict_hat64(ladder.scale32[m], ladder.scale32[m+1],
                                          ladder.free32[m+1], rs[m], d))
        rL = np.asarray(rs[L], dtype=np.float64)
        e = jnp.asarray((host_Ainv @ rL.reshape(-1)).reshape(rL.shape), dtype=jnp.float32)
        for m in range(L-1, -1, -1):
            e, k = _jit_ascend_df(h_struct_from(m), level_arrays_from(m),
                                  ladder.Whi[m], ladder.Wlo[m],
                                  ladder.scale32[m], ladder.scale32[m+1],
                                  ladder.free32[m], rs[m], e, inner_iters,
                                  n_corr0 if m == 0 else n_corr)
            total += int(k)
        x_hi, x_lo = jit_df_update(x_hi, x_lo, jnp.asarray(1.0, jnp.float32), e)
    return

run(14, 1, 2, 14, "base i14 c1/2")
run(24, 1, 2, 8,  "i24 c1/2")
run(14, 2, 2, 8,  "i14 c2/2")
