"""SpMV kernel floor decomposition (VERDICT r3: demonstrate where the
measured ms/apply sits relative to its bandwidth and issue floors).

Three Pallas micro-kernels at the flagship shape share the exact blocking /
layout of the production kernel (ops.pallas_kernels):

  full    the production grouped kernel (f32 and bf16 weights, block sweep)
  wonly   streams the SAME weight blocks but does one FMA per block-row
          against a constant tile → pure W-streaming rate (the bandwidth
          floor including the pipeline's real DMA behavior)
  shifts  all shifted-tile reads + accumulate with CONSTANT per-offset
          weights (no W streaming at all) → the VPU issue floor, and a cost
          prototype of a constant-interior (CS-form) kernel

Usage: python benchmarks/kernel_floor.py [nx ny nz reps]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from pde_solver_tpu.mesh import box_mesh
from pde_solver_tpu.models.elasticity import lame_parameters
from pde_solver_tpu.ops import assembly
from pde_solver_tpu.ops.bc import DirichletBC
from pde_solver_tpu.ops.linsolve import prepare_system
from pde_solver_tpu.ops.pallas_kernels import (
    LANE, SUB, FlatStencilOperator, _round_up, _spmv_body, _zero_i)

HBM_GBPS = 819e9  # v5e


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time_apply(fn, operand, x, reps):
    """fn(operand, x) → y.  ``operand`` rides as a jit argument — a closure
    over large device arrays inlines them into the remote-compile request
    (HTTP 413)."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(opv, xx, n):
        def body(_, v):
            y = fn(opv, v)
            return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))
        return jax.lax.fori_loop(0, n, body, xx)

    float(jnp.sum(chain(operand, x, reps)[0, 0, 0]))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(chain(operand, x, reps)[0, 0, 0]))
    return (time.perf_counter() - t0) / reps * 1e3


def _wonly_kernel(nw, rb, w_ref, y_ref):
    acc = None
    for k in range(nw):
        t = w_ref[k].astype(jnp.float32)
        acc = t if acc is None else acc + t
    y_ref[0] = acc


def wonly_ms(op, reps):
    nw = op.n_off * op.vdim * op.vdim
    kernel = functools.partial(_wonly_kernel, nw, op.rb)

    @jax.jit
    def apply_w(Wf):
        return pl.pallas_call(
            kernel,
            grid=(op.n_rows // op.rb,),
            in_specs=[pl.BlockSpec((nw, op.rb, LANE),
                                   lambda i: (_zero_i(i), i, _zero_i(i)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, op.rb, LANE),
                                   lambda i: (_zero_i(i), i, _zero_i(i)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, op.n_rows, LANE), jnp.float32),
            interpret=op.interpret,
        )(Wf)

    float(jnp.sum(apply_w(op.Wf)[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = apply_w(op.Wf)
    float(jnp.sum(r[0, 0, 0]))
    return (time.perf_counter() - t0) / reps * 1e3


def _shifts_kernel(n_off, vdim, rb, halo_r, deltas, wc, interpret,
                   x_ref, y_ref):
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * rb, rb) + halo_r

    def read_rows(b, dr, span):
        q8 = (dr // SUB) * SUB
        rem = dr - q8
        wide = x_ref[b, pl.ds(row0 + q8, _round_up(rem + span, SUB)), :]
        return wide[rem:rem + span]

    class _ConstW:
        """w_ref stand-in returning broadcast scalars (wc in registers)."""

        def __getitem__(self, k):
            return jnp.float32(wc[k])

    _spmv_body(n_off, vdim, rb, halo_r, deltas, interpret, _ConstW(), y_ref,
               read_rows)


def shifts_ms(op, reps):
    rng = np.random.default_rng(0)
    wc = rng.standard_normal(op.n_off * op.vdim * op.vdim) * 0.05
    kernel = functools.partial(_shifts_kernel, op.n_off, op.vdim, op.rb,
                               op.halo_r, op.deltas, tuple(wc), op.interpret)

    @jax.jit
    def apply_s(x_flat):
        x_pad = jnp.pad(x_flat, ((0, 0), (op.halo_r, op.halo_r), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=(op.n_rows // op.rb,),
            in_specs=[pl.BlockSpec((op.vdim, x_pad.shape[1], LANE),
                                   lambda i: (_zero_i(i), _zero_i(i),
                                              _zero_i(i)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((op.vdim, op.rb, LANE),
                                   lambda i: (_zero_i(i), i, _zero_i(i)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((op.vdim, op.n_rows, LANE),
                                           jnp.float32),
            interpret=op.interpret,
        )(x_pad)

    x = jnp.asarray(rng.standard_normal((op.vdim, op.n_rows, LANE)),
                    jnp.float32)
    return _time_apply(lambda _, v: apply_s(v), None, x, reps)


def _residentw_kernel(n_off, vdim, rb, halo_r, deltas, interpret,
                      w_ref, x_ref, y_ref):
    """Per-node-weight FMAs with W RESIDENT in VMEM (constant index map — no
    HBM streaming): the exact per-tile issue cost of a constant-interior /
    class-form kernel that keeps its weight tiles in VMEM.  Output values
    are wrong (every block reuses the same weight tile); timing is what
    matters."""
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * rb, rb) + halo_r

    def read_rows(b, dr, span):
        q8 = (dr // SUB) * SUB
        rem = dr - q8
        wide = x_ref[b, pl.ds(row0 + q8, _round_up(rem + span, SUB)), :]
        return wide[rem:rem + span]

    _spmv_body(n_off, vdim, rb, halo_r, deltas, interpret, w_ref, y_ref,
               read_rows)


def residentw_ms(op, reps):
    nw = op.n_off * op.vdim * op.vdim
    kernel = functools.partial(_residentw_kernel, op.n_off, op.vdim, op.rb,
                               op.halo_r, op.deltas, op.interpret)
    W_tile = op.Wf[:, :op.rb, :]  # one weight block, reused for every output

    @jax.jit
    def apply_r(Wt, x_flat):
        x_pad = jnp.pad(x_flat, ((0, 0), (op.halo_r, op.halo_r), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=(op.n_rows // op.rb,),
            in_specs=[
                pl.BlockSpec((nw, op.rb, LANE),
                             lambda i: (_zero_i(i), _zero_i(i), _zero_i(i)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((op.vdim, x_pad.shape[1], LANE),
                             lambda i: (_zero_i(i), _zero_i(i), _zero_i(i)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((op.vdim, op.rb, LANE),
                                   lambda i: (_zero_i(i), i, _zero_i(i)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((op.vdim, op.n_rows, LANE),
                                           jnp.float32),
            interpret=op.interpret,
        )(Wt, x_pad)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((op.vdim, op.n_rows, LANE)),
                    jnp.float32)
    return _time_apply(lambda Wt, v: apply_r(Wt, v), W_tile, x, reps)


def _csz_kernel(n_off, vdim, rb, halo_r, deltas, wc, dz0, dz64, interpret,
                m_ref, x_ref, y_ref):
    """Constant-interior pass + masked minor-axis (z-face) corrections — the
    exact inner loop of a CS-form kernel for the flagship layout: per
    (o,a,b) THREE scalar FMAs into separate accumulators (interior wc, z=0
    face Δ, z=top face Δ), then two mask multiply-adds at the end.  The
    masks ride as a streamed f32 [2, rb, 128] block (precomputed from
    flat-index mod nz — avoids relying on Mosaic i32 vector rem)."""
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * rb, rb) + halo_r

    def read_rows(b, dr, span):
        q8 = (dr // SUB) * SUB
        rem = dr - q8
        wide = x_ref[b, pl.ds(row0 + q8, _round_up(rem + span, SUB)), :]
        return wide[rem:rem + span]

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (rb, LANE), 1)
    groups = {}
    for o, delta in enumerate(deltas):
        dr = delta // LANE
        dc = delta - LANE * dr
        groups.setdefault(dr, []).append((o, dc))
    masks = {dc: lane_iota < LANE - dc
             for dc in sorted({dc for g in groups.values() for _, dc in g
                               if dc != 0})}
    tiles = [[None] * vdim for _ in range(n_off)]
    for b in range(vdim):
        for dr, members in groups.items():
            span = rb + (1 if any(dc for _, dc in members) else 0)
            A = read_rows(b, dr, span)
            for o, dc in members:
                if dc == 0:
                    tiles[o][b] = A[:rb]
                else:
                    if interpret:
                        B = jnp.roll(A, -dc, axis=1)
                    else:
                        B = pltpu.roll(A, jnp.asarray(LANE - dc, jnp.int32),
                                       axis=1)
                    tiles[o][b] = jnp.where(masks[dc], B[:rb], B[1:])
    acc = [None] * vdim
    az0 = [None] * vdim
    az1 = [None] * vdim
    for o in range(n_off):
        for b in range(vdim):
            xs = tiles[o][b]
            for a in range(vdim):
                k = (o * vdim + a) * vdim + b
                t = jnp.float32(wc[k]) * xs
                acc[a] = t if acc[a] is None else acc[a] + t
                t0 = jnp.float32(dz0[k]) * xs
                az0[a] = t0 if az0[a] is None else az0[a] + t0
                t1 = jnp.float32(dz64[k]) * xs
                az1[a] = t1 if az1[a] is None else az1[a] + t1
    m0 = m_ref[0]
    m1 = m_ref[1]
    for a in range(vdim):
        y_ref[a] = acc[a] + m0 * az0[a] + m1 * az1[a]


def csz_ms(op, nz, reps):
    rng = np.random.default_rng(0)
    nwc = op.n_off * op.vdim * op.vdim
    wc = tuple(rng.standard_normal(nwc) * 0.05)
    dz0 = tuple(rng.standard_normal(nwc) * 0.05)
    dz64 = tuple(rng.standard_normal(nwc) * 0.05)
    kernel = functools.partial(_csz_kernel, op.n_off, op.vdim, op.rb,
                               op.halo_r, op.deltas, wc, dz0, dz64,
                               op.interpret)
    flat = np.arange(op.n_rows * LANE, dtype=np.int64) % nz
    m_np = np.stack([(flat == 0), (flat == nz - 1)]).astype(np.float32)
    m = jnp.asarray(m_np.reshape(2, op.n_rows, LANE))

    @jax.jit
    def apply_c(mm, x_flat):
        x_pad = jnp.pad(x_flat, ((0, 0), (op.halo_r, op.halo_r), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=(op.n_rows // op.rb,),
            in_specs=[
                pl.BlockSpec((2, op.rb, LANE),
                             lambda i: (_zero_i(i), i, _zero_i(i)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((op.vdim, x_pad.shape[1], LANE),
                             lambda i: (_zero_i(i), _zero_i(i), _zero_i(i)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((op.vdim, op.rb, LANE),
                                   lambda i: (_zero_i(i), i, _zero_i(i)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((op.vdim, op.n_rows, LANE),
                                           jnp.float32),
            interpret=op.interpret,
        )(mm, x_pad)

    x = jnp.asarray(rng.standard_normal((op.vdim, op.n_rows, LANE)),
                    jnp.float32)
    return _time_apply(lambda mm, v: apply_c(mm, v), m, x, reps)


def main():
    cells = tuple(int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 \
        else (160, 64, 64)
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 50
    _ = float(jnp.zeros(()))
    mesh = box_mesh(*cells, (0, 0, 0), (1.0, 0.2, 0.2))
    lam, mu = lame_parameters(210e9, 0.3, "3d")
    K = assembly.assemble_elasticity_stencil(mesh, lam, mu)
    bc = DirichletBC.from_masks([(mesh.face_mask(0, 0), 0.0)],
                                mesh.node_shape, vdim=3)
    b = assembly.assemble_vector_load(mesh, np.array([0.0, 0.0, -7.65e4]))
    sysm = prepare_system(K, mesh, bc, b, 3)
    log(f"[floor] {mesh.num_nodes} nodes, {len(sysm.offsets)} offsets")

    rng = np.random.default_rng(0)
    for block in (2048, 4096, 8192):
        for wdt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            op = FlatStencilOperator(sysm.offsets, sysm.weights,
                                     mesh.node_shape, vdim=3, block=block,
                                     weight_dtype=wdt)
            x = op.to_flat(jnp.asarray(sysm.b_hat, jnp.float32))
            ms = _time_apply(lambda opv, v: opv.apply_flat(v), op, x, reps)
            traffic = (op.Wf.size * op.Wf.dtype.itemsize
                       + 2 * 3 * mesh.num_nodes * 4)
            roof = traffic / HBM_GBPS * 1e3
            log(f"[floor] full  {name} block={block}: {ms:.3f} ms "
                f"(roofline {roof:.3f} ms → {roof/ms*100:.0f}%)")
    op = FlatStencilOperator(sysm.offsets, sysm.weights, mesh.node_shape,
                             vdim=3, block=4096)
    ms_w = wonly_ms(op, reps)
    wbytes = op.Wf.size * 4
    log(f"[floor] wonly f32 block=4096: {ms_w:.3f} ms "
        f"({wbytes/1e6:.0f} MB → {wbytes/ms_w/1e6:.0f} GB/s)")
    op16 = FlatStencilOperator(sysm.offsets, sysm.weights, mesh.node_shape,
                               vdim=3, block=4096, weight_dtype=jnp.bfloat16)
    ms_w16 = wonly_ms(op16, reps)
    log(f"[floor] wonly bf16 block=4096: {ms_w16:.3f} ms "
        f"({wbytes/2/1e6:.0f} MB → {wbytes/2/ms_w16/1e6:.0f} GB/s)")
    ms_s = shifts_ms(op, reps)
    log(f"[floor] shifts-only (constant weights): {ms_s:.3f} ms "
        f"— the scalar-weight issue floor")
    ms_r = residentw_ms(op, reps)
    log(f"[floor] resident-W f32 (VMEM weights, no streaming): {ms_r:.3f} ms "
        f"— the per-node-weight CS/class-kernel cost prototype")
    ms_r16 = residentw_ms(op16, reps)
    log(f"[floor] resident-W bf16: {ms_r16:.3f} ms")
    ms_c = csz_ms(op, mesh.node_shape[-1], reps)
    log(f"[floor] cs+z-masked (3 scalar FMA sets + 2 mask FMAs): "
        f"{ms_c:.3f} ms — interior+minor-face CS-kernel cost; a window-Δ "
        f"pass over ~22% rows adds ≈{0.22 * ms_w:.3f} ms (f32) / "
        f"{0.22 * ms_w16:.3f} ms (bf16) of W-touch on top")


if __name__ == "__main__":
    main()
