"""Pallas TPU kernels for the hot stencil SpMV.

The stencil operator is applied thousands of times per solve (CG iterations ×
V-cycle levels), so its memory traffic sets the solve time.  The XLA lowering
of the shifted-slice formulation re-reads x per offset and materializes
temporaries; these kernels make the traffic explicit and minimal.

Layout: operands live in *flat* node order (see ops.linsolve — assembled
weights carry exact zeros wherever a flat shift would wrap across a grid row,
so flat addressing is exact), reinterpreted as 2-D ``[rows, 128]`` tiles:
flat index n = 128·r + c.  A stencil shift by δ decomposes into a row shift
``δ//128`` plus a lane rotation ``δ%128`` — implemented as one static row
slice + one ``pltpu.roll`` + one masked select, all at full 8-sublane VPU
utilization.  (A 1-D formulation leaves 7 of 8 sublanes idle and measures
~4× slower at the 2M-DOF flagship shape.)

* **resident mode** (default whenever x fits VMEM, ≲2.2M DOF f32): the padded
  x lives in VMEM for the whole grid; weights stream through double-buffered
  VMEM blocks.  Traffic ≈ W once + x once + y once — the ELL-format lower
  bound for a per-node-weight SpMV.
* **windowed mode** (fallback for larger N): a 1-D grid over output blocks;
  each program DMAs one x window (block + halo rows) from HBM into VMEM and
  accumulates all contributions from it.

Weights may be stored bfloat16 (``weight_dtype``): products/accumulation stay
f32 on the VPU, halving W traffic.  That is exact enough for the MG
*smoother/preconditioner* path (the V-cycle only needs a fixed SPD operator)
while the outer CG keeps f32 weights for the true residual — see
ops.multigrid.

Used by :class:`FlatStencilOperator`; CPU tests run the same kernels in
interpreter mode.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8  # f32 sublane tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Resident mode needs x_pad + 2 W blocks + y block in VMEM (~16 MB/core).
_RESIDENT_X_BYTES = 9 * 1024 * 1024


def _zero_i(i):
    """Index-map zero constant matching program_id's dtype.  The framework
    enables jax_enable_x64 globally, which would make a bare ``0`` trace as
    i64 while program ids are i32 — Mosaic fails to legalize the mixed-type
    index-map return."""
    return jnp.zeros((), dtype=jnp.int32) if not isinstance(i, int) else 0


def _roll_lanes(A: jnp.ndarray, dc: int, interpret: bool) -> jnp.ndarray:
    """jnp.roll(A, -dc, axis=1) — pltpu.roll when compiled, jnp in interpret
    mode (the Mosaic primitive has no interpreter rule)."""
    if interpret:
        return jnp.roll(A, -dc, axis=1)
    # i32 shift: with jax_enable_x64 a bare int traces as i64, which
    # tpu.dynamic_rotate rejects.
    return pltpu.roll(A, jnp.asarray(LANE - dc, jnp.int32), axis=1)


def _spmv_body(n_off, vdim, rb, halo_r, deltas, interpret,
               w_ref, y_ref, read_rows):
    """Shared accumulation: y[a] = Σ_{o,b} W[o,a,b] ⊙ shift(x[b], δ_o).

    Issue-count optimization (the kernel is VPU-issue-bound, not
    bandwidth-bound — BENCH_NOTES): offsets are grouped by their ROW shift
    so each (group, component) does ONE wide load, shared by every lane
    shift in the group (the 27-point 3D stencil has 9 row groups → 3× fewer
    loads), and the per-``dc`` lane-boundary masks are hoisted and computed
    once instead of per (offset, component).  The FMA accumulation runs in
    the ORIGINAL (o, b, a) order, so results stay bit-identical to the
    ungrouped kernel.
    """
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (rb, LANE), 1)
    # static grouping by row shift
    groups = {}
    for o, delta in enumerate(deltas):
        dr = delta // LANE          # floor (negatives included)
        dc = delta - LANE * dr      # static in [0, 128)
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
                    B = _roll_lanes(A, dc, interpret)
                    tiles[o][b] = jnp.where(masks[dc], B[:rb], B[1:])
    accs = [None] * vdim
    for o in range(n_off):
        for b in range(vdim):
            xs = tiles[o][b]
            for a in range(vdim):
                w = w_ref[(o * vdim + a) * vdim + b].astype(jnp.float32)
                t = w * xs
                accs[a] = t if accs[a] is None else accs[a] + t
    for a in range(vdim):
        y_ref[a] = accs[a]


def _resident_kernel(n_off: int, vdim: int, rb: int, halo_r: int,
                     deltas: Tuple[int, ...], interpret: bool,
                     w_ref, x_ref, y_ref):
    """One output block; x_ref holds the entire padded x in VMEM.

    w_ref: [n_off*v*v, rb, 128]       VMEM (auto-pipelined per block)
    x_ref: [v, n_rows + 2*halo_r, 128] VMEM (constant index map — loaded once)
    y_ref: [v, rb, 128]               VMEM
    """
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * rb, rb) + halo_r

    def read_rows(b, dr, span):
        # dynamic row index at the 8-aligned floor + static sub-slice
        # (Mosaic requires tile-aligned dynamic sublane indices)
        q8 = (dr // SUB) * SUB
        rem = dr - q8
        wide = x_ref[b, pl.ds(row0 + q8, _round_up(rem + span, SUB)), :]
        return wide[rem:rem + span]

    _spmv_body(n_off, vdim, rb, halo_r, deltas, interpret, w_ref, y_ref,
               read_rows)


@functools.partial(jax.jit,
                   static_argnames=("n_off", "vdim", "rb", "halo_r",
                                    "deltas", "interpret"))
def _resident_call(Wf, x_pad, n_off, vdim, rb, halo_r, deltas, interpret):
    n_rows = x_pad.shape[1] - 2 * halo_r
    grid = (n_rows // rb,)
    kernel = functools.partial(_resident_kernel, n_off, vdim, rb, halo_r,
                               deltas, interpret)
    nw = n_off * vdim * vdim
    flops = 2 * nw * n_rows * LANE
    bytes_w = nw * n_rows * LANE * Wf.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nw, rb, LANE),
                         lambda i: (_zero_i(i), i, _zero_i(i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vdim, x_pad.shape[1], LANE),
                         lambda i: (_zero_i(i), _zero_i(i), _zero_i(i)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((vdim, rb, LANE),
                               lambda i: (_zero_i(i), i, _zero_i(i)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vdim, n_rows, LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_w + 8 * vdim * n_rows * LANE,
            transcendentals=0),
        interpret=interpret,
    )(Wf, x_pad)


def _windowed_kernel(n_off: int, vdim: int, rb: int, halo_r: int,
                     deltas: Tuple[int, ...], interpret: bool,
                     w_ref, x_hbm, y_ref, x_win, sem):
    """One output block: DMA the x row-window once, accumulate all offsets.

    w_ref:  [n_off*v*v, rb, 128]        VMEM (auto-pipelined by BlockSpec)
    x_hbm:  [vp, n_rows + 2*halo_r, 128] HBM (windowed manually; vp = v
            padded to a full 8-row tile — DMA slices must be tile-aligned)
    y_ref:  [v, rb, 128]                VMEM
    x_win:  [vp, rb + 2*halo_r, 128]    VMEM scratch
    """
    i = pl.program_id(0)
    start = pl.multiple_of(i * rb, rb)
    dma = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(start, rb + 2 * halo_r), :], x_win, sem)
    dma.start()
    dma.wait()

    def read_rows(b, dr, span):
        base = halo_r + dr  # static — the window already holds the halo
        return x_win[b, base:base + span, :]

    _spmv_body(n_off, vdim, rb, halo_r, deltas, interpret, w_ref, y_ref,
               read_rows)


@functools.partial(jax.jit,
                   static_argnames=("n_off", "vdim", "rb", "halo_r",
                                    "deltas", "interpret"))
def _windowed_call(Wf, x_pad, n_off, vdim, rb, halo_r, deltas, interpret):
    n_rows = x_pad.shape[1] - 2 * halo_r
    grid = (n_rows // rb,)
    vp = _round_up(vdim, SUB)
    if vp != vdim:
        x_pad = jnp.pad(x_pad, ((0, vp - vdim), (0, 0), (0, 0)))
    kernel = functools.partial(_windowed_kernel, n_off, vdim, rb, halo_r,
                               deltas, interpret)
    nw = n_off * vdim * vdim
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nw, rb, LANE),
                         lambda i: (_zero_i(i), i, _zero_i(i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((vdim, rb, LANE),
                               lambda i: (_zero_i(i), i, _zero_i(i)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vdim, n_rows, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((vp, rb + 2 * halo_r, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(Wf, x_pad)


class FlatStencilOperator:
    """Stencil operator in flat layout backed by the Pallas kernels.

    Build once per (stencil, shape); apply many times.  ``apply`` takes and
    returns grid-shaped arrays; ``apply_flat`` works on the packed
    ``[v, rows, 128]`` device layout.  ``weight_dtype=jnp.bfloat16`` halves
    weight traffic (preconditioner-grade accuracy; products and accumulation
    stay f32).
    """

    def __init__(self, offsets, weights_np: Sequence[np.ndarray],
                 node_shape: Tuple[int, ...], vdim: int = 1,
                 block: int = 4096, interpret: bool | None = None,
                 weight_dtype=jnp.float32, resident: bool | None = None):
        self._init_meta(offsets, node_shape, vdim, block, interpret, resident)

        # weights → [n_off*v*v, n_rows, 128], flat node order, zero padded
        rows = []
        for W in weights_np:
            Wf = np.asarray(W, np.float32).reshape(self.N, vdim, vdim) \
                if vdim > 1 else np.asarray(W, np.float32).reshape(self.N, 1, 1)
            for a in range(vdim):
                for b in range(vdim):
                    rows.append(Wf[:, a, b])
        Wmat = np.zeros((self.n_off * vdim * vdim, self.n_pad), np.float32)
        Wmat[:, :self.N] = np.stack(rows)
        self.Wf = jnp.asarray(Wmat.reshape(-1, self.n_rows, LANE),
                              dtype=weight_dtype)

    def _init_meta(self, offsets, node_shape, vdim, block=4096,
                   interpret=None, resident=None):
        # block=4096 (rb=32 rows) measured fastest at the 2M-DOF flagship
        # shape (benchmarks/spmv_bench.py): larger blocks amortize the
        # +1-row/alignment slop of shifted wide loads; 16384 OOMs VMEM.
        self.node_shape = tuple(node_shape)
        self.vdim = vdim
        strides = []
        acc = 1
        for s in reversed(node_shape):
            strides.append(acc)
            acc *= s
        strides = list(reversed(strides))
        self.N = int(np.prod(node_shape))
        deltas = [int(sum(o * st for o, st in zip(off, strides)))
                  for off in offsets]
        # halo in ROW units, multiple of SUB so dynamic row indices stay
        # tile-aligned; +2·SUB slack for the aligned-floor wide loads.
        max_dr = max(abs(d) // LANE + 1 for d in deltas)
        self.halo_r = _round_up(max_dr, SUB) + 2 * SUB
        self.block = _round_up(block, SUB * LANE)
        self.rb = self.block // LANE
        self.n_pad = _round_up(self.N, self.block)
        self.n_rows = self.n_pad // LANE
        self.deltas = tuple(deltas)
        self.n_off = len(offsets)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        if resident is None:
            resident = (self.n_rows + 2 * self.halo_r) * LANE * vdim * 4 \
                <= _RESIDENT_X_BYTES
        self.resident = resident

    def as_weight_dtype(self, weight_dtype) -> "FlatStencilOperator":
        """Same operator with weights cast ON DEVICE — the bf16
        smoother/preconditioner variant without a second host pack or a
        second 330 MB weight upload."""
        op = FlatStencilOperator.__new__(FlatStencilOperator)
        aux = self._tree_flatten()[1]
        (op.node_shape, op.vdim, op.N, op.deltas, op.halo_r, op.block,
         op.rb, op.n_pad, op.n_rows, op.n_off, op.interpret,
         op.resident) = aux
        op.Wf = self.Wf.astype(weight_dtype)
        return op

    # ------------------------------------------------------------------
    def to_flat(self, x_grid: jnp.ndarray) -> jnp.ndarray:
        """[*node_shape(,v)] → [v, n_rows, 128] f32 (zero tail)."""
        if self.vdim > 1:
            xf = x_grid.reshape(self.N, self.vdim).T
        else:
            xf = x_grid.reshape(1, self.N)
        xf = jnp.pad(xf.astype(jnp.float32),
                     ((0, 0), (0, self.n_pad - self.N)))
        return xf.reshape(self.vdim, self.n_rows, LANE)

    def from_flat(self, y_flat: jnp.ndarray) -> jnp.ndarray:
        y = y_flat.reshape(self.vdim, self.n_pad)[:, :self.N]
        if self.vdim > 1:
            return y.T.reshape(self.node_shape + (self.vdim,))
        return y.reshape(self.node_shape)

    def apply_flat(self, x_flat: jnp.ndarray) -> jnp.ndarray:
        """x_flat: [v, n_rows, 128] → y [v, n_rows, 128] (zero tail)."""
        x_pad = jnp.pad(x_flat, ((0, 0), (self.halo_r, self.halo_r), (0, 0)))
        call = _resident_call if self.resident else _windowed_call
        return call(self.Wf, x_pad, self.n_off, self.vdim, self.rb,
                    self.halo_r, self.deltas, self.interpret)

    def apply(self, x_grid: jnp.ndarray) -> jnp.ndarray:
        return self.from_flat(self.apply_flat(self.to_flat(x_grid)))

    # --- pytree protocol: Wf is the only array leaf; everything else is
    # static structure, so jitted solvers can take the operator as an
    # argument (ops.linsolve._stencil_apply dispatches on this type) ------
    def _tree_flatten(self):
        aux = (self.node_shape, self.vdim, self.N, self.deltas, self.halo_r,
               self.block, self.rb, self.n_pad, self.n_rows, self.n_off,
               self.interpret, self.resident)
        return (self.Wf,), aux

    @classmethod
    def _tree_unflatten(cls, aux, children):
        op = cls.__new__(cls)
        (op.node_shape, op.vdim, op.N, op.deltas, op.halo_r, op.block,
         op.rb, op.n_pad, op.n_rows, op.n_off, op.interpret,
         op.resident) = aux
        (op.Wf,) = children
        return op


jax.tree_util.register_pytree_node(
    FlatStencilOperator,
    lambda op: op._tree_flatten(),
    FlatStencilOperator._tree_unflatten,
)


def pallas_enabled() -> bool:
    """Whether MG/CG hot paths should route stencil applies through the
    Pallas kernels (default: on TPU; force with PDE_TPU_PALLAS=0/1)."""
    import os

    env = os.environ.get("PDE_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "off")
    return jax.default_backend() == "tpu"


# Below this DOF count the XLA shifted-slice apply is already cheap and the
# pallas_call fixed overhead dominates — keep small (coarse) levels on XLA.
PALLAS_MIN_DOF = 65536


def pallas_wins(n_dof: int, vdim: int) -> bool:
    """Whether the flat Pallas SpMV beats the XLA shifted-slice apply.

    Measured on the v5e: 1.6-2.2× faster for vdim=3 elasticity at 2M DOF,
    and 1.6× faster for the scalar 15-plane apply at 275k DOF (64³
    transient heat: 7.9 → 12.8 steps/s) — PROVIDED the caller iterates in
    the kernel's flat layout (`_cg_unit_diag`/`mg_pcg` flat-io paths);
    per-iteration grid↔flat conversion erases the scalar win."""
    return pallas_enabled() and n_dof >= PALLAS_MIN_DOF

