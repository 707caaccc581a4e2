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


# ======================================================================
# Constant-interior (CS-form) kernel
# ======================================================================
#
# On a translation-invariant mesh the per-node weights carry ~1 scalar of
# information per (offset, a, b) plane (see ops.linsolve.CSOp) — yet the
# dense kernel above spends ~98 % of its time streaming/touching W tiles
# (BENCH_NOTES "kernel floor decomposition": W-streaming-only 1.113 ms of
# the 1.139 ms full f32 apply; shifts-only floor 0.755 ms).  This operator
# eliminates W traffic for the bulk of the grid:
#
#   y = mv ⊙ ( Σ_o wc[o]·shift(x)                  (whole grid, scalar FMAs)
#            + Σ_s m_s ⊙ Σ_o Δ_s[o]·shift(x) )     (masked face/edge sets)
#     + window-Δ pass                              (everything else)
#
# The boundary shells of the two MINOR grid axes scatter through every
# 128-lane row (lanes at flat index ≡ class mod nz, rows drifting per
# plane), so they are folded into the main pass as extra scalar-FMA
# accumulator sets — one per deviating boundary class of the two minor
# axes (the outermost layer deviates from assembly; the next layer from
# the baked-in diagonal scaling of its boundary neighbors) plus one per
# deviating class PAIR (the edge lines) — combined with streamed 0/1 mask
# planes.  The kernel skips zero scalars, so a set costs only its nonzero
# support: the flagship fold measures ~12 full-sweep equivalents.  ``mv``
# is a validity plane pinning the padded tail to exact zero (the flat-io
# CG contract).  All REMAINING deviation — the MAJOR-axis slabs
# (contiguous in flat order: the Dirichlet x-faces of the flagship
# cantilever and every edge/corner interaction involving them) — is
# confined to the 8-row octets containing a violating node; those octets
# (~5 % of rows at the flagship shape) get a second pallas_call that
# streams exact residual weights R = W − model for just those rows,
# reading x at scalar-prefetched row offsets and accumulating into y in
# place.
#
# Exactness: the octet list is BUILT from the violation scan, so every
# node outside the windows satisfies the masked-class model exactly
# (anything else — spatially varying coefficients, folds exceeding the
# effective-sweep budget, tiny grids — returns None → dense fallback).
# Results match the dense kernel to f32 roundoff (the accumulation
# grouping differs, so not bit-identical — tests assert ≤2e-6 relative).

class CSFlatStencilOperator:
    """Constant-interior stencil operator in flat layout.

    Build via :meth:`try_build` (returns ``None`` when the stencil is not
    CS-representable).  Interface mirrors :class:`FlatStencilOperator`:
    ``to_flat`` / ``from_flat`` / ``apply_flat`` / ``apply``.
    """

    # give up when the window pass would cover most rows anyway
    MAX_WINDOW_FRAC = 0.5
    # cap on the EFFECTIVE scalar-FMA sweep count (sets weighted by their
    # nonzero fraction — the kernel skips zero scalars)
    MAX_EFF_SWEEPS = 13.0

    def __init__(self, base: FlatStencilOperator, sets,
                 masks: jnp.ndarray, Wwin: jnp.ndarray,
                 win_octs: jnp.ndarray, n_win: int):
        self.base = base
        self.sets = sets              # ((wc...), (Δ_s...), ...) scalar tuples
        self.masks = masks            # [len(sets), n_rows, 128] f32 0/1
        self.Wwin = Wwin              # [nw, n_win*SUB, 128]
        # [n_win] i32 OCTET indices (row start = oct·SUB).  Octets, not row
        # starts: the BlockSpec index maps then use s[w] verbatim — any
        # arithmetic there (s[w] // SUB) traces its int literal as i64 under
        # this package's global x64, and Mosaic's convert_element_type rule
        # infinitely recurses on i64→i32 (RecursionError at lowering; found
        # on the real chip, invisible in interpret mode).
        self.win_octs = win_octs
        self.n_win = n_win

    # ------------------------------------------------------------------
    @staticmethod
    def _meta_base(offsets, node_shape, vdim, block, interpret,
                   weight_dtype):
        # weight-FREE base: only the layout metadata is needed — packing +
        # uploading the dense Wf (330 MB at the flagship shape) would be
        # pure waste since the CS apply never touches it
        base = FlatStencilOperator.__new__(FlatStencilOperator)
        base._init_meta(offsets, node_shape, vdim, block, interpret, None)
        base.Wf = jnp.zeros((0,), dtype=weight_dtype)
        return base

    @staticmethod
    def _masks_np(descs, node_shape, N, n_pad):
        coords = np.unravel_index(np.arange(N, dtype=np.int64), node_shape)
        m_np = np.zeros((len(descs) + 1, n_pad), np.float32)
        for i, desc in enumerate(descs):
            if desc[0] == "ax":
                _, ax, c = desc
                m_np[i, :N] = coords[ax] == c
            else:
                _, ay, az, cy, cz = desc
                m_np[i, :N] = (coords[ay] == cy) & (coords[az] == cz)
        m_np[len(descs), :N] = 1.0  # validity plane
        return m_np

    @classmethod
    def _from_disk(cls, ent, offsets, node_shape, vdim, block, interpret,
                   weight_dtype):
        base = cls._meta_base(offsets, node_shape, vdim, block, interpret,
                              weight_dtype)
        raw = ent["meta"].get("descs", "")
        descs = []
        for row in (raw.split("|") if raw else []):
            parts = row.split(":")
            descs.append((parts[0],) + tuple(int(x) for x in parts[1:]))
        m_np = cls._masks_np(descs, node_shape, base.N, base.n_pad)
        octs = np.asarray(ent["octs"])
        return cls(base,
                   tuple(tuple(float(v) for v in sv) for sv in ent["sets"]),
                   jnp.asarray(m_np.reshape(-1, base.n_rows, LANE)),
                   jnp.asarray(ent["Wwin"], dtype=weight_dtype),
                   jnp.asarray(octs.astype(np.int32)),
                   int(octs.size))

    @classmethod
    def try_build(cls, offsets, weights_np: Sequence[np.ndarray],
                  node_shape: Tuple[int, ...], vdim: int = 1,
                  block: int = 4096, interpret: bool | None = None,
                  weight_dtype=jnp.float32, cache_key=None):
        d = len(node_shape)
        nz = int(node_shape[-1])
        if d < 2 or nz < 5 or min(int(s) for s in node_shape) < 5:
            return None
        base = cls._meta_base(offsets, node_shape, vdim, block, interpret,
                              weight_dtype)
        if not base.resident:
            # both CS passes keep the whole padded x in VMEM (constant
            # index map); a windowed CS variant is not implemented
            return None
        nw = base.n_off * vdim * vdim
        N, n_rows = base.N, base.n_rows

        # disk fast path: the build's expensive part is the host analysis
        # over [nw, N] f64 planes (~38 s at the flagship shape); the
        # artifacts are tiny (scalar sets + class descriptors + octet list
        # + ~10 MB residual weights), so cache them content-keyed
        dkey = None
        if cache_key is not None:
            from pde_solver_tpu.utils import diskcache
            dkey = ("csop", cache_key, tuple(int(x) for x in node_shape),
                    vdim, block)
            ent = diskcache.load("csop", dkey)
            if ent is not None:
                if ent["meta"].get("refused") == "1":
                    return None
                return cls._from_disk(ent, offsets, node_shape, vdim,
                                      block, interpret, weight_dtype)

        # flat per-plane weights [nw, N] (f64 for exact comparisons)
        planes = np.empty((nw, N), np.float64)
        for o, W in enumerate(weights_np):
            Wf = np.asarray(W, np.float64).reshape(
                N, vdim, vdim) if vdim > 1 else \
                np.asarray(W, np.float64).reshape(N, 1, 1)
            for a in range(vdim):
                for b in range(vdim):
                    planes[(o * vdim + a) * vdim + b] = Wf[:, a, b]

        center = tuple(int(s) // 2 for s in node_shape)
        cflat = int(np.ravel_multi_index(center, node_shape))
        wc = planes[:, cflat].copy()
        # significance floor: composing wc + Δ_class (+ Δ_pair) reproduces
        # the true weights only to f64 rounding; 1e-12·scale is ~4 decades
        # below f32 roundoff, so sub-threshold residues are dropped (they
        # are invisible to the f32 kernel) instead of forcing windows
        tol = 1e-12 * float(np.abs(planes).max())

        # deviating boundary classes of the minor axes (all axes for d == 2,
        # the last two for d >= 3 — major-axis deviations are contiguous in
        # flat order and go to the window pass instead)
        fold_axes = list(range(max(0, d - 2), d))
        axis_deltas = {}          # axis -> [(class, delta[nw])]
        for ax in fold_axes:
            sz = int(node_shape[ax])
            found = []
            for c in sorted({0, 1, sz - 2, sz - 1}):
                rep = list(center)
                rep[ax] = c
                delta = planes[:, int(np.ravel_multi_index(
                    rep, node_shape))] - wc
                if np.any(np.abs(delta) > tol):
                    found.append((c, delta))
            axis_deltas[ax] = found

        # one scalar set per deviating class, plus one per deviating class
        # PAIR (edge lines where both minor axes are boundary)
        sets = [wc]
        pred_descs = []       # ("ax", axis, class) | ("pair", ay, az, cy, cz)
        for ax, found in axis_deltas.items():
            for c, delta in found:
                sets.append(delta)
                pred_descs.append(("ax", ax, c))
        if len(fold_axes) == 2:
            ay, az = fold_axes
            for cy, dy in axis_deltas[ay]:
                for cz, dz in axis_deltas[az]:
                    rep = list(center)
                    rep[ay], rep[az] = cy, cz
                    de = planes[:, int(np.ravel_multi_index(
                        rep, node_shape))] - wc - dy - dz
                    if np.any(np.abs(de) > tol):
                        sets.append(de)
                        pred_descs.append(("pair", ay, az, cy, cz))
        eff = sum(np.count_nonzero(sv) / nw for sv in sets)
        if eff > cls.MAX_EFF_SWEEPS:
            return None

        # masks over the padded flat domain (+ validity plane last)
        n_m = len(pred_descs)
        m_np = cls._masks_np(pred_descs, node_shape, N, base.n_pad)

        # model/residual over the PADDED flat domain, computed IN PLACE
        # (the repeat/broadcast version allocated ~3 GB of temporaries at
        # the flagship shape): resid = planes − mv·(wc + Σ m_i·Δ_i); the
        # tail needs no work (planes and model are both 0 there)
        resid = np.zeros((nw, base.n_pad), np.float64)
        resid[:, :N] = planes
        resid[:, :N] -= wc[:, None]
        for i in range(n_m):
            cols = np.nonzero(m_np[i, :N])[0]
            resid[:, cols] -= sets[1 + i][:, None]
        bad_rows = np.any(np.abs(resid).reshape(nw, n_rows, LANE) > tol,
                          axis=(0, 2))
        if n_rows % SUB:  # never happens: block is a multiple of SUB*LANE
            return None
        bad_oct = np.any(bad_rows.reshape(-1, SUB), axis=1)
        octs = np.nonzero(bad_oct)[0]
        n_win = int(octs.size)
        if n_win == 0 or n_win * SUB > cls.MAX_WINDOW_FRAC * n_rows:
            # all-interior is implausible (boundaries always deviate);
            # near-dense windows defeat the purpose
            if dkey is not None:
                from pde_solver_tpu.utils import diskcache
                diskcache.store("csop", dkey, {}, meta={"refused": "1"})
            return None

        # compact residual weights for the window octets
        Rrows = resid.astype(np.float32).reshape(nw, n_rows, LANE)
        Wwin = np.concatenate([Rrows[:, o * SUB:(o + 1) * SUB, :]
                               for o in octs], axis=1)

        if dkey is not None:
            from pde_solver_tpu.utils import diskcache
            descs = []
            for pr in pred_descs:
                descs.append(":".join(str(x) for x in pr))
            diskcache.store(
                "csop", dkey,
                {"sets": np.asarray(sets, np.float64),
                 "octs": octs.astype(np.int64),
                 "Wwin": Wwin},
                meta={"descs": "|".join(descs)})

        return cls(base,
                   tuple(tuple(float(v) for v in sv) for sv in sets),
                   jnp.asarray(m_np.reshape(n_m + 1, n_rows, LANE)),
                   jnp.asarray(Wwin, dtype=weight_dtype),
                   jnp.asarray(octs.astype(np.int32)),
                   n_win)

    # ------------------------------------------------------------------
    def to_flat(self, x_grid):
        return self.base.to_flat(x_grid)

    def from_flat(self, y_flat):
        return self.base.from_flat(y_flat)

    def apply_flat(self, x_flat: jnp.ndarray) -> jnp.ndarray:
        b = self.base
        x_pad = jnp.pad(x_flat, ((0, 0), (b.halo_r, b.halo_r), (0, 0)))
        y = _cs_main_call(self.masks, x_pad, b.n_off, b.vdim, b.rb,
                          b.halo_r, b.deltas, self.sets, b.interpret)
        return _cs_window_call(self.win_octs, self.Wwin, x_pad, y,
                               b.n_off, b.vdim, b.halo_r, b.deltas,
                               self.n_win, b.interpret)

    def apply(self, x_grid: jnp.ndarray) -> jnp.ndarray:
        return self.from_flat(self.apply_flat(self.to_flat(x_grid)))

    # --- pytree protocol ------------------------------------------------
    def _tree_flatten(self):
        children = (self.base, self.masks, self.Wwin, self.win_octs)
        aux = (self.sets, self.n_win)
        return children, aux

    @classmethod
    def _tree_unflatten(cls, aux, children):
        op = cls.__new__(cls)
        (op.base, op.masks, op.Wwin, op.win_octs) = children
        (op.sets, op.n_win) = aux
        return op


jax.tree_util.register_pytree_node(
    CSFlatStencilOperator,
    lambda op: op._tree_flatten(),
    CSFlatStencilOperator._tree_unflatten,
)


def _cs_read_rows_fn(x_ref, row0):
    def read_rows(b, dr, span):
        q8 = (dr // SUB) * SUB
        rem = dr - q8
        wide = x_ref[b, pl.ds(row0 + q8, _round_up(rem + span, SUB)), :]
        return wide[rem:rem + span]
    return read_rows


def _cs_tiles(n_off, vdim, rb, deltas, interpret, read_rows):
    """Shifted x tiles, shared grouping with _spmv_body (bit-identical
    construction)."""
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
                    B = _roll_lanes(A, dc, interpret)
                    tiles[o][b] = jnp.where(masks[dc], B[:rb], B[1:])
    return tiles


def _cs_main_kernel(n_off, vdim, rb, halo_r, deltas, sets, interpret,
                    m_ref, x_ref, y_ref):
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * rb, rb) + halo_r
    tiles = _cs_tiles(n_off, vdim, rb, deltas, interpret,
                      _cs_read_rows_fn(x_ref, row0))
    n_sets = len(sets)
    # set-major accumulation: one set's accumulators live at a time (an
    # accumulator-major order keeps n_sets·vdim (up to ~72) values live
    # across the whole offset loop — register-spill territory on Mosaic)
    mv = m_ref[n_sets - 1]
    y_out = [None] * vdim
    for si in range(n_sets):
        accs = [None] * vdim
        for o in range(n_off):
            for b in range(vdim):
                xs = tiles[o][b]
                for a in range(vdim):
                    w = sets[si][(o * vdim + a) * vdim + b]
                    if w != 0.0:
                        t = jnp.float32(w) * xs
                        accs[a] = t if accs[a] is None else accs[a] + t
        for a in range(vdim):
            if accs[a] is None:
                continue
            contrib = accs[a] if si == 0 else m_ref[si - 1] * accs[a]
            y_out[a] = contrib if y_out[a] is None \
                else y_out[a] + contrib
    for a in range(vdim):
        y_ref[a] = y_out[a] * mv


@functools.partial(jax.jit,
                   static_argnames=("n_off", "vdim", "rb", "halo_r",
                                    "deltas", "sets", "interpret"))
def _cs_main_call(masks, x_pad, n_off, vdim, rb, halo_r, deltas, sets,
                  interpret):
    n_rows = x_pad.shape[1] - 2 * halo_r
    n_m = len(sets)  # len(sets)-1 class-mask planes + 1 validity plane
    kernel = functools.partial(_cs_main_kernel, n_off, vdim, rb, halo_r,
                               deltas, sets, interpret)
    return pl.pallas_call(
        kernel,
        grid=(n_rows // rb,),
        in_specs=[
            pl.BlockSpec((n_m, rb, LANE),
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
        interpret=interpret,
    )(masks, x_pad)


def _cs_window_kernel(n_off, vdim, halo_r, deltas, interpret,
                      s_ref, w_ref, x_ref, yin_ref, y_ref):
    """One 8-row octet at dynamic octet index s_ref[w] (row start = oct·SUB):
    y = y_in + Σ R·shift(x).

    w_ref holds this octet's residual weights; x reads use the scalar-
    prefetched start (a multiple of SUB by construction) + the aligned-floor
    trick, so every dynamic slice stays tile-aligned.  np.int32 constants:
    bare Python ints in this arithmetic trace as i64 (global x64) and the
    resulting i64→i32 converts crash Mosaic lowering.
    """
    w = pl.program_id(0)
    row0 = pl.multiple_of(s_ref[w] * np.int32(SUB), SUB) + np.int32(halo_r)
    tiles = _cs_tiles(n_off, vdim, SUB, deltas, interpret,
                      _cs_read_rows_fn(x_ref, row0))
    for a in range(vdim):
        acc = yin_ref[a]
        for o in range(n_off):
            for b in range(vdim):
                k = (o * vdim + a) * vdim + b
                acc = acc + w_ref[k].astype(jnp.float32) * tiles[o][b]
        y_ref[a] = acc


@functools.partial(jax.jit,
                   static_argnames=("n_off", "vdim", "halo_r", "deltas",
                                    "n_win", "interpret"),
                   donate_argnums=(3,))
def _cs_window_call(win_octs, Wwin, x_pad, y, n_off, vdim, halo_r,
                    deltas, n_win, interpret):
    nw = n_off * vdim * vdim
    kernel = functools.partial(_cs_window_kernel, n_off, vdim, halo_r,
                               deltas, interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_win,),
        in_specs=[
            pl.BlockSpec((nw, SUB, LANE),
                         lambda w, s: (_zero_i(w), w, _zero_i(w)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vdim, x_pad.shape[1], LANE),
                         lambda w, s: (_zero_i(w), _zero_i(w), _zero_i(w)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vdim, SUB, LANE),
                         lambda w, s: (_zero_i(w), s[w], _zero_i(w)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((vdim, SUB, LANE),
                               lambda w, s: (_zero_i(w), s[w],
                                             _zero_i(w)),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(y.shape, jnp.float32),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(win_octs, Wwin, x_pad, y)


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

