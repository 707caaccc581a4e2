"""Pallas TPU kernels for the hot stencil SpMV.

The stencil operator is applied thousands of times per solve (CG iterations ×
V-cycle levels), so its memory traffic sets the solve time.  The XLA lowering
of the shifted-slice formulation re-reads x per offset and materializes
temporaries; this kernel makes the traffic explicit and minimal:

* operands live in *flat* layout — x as [v, N], weights as [n_off·v·v, N]
  (see ops.linsolve: assembled weights carry exact zeros wherever a flat
  shift would wrap across a grid row, so flat addressing is exact);
* the grid is 1-D over output blocks; each program DMAs one x window
  (block + halo) from HBM into VMEM once and accumulates all
  n_off × v × v contributions from it — x is read ~once, W exactly once:
  traffic ≈ (n_off·v² + 3·v)·N·4 bytes, the ELL-format lower bound.

Used by :class:`FlatStencilOperator`, which `ops.multigrid` and the CG cores
can adopt on TPU; CPU tests run the same kernel in interpreter mode.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _spmv_kernel(n_off: int, vdim: int, block: int, halo: int,
                 deltas: Tuple[int, ...],
                 w_ref, x_hbm, y_ref, x_win, sem):
    """One output block: DMA the x window once, accumulate all offsets.

    w_ref:  [n_off*v*v, block]   VMEM (auto-pipelined by BlockSpec)
    x_hbm:  [v, N + 2*halo]      HBM (windowed manually)
    y_ref:  [v, block]           VMEM
    x_win:  [v, block + 2*halo]  VMEM scratch
    """
    i = pl.program_id(0)
    start = pl.multiple_of(i * block, block)
    dma = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(start, block + 2 * halo)], x_win, sem)
    dma.start()
    dma.wait()
    for a in range(vdim):
        acc = jnp.zeros((block,), jnp.float32)
        for o in range(n_off):
            base = halo + deltas[o]
            for b in range(vdim):
                w = w_ref[(o * vdim + a) * vdim + b, :]
                xs = x_win[b, pl.ds(base, block)]
                acc = acc + w * xs
        y_ref[a, :] = acc


@functools.partial(jax.jit,
                   static_argnames=("n_off", "vdim", "block", "halo",
                                    "deltas", "interpret"))
def _spmv_call(Wf, x_pad, n_off, vdim, block, halo, deltas, interpret):
    n_pad = x_pad.shape[1] - 2 * halo
    grid = (n_pad // block,)
    kernel = functools.partial(_spmv_kernel, n_off, vdim, block, halo, deltas)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_off * vdim * vdim, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((vdim, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vdim, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((vdim, block + 2 * halo), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(Wf, x_pad)


class FlatStencilOperator:
    """Stencil operator in flat layout backed by the Pallas kernel.

    Build once per (stencil, shape); apply many times.  ``apply`` takes and
    returns [v, N] (or [N]) f32 device arrays.
    """

    def __init__(self, offsets, weights_np: Sequence[np.ndarray],
                 node_shape: Tuple[int, ...], vdim: int = 1,
                 block: int = 2048, interpret: bool | None = None):
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
        self.halo = _round_up(max(abs(d) for d in deltas), 128)
        self.block = block
        self.n_pad = _round_up(self.N, block)
        self.deltas = tuple(deltas)
        self.n_off = len(offsets)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret

        # weights → [n_off*v*v, n_pad] f32, flat node order, zero padded
        rows = []
        for W in weights_np:
            Wf = np.asarray(W, np.float32).reshape(self.N, vdim, vdim) \
                if vdim > 1 else np.asarray(W, np.float32).reshape(self.N, 1, 1)
            for a in range(vdim):
                for b in range(vdim):
                    rows.append(Wf[:, a, b])
        Wmat = np.zeros((self.n_off * vdim * vdim, self.n_pad), np.float32)
        Wmat[:, :self.N] = np.stack(rows)
        self.Wf = jnp.asarray(Wmat)

    # ------------------------------------------------------------------
    def to_flat(self, x_grid: jnp.ndarray) -> jnp.ndarray:
        """[*node_shape(,v)] → [v, n_pad] f32."""
        if self.vdim > 1:
            xf = x_grid.reshape(self.N, self.vdim).T
        else:
            xf = x_grid.reshape(1, self.N)
        return jnp.pad(xf.astype(jnp.float32), ((0, 0), (0, self.n_pad - self.N)))

    def from_flat(self, y_flat: jnp.ndarray) -> jnp.ndarray:
        y = y_flat[:, :self.N]
        if self.vdim > 1:
            return y.T.reshape(self.node_shape + (self.vdim,))
        return y.reshape(self.node_shape)

    def apply_flat(self, x_flat: jnp.ndarray) -> jnp.ndarray:
        """x_flat: [v, n_pad] → y [v, n_pad] (tail entries undefined/zero)."""
        x_pad = jnp.pad(x_flat, ((0, 0), (self.halo, self.halo)))
        return _spmv_call(self.Wf, x_pad, self.n_off, self.vdim, self.block,
                          self.halo, self.deltas, self.interpret)

    def apply(self, x_grid: jnp.ndarray) -> jnp.ndarray:
        return self.from_flat(self.apply_flat(self.to_flat(x_grid)))
