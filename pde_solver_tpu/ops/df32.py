"""Double-float32 (double-word) arithmetic for near-f64 accuracy at f32 speed.

TPU float64 is software-emulated and ~50-100× slower than f32 for the
element-wise stencil work this framework runs; the mixed-precision solvers
only need f64-grade accuracy in ONE place — evaluating the defect
r = b − A x, where ~7 significant digits cancel.  Double-float arithmetic
(error-free transformations: TwoSum + Dekker-split TwoProd) represents each
quantity as an unevaluated pair (hi, lo) of float32 and computes the
cancellation exactly using only native f32 VPU ops — ~12× the f32 op count
instead of the ~500× of emulated f64, and no double-precision weight uploads
(the f64 operator is stored as a (hi, lo) f32 pair, same total bytes).

Effective precision of the pair ≈ 2^-48 ≈ 4e-15 relative — indistinguishable
from f64 for the refinement residuals.

References: Dekker (1971), Knuth TAOCP §4.2.2; the same technique long used
for double-double on GPUs, applied here to the TPU's f32-only fast path.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Offset = Tuple[int, ...]

# Dekker splitting constant for float32 (24-bit mantissa): 2^12 + 1.
_SPLIT = jnp.float32(4097.0)


def two_sum(a, b):
    """Error-free a + b = s + e with |e| ≤ ulp(s)/2 (Knuth)."""
    s = a + b
    bv = s - a
    e = (a - (s - bv)) + (b - bv)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| ≥ |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a·b = p + e via Dekker splitting (no FMA required)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_from_f64(x64: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host: split float64 into an (hi, lo) float32 pair."""
    hi = np.asarray(x64, dtype=np.float32)
    lo = np.asarray(x64 - hi.astype(np.float64), dtype=np.float32)
    return hi, lo


def df_to_f64(hi, lo) -> np.ndarray:
    return np.asarray(hi, dtype=np.float64) + np.asarray(lo, dtype=np.float64)


def df_add(a_hi, a_lo, b_hi, b_lo):
    """(a + b) as a normalized pair."""
    s, e = two_sum(a_hi, b_hi)
    e = e + (a_lo + b_lo)
    return fast_two_sum(s, e)


def df_scale_add(x_hi, x_lo, alpha, d):
    """x + alpha·d with d, alpha in f32; keeps the pair normalized."""
    p, pe = two_prod(alpha, d)
    s, e = two_sum(x_hi, p)
    e = e + x_lo + pe
    return fast_two_sum(s, e)


# ----------------------------------------------------------------------
# Stencil defect in double-float32
# ----------------------------------------------------------------------

class CSPairOp(NamedTuple):
    """Constant-interior form of a double-f32 stencil pair.

    Same decomposition as :class:`~pde_solver_tpu.ops.linsolve.CSOp`
    (constant interior weights + exact thickness-2 boundary slabs), with
    every weight stored as an (hi, lo) float32 pair.  Like CSOp this is NOT
    wired into the XLA solve paths (no speedup under XLA fusion — see the
    CSOp docstring); it is the weight representation for Pallas defect
    kernels.
    """

    wc_hi: jnp.ndarray                 # [n_off] | [n_off, v, v]
    wc_lo: jnp.ndarray
    slabs_hi: Tuple[jnp.ndarray, ...]  # 2·grid_dim stacked face arrays
    slabs_lo: Tuple[jnp.ndarray, ...]


def pack_df_weights_cs(host_weights64, grid_dim: int
                       ) -> "Optional[CSPairOp]":
    """CS split of f64 host weights into (hi, lo) pairs, or None when the
    stencil is not exactly translation-invariant on the strict interior."""
    from pde_solver_tpu.ops.linsolve import _CS_SHELL
    t = _CS_SHELL
    W0 = np.asarray(host_weights64[0])
    node_shape = W0.shape[:grid_dim]
    if any(int(s) < 2 * t + 1 for s in node_shape):
        return None
    interior = tuple(slice(t, -t) for _ in range(grid_dim))
    center = tuple(int(s) // 2 for s in node_shape)
    wcs = []
    for W in host_weights64:
        W = np.asarray(W, dtype=np.float64)
        c = W[center]
        if not np.all(W[interior + (Ellipsis,)] == c):
            return None
        wcs.append(c)
    wc_hi, wc_lo = df_from_f64(np.stack(wcs))
    slabs_hi, slabs_lo = [], []
    for axis in range(grid_dim):
        for side in (0, 1):
            idx = tuple(
                (slice(0, t) if side == 0
                 else slice(node_shape[axis] - t, node_shape[axis]))
                if a == axis else slice(None)
                for a in range(grid_dim))
            slab64 = np.stack([np.asarray(W, dtype=np.float64)[idx + (Ellipsis,)]
                               for W in host_weights64])
            hi, lo = df_from_f64(slab64)
            slabs_hi.append(jnp.asarray(hi))
            slabs_lo.append(jnp.asarray(lo))
    return CSPairOp(wc_hi=jnp.asarray(wc_hi), wc_lo=jnp.asarray(wc_lo),
                    slabs_hi=tuple(slabs_hi), slabs_lo=tuple(slabs_lo))


def _df_cs_residual(offsets: Tuple[Offset, ...], op: CSPairOp,
                    b_hi, b_lo, x_hi, x_lo, grid_dim: int, vdim: int):
    """CS-form df32 defect: constant-weight pass + exact slab overwrite.
    Identical EFT accumulation order as the dense path within each region."""
    from pde_solver_tpu.ops.linsolve import _CS_SHELL
    t = _CS_SHELL
    pad = [(1, 1)] * grid_dim + [(0, 0)] * (x_hi.ndim - grid_dim)
    xh = jnp.pad(x_hi, pad)
    xl = jnp.pad(x_lo, pad)
    shape = x_hi.shape[:grid_dim]

    def accum(sl_list, Wh_at, Wl_at, bh_r, bl_r):
        if vdim == 1:
            rshape = bh_r.shape
            s = jnp.zeros(rshape, jnp.float32)
            e = jnp.zeros(rshape, jnp.float32)
            for i, sl in enumerate(sl_list):
                xsh = xh[sl]
                xsl = xl[sl]
                Wh, Wl = Wh_at(i), Wl_at(i)
                p, pe = two_prod(Wh, xsh)
                pe = pe + Wh * xsl + Wl * xsh
                s, e2 = two_sum(s, p)
                e, e3 = two_sum(e, e2 + pe)
                s, e4 = fast_two_sum(s, e3)
                e = e + e4
            rs, re = two_sum(bh_r, -s)
            return rs + (re + bl_r - e)
        rshape = bh_r.shape[:-1]
        comps = []
        for a in range(vdim):
            s = jnp.zeros(rshape, jnp.float32)
            e = jnp.zeros(rshape, jnp.float32)
            for i, sl in enumerate(sl_list):
                xsh = xh[sl + (Ellipsis,)]
                xsl = xl[sl + (Ellipsis,)]
                Wh, Wl = Wh_at(i), Wl_at(i)
                for c in range(vdim):
                    wh = Wh[..., a, c]
                    wl = Wl[..., a, c]
                    p, pe = two_prod(wh, xsh[..., c])
                    pe = pe + wh * xsl[..., c] + wl * xsh[..., c]
                    s, e2 = two_sum(s, p)
                    e, e3 = two_sum(e, e2 + pe)
                    s, e4 = fast_two_sum(s, e3)
                    e = e + e4
            rs, re = two_sum(bh_r[..., a], -s)
            comps.append(rs + (re + bl_r[..., a] - e))
        return jnp.stack(comps, axis=-1)

    main_slices = [tuple(slice(1 + o, 1 + o + n) for o, n in zip(off, shape))
                   for off in offsets]
    r = accum(main_slices, lambda i: op.wc_hi[i], lambda i: op.wc_lo[i],
              b_hi, b_lo)
    face = 0
    for axis in range(grid_dim):
        for side in (0, 1):
            SH = op.slabs_hi[face]
            SL = op.slabs_lo[face]
            face += 1
            base = 1 if side == 0 else shape[axis] - t + 1
            sls = [tuple(slice(base + off[a], base + off[a] + t) if a == axis
                         else slice(1 + off[a], 1 + off[a] + shape[a])
                         for a in range(grid_dim)) for off in offsets]
            set_idx = tuple(
                (slice(0, t) if side == 0 else slice(shape[a] - t, shape[a]))
                if a == axis else slice(None)
                for a in range(grid_dim))
            r_s = accum(sls,
                        lambda i, SH=SH: SH[i],
                        lambda i, SL=SL: SL[i],
                        b_hi[set_idx + (Ellipsis,)],
                        b_lo[set_idx + (Ellipsis,)])
            r = r.at[set_idx + (Ellipsis,)].set(r_s)
    rnorm2 = jnp.vdot(r.reshape(-1), r.reshape(-1))
    return r, rnorm2


def df_stencil_residual(offsets: Tuple[Offset, ...], W_hi, W_lo,
                        b_hi, b_lo, x_hi, x_lo,
                        grid_dim: int, vdim: int):
    """r = b − A x with A, b, x in double-f32 pairs.

    Accumulates Σ W·x exactly (TwoProd + TwoSum chains); the lo-parts enter
    as first-order corrections (W_hi·x_lo + W_lo·x_hi), bounding the total
    error around 2^-45 relative — far below the refinement targets.
    Returns the residual as a single f32 array (once the cancellation is
    done exactly, f32 represents r to 1e-7 of its own norm, which is all the
    downstream f32 solves can use) plus ‖r‖² in f32.

    ``W_hi`` may be a :class:`CSPairOp` (constant-interior form) — then
    ``W_lo`` is ignored (pass None).
    """
    if isinstance(W_hi, CSPairOp):
        return _df_cs_residual(offsets, W_hi, b_hi, b_lo, x_hi, x_lo,
                               grid_dim, vdim)
    pad = [(1, 1)] * grid_dim + [(0, 0)] * (x_hi.ndim - grid_dim)
    xh = jnp.pad(x_hi, pad)
    xl = jnp.pad(x_lo, pad)
    shape = x_hi.shape[:grid_dim]
    slices = [tuple(slice(1 + o, 1 + o + n) for o, n in zip(off, shape))
              for off in offsets]

    if vdim == 1:
        s = jnp.zeros(shape, jnp.float32)
        e = jnp.zeros(shape, jnp.float32)
        for sl, Wh, Wl in zip(slices, W_hi, W_lo):
            xsh = xh[sl]
            xsl = xl[sl]
            p, pe = two_prod(Wh, xsh)
            pe = pe + Wh * xsl + Wl * xsh
            s, e2 = two_sum(s, p)
            # error channel accumulated error-free too — a plain f32 sum of
            # ~n_off·v² correction terms floors the defect near 1e-6·κ·ε32²
            e, e3 = two_sum(e, e2 + pe)
            s, e4 = fast_two_sum(s, e3)
            e = e + e4
        rs, re = two_sum(b_hi, -s)
        r = rs + (re + b_lo - e)
    else:
        comps = []
        for i in range(vdim):
            s = jnp.zeros(shape, jnp.float32)
            e = jnp.zeros(shape, jnp.float32)
            for sl, Wh, Wl in zip(slices, W_hi, W_lo):
                xsh = xh[sl + (Ellipsis,)]
                xsl = xl[sl + (Ellipsis,)]
                for j in range(vdim):
                    p, pe = two_prod(Wh[..., i, j], xsh[..., j])
                    pe = pe + Wh[..., i, j] * xsl[..., j] \
                        + Wl[..., i, j] * xsh[..., j]
                    s, e2 = two_sum(s, p)
                    e, e3 = two_sum(e, e2 + pe)
                    s, e4 = fast_two_sum(s, e3)
                    e = e + e4
            rs, re = two_sum(b_hi[..., i], -s)
            comps.append(rs + (re + b_lo[..., i] - e))
        r = jnp.stack(comps, axis=-1)
    rnorm2 = jnp.vdot(r.reshape(-1), r.reshape(-1))
    return r, rnorm2


@partial(jax.jit, static_argnames=("offsets", "grid_dim", "vdim"))
def jit_df_residual(offsets, W_hi, W_lo, b_hi, b_lo, x_hi, x_lo,
                    grid_dim, vdim):
    return df_stencil_residual(offsets, W_hi, W_lo, b_hi, b_lo, x_hi, x_lo,
                               grid_dim, vdim)


@jax.jit
def jit_df_update(x_hi, x_lo, scale, d32):
    """x ← x + scale·d (pairwise, normalized)."""
    return df_scale_add(x_hi, x_lo, scale.astype(jnp.float32), d32)


def pack_df_weights(host_weights64) -> Tuple[Tuple[jnp.ndarray, ...],
                                             Tuple[jnp.ndarray, ...]]:
    """Split f64 host stencil weights into device (hi, lo) f32 pairs."""
    his, los = [], []
    for W in host_weights64:
        hi, lo = df_from_f64(np.asarray(W, dtype=np.float64))
        his.append(jnp.asarray(hi))
        los.append(jnp.asarray(lo))
    return tuple(his), tuple(los)
