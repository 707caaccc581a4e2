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
from typing import Dict, Tuple

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
    """
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
