"""ctypes bridge to the C++ host runtime (native/pde_native.cpp).

Builds the shared library on first use (g++ -O3 -fopenmp) and caches it next
to the sources; degrades gracefully to numpy when no compiler is available.

Exposes:
* :func:`stencil_apply` / :func:`stencil_residual` — OpenMP float64 stencil
  ops on flat node arrays (mixed-precision refinement hot path);
* :func:`tsf_write` / :func:`tsf_read` — binary TimeSeriesField codec.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import threading
from typing import Dict, Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "pde_native.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "build", "libpde_native.so")


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        # Rebuild when the cached .so is missing OR older than the C++ source
        # (a stale binary silently shadowing source edits is a correctness
        # hazard; the .so is never checked into git).
        stale = (not os.path.exists(_SO)
                 or (os.path.exists(_SRC)
                     and os.path.getmtime(_SO) < os.path.getmtime(_SRC)))
        so = _build() if stale else _SO
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        dp = ctypes.POINTER(ctypes.c_double)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.stencil_apply_f64.argtypes = [dp, i64p, ctypes.c_int64,
                                          ctypes.c_int64, dp, dp,
                                          ctypes.c_int64]
        lib.stencil_residual_f64.restype = ctypes.c_double
        lib.stencil_residual_f64.argtypes = [dp, i64p, ctypes.c_int64,
                                             ctypes.c_int64, dp, dp, dp,
                                             ctypes.c_int64, dp]
        lib.num_threads.restype = ctypes.c_int
        lib.tsf_write.restype = ctypes.c_int
        lib.tsf_write.argtypes = [ctypes.c_char_p, dp, dp, dp,
                                  ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int32, ctypes.c_char_p]
        lib.tsf_read_header.restype = ctypes.c_int
        lib.tsf_read_header.argtypes = [ctypes.c_char_p, i64p, i64p,
                                        ctypes.POINTER(ctypes.c_int32), i64p]
        lib.tsf_read_payload.restype = ctypes.c_int
        lib.tsf_read_payload.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_int64, dp, dp, dp,
                                         ctypes.c_int64, ctypes.c_int64]
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


# ----------------------------------------------------------------------
# Stencil ops on flat arrays
# ----------------------------------------------------------------------

def pack_flat_stencil(offsets, weights, node_shape, vdim: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Stack stencil weights into [n_off, N, v, v] (or [n_off, N]) and compute
    flat-index deltas.  Assembled weights carry exact zeros wherever a flat
    shift would cross a grid row, so flat addressing is exact."""
    strides = []
    acc = 1
    for s in reversed(node_shape):
        strides.append(acc)
        acc *= s
    strides = list(reversed(strides))
    deltas = np.array([sum(o * st for o, st in zip(off, strides))
                       for off in offsets], dtype=np.int64)
    N = int(np.prod(node_shape))
    if vdim == 1:
        W = np.ascontiguousarray(
            np.stack([np.asarray(w, np.float64).reshape(N) for w in weights]))
    else:
        W = np.ascontiguousarray(
            np.stack([np.asarray(w, np.float64).reshape(N, vdim, vdim)
                      for w in weights]))
    return W, deltas


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def stencil_apply(W: np.ndarray, deltas: np.ndarray, x: np.ndarray,
                  vdim: int = 1) -> np.ndarray:
    """y = A x on flat arrays via the native kernel."""
    lib = get_lib()
    n_off = W.shape[0]
    n_nodes = W.shape[1]
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.empty_like(x)
    lib.stencil_apply_f64(_dp(W), deltas.ctypes.data_as(
        ctypes.POINTER(ctypes.c_int64)), n_off, vdim, _dp(x), _dp(y), n_nodes)
    return y


def stencil_residual(W: np.ndarray, deltas: np.ndarray, x: np.ndarray,
                     b: np.ndarray, vdim: int = 1
                     ) -> Tuple[np.ndarray, float, float]:
    """r = b − A x; returns (r, ||r||, max|r|)."""
    lib = get_lib()
    n_off = W.shape[0]
    n_nodes = W.shape[1]
    x = np.ascontiguousarray(x, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    r = np.empty_like(b)
    scale = ctypes.c_double(0.0)
    norm2 = lib.stencil_residual_f64(
        _dp(W), deltas.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_off, vdim, _dp(x), _dp(b), _dp(r), n_nodes, ctypes.byref(scale))
    return r, float(np.sqrt(norm2)), float(scale.value)


# ----------------------------------------------------------------------
# TSF codec
# ----------------------------------------------------------------------

def tsf_write(path: str, coords: np.ndarray, values: np.ndarray,
              times: np.ndarray, dim: int, meta: Dict) -> None:
    lib = get_lib()
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    values = np.ascontiguousarray(values, dtype=np.float64)
    times = np.ascontiguousarray(times, dtype=np.float64)
    meta_json = json.dumps(meta, default=str).encode()
    rc = lib.tsf_write(path.encode(), _dp(coords), _dp(values), _dp(times),
                       coords.shape[0], times.shape[0], dim, meta_json)
    if rc != 0:
        raise OSError(f"tsf_write failed with code {rc}")


def tsf_read(path: str):
    lib = get_lib()
    N = ctypes.c_int64()
    Nt = ctypes.c_int64()
    dim = ctypes.c_int32()
    mlen = ctypes.c_int64()
    rc = lib.tsf_read_header(path.encode(), ctypes.byref(N), ctypes.byref(Nt),
                             ctypes.byref(dim), ctypes.byref(mlen))
    if rc != 0:
        raise OSError(f"tsf_read_header failed with code {rc}")
    coords = np.empty((N.value, 3), dtype=np.float64)
    times = np.empty((Nt.value,), dtype=np.float64)
    values = np.empty((Nt.value, N.value), dtype=np.float64)
    meta_buf = ctypes.create_string_buffer(mlen.value)
    rc = lib.tsf_read_payload(path.encode(), meta_buf, mlen.value,
                              _dp(coords), _dp(times), _dp(values),
                              N.value, Nt.value)
    if rc != 0:
        raise OSError(f"tsf_read_payload failed with code {rc}")
    meta = json.loads(meta_buf.raw.decode())
    return coords, values, times, int(dim.value), meta
