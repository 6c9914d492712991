"""Native host runtime: ctypes bindings over ``src/lcg_native.cpp``.

The C++ library implements the inherently-sequential host passes —
incomplete factorizations and triangular level scheduling — that the
reference also runs on host (preconditioner.cpp, preconditioner_cuda.cu's
host-side complex IC).  The shared object is compiled on first use with the
ambient ``g++`` and cached next to the source; when no compiler is
available every entry point falls back to the pure-Python implementation,
so the package never hard-requires the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "src")
_SRC = os.path.join(_SRC_DIR, "lcg_native.cpp")
_SO = os.path.join(_SRC_DIR, "liblcg_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_I64P = ctypes.POINTER(ctypes.c_int64)
_F64P = ctypes.POINTER(ctypes.c_double)


def _build() -> Optional[str]:
    """(Re)compile the shared object if the source is newer.  Returns the
    .so path or None when compilation is unavailable/fails."""
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return _SO
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return _SO
    except (OSError, subprocess.SubprocessError):
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        for name in ("ic0_factorize_f64", "ic0_factorize_c128"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.c_int64, ctypes.c_int64, _I64P, _I64P, _F64P,
                ctypes.c_int64, _I64P, _I64P, _F64P, _I64P, ctypes.c_int64,
            ]
        for name in ("ilu0_factorize_f64", "ilu0_factorize_c128"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.c_int64, ctypes.c_int64, _I64P, _I64P, _F64P,
                ctypes.c_int64,
                _I64P, _I64P, _F64P, _I64P, ctypes.c_int64,
                _I64P, _I64P, _F64P, _I64P, ctypes.c_int64,
            ]
        lib.level_schedule_i64.restype = ctypes.c_int64
        lib.level_schedule_i64.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _I64P, _I64P, ctypes.c_int64, _I64P,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _get_lib() is not None


def _as_i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def _ptr_i64(a):
    return a.ctypes.data_as(_I64P)


def _ptr_f64(a):
    return a.ctypes.data_as(_F64P)


def ic_factorize(n, rows, cols, vals, fill: int = 0):
    """Native IC(0)/ICT of the lower triangle.  Returns (rows, cols, vals)
    of L (including diagonal) or None when the native library is missing.
    Raises ValueError on factorization breakdown (matching the Python path).
    """
    lib = _get_lib()
    if lib is None:
        return None
    rows = _as_i64(rows)
    cols = _as_i64(cols)
    vals = np.ascontiguousarray(vals)
    is_c = np.iscomplexobj(vals)
    vals = vals.astype(np.complex128 if is_c else np.float64)
    nnz = len(vals)
    cap = (nnz + n) if fill <= 0 else n * (fill + 1)
    o_r = np.empty(cap, np.int64)
    o_c = np.empty(cap, np.int64)
    o_v = np.empty(cap, vals.dtype)
    o_n = np.zeros(1, np.int64)
    fn = lib.ic0_factorize_c128 if is_c else lib.ic0_factorize_f64
    ret = fn(n, nnz, _ptr_i64(rows), _ptr_i64(cols), _ptr_f64(vals.view(np.float64)),
             fill, _ptr_i64(o_r), _ptr_i64(o_c), _ptr_f64(o_v.view(np.float64)),
             _ptr_i64(o_n), cap)
    if ret == -(n + 1):
        raise RuntimeError("native IC output capacity overflow (internal bug)")
    if ret < 0:
        raise ValueError(
            f"incomplete Cholesky breakdown at row {-int(ret) - 1}: "
            "non-positive pivot"
        )
    k = int(o_n[0])
    return o_r[:k], o_c[:k], o_v[:k]


def ilu_factorize(n, rows, cols, vals, fill: int = 0):
    """Native ILU(0)/ILUT.  Returns (l_rows, l_cols, l_vals, u_rows, u_cols,
    u_vals) with unit-diagonal L entries included, or None when unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    rows = _as_i64(rows)
    cols = _as_i64(cols)
    vals = np.ascontiguousarray(vals)
    is_c = np.iscomplexobj(vals)
    vals = vals.astype(np.complex128 if is_c else np.float64)
    nnz = len(vals)
    l_cap = nnz if fill <= 0 else n * fill + 1
    u_cap = (nnz + n) if fill <= 0 else n * (fill + 1)
    l_r = np.empty(l_cap, np.int64); l_c = np.empty(l_cap, np.int64)
    l_v = np.empty(l_cap, vals.dtype); l_n = np.zeros(1, np.int64)
    u_r = np.empty(u_cap, np.int64); u_c = np.empty(u_cap, np.int64)
    u_v = np.empty(u_cap, vals.dtype); u_n = np.zeros(1, np.int64)
    fn = lib.ilu0_factorize_c128 if is_c else lib.ilu0_factorize_f64
    ret = fn(n, nnz, _ptr_i64(rows), _ptr_i64(cols), _ptr_f64(vals.view(np.float64)),
             fill,
             _ptr_i64(l_r), _ptr_i64(l_c), _ptr_f64(l_v.view(np.float64)),
             _ptr_i64(l_n), l_cap,
             _ptr_i64(u_r), _ptr_i64(u_c), _ptr_f64(u_v.view(np.float64)),
             _ptr_i64(u_n), u_cap)
    if ret == -(n + 1):
        raise RuntimeError("native ILU output capacity overflow (internal bug)")
    if ret < 0:
        raise ValueError(f"incomplete LU breakdown: zero pivot at row {-int(ret) - 1}")
    lk, uk = int(l_n[0]), int(u_n[0])
    # Append the unit diagonal to L (the C side emits strictly-lower only).
    diag_r = np.arange(n, dtype=np.int64)
    ones = np.ones(n, dtype=vals.dtype)
    return (
        np.concatenate([l_r[:lk], diag_r]),
        np.concatenate([l_c[:lk], diag_r]),
        np.concatenate([l_v[:lk], ones]),
        u_r[:uk], u_c[:uk], u_v[:uk],
    )


def level_schedule_levels(n, rows, cols, lower: bool):
    """Native dependency-level computation for a triangular factor's
    off-diagonal COO (sorted by row).  Returns int64 levels or None."""
    lib = _get_lib()
    if lib is None:
        return None
    rows = _as_i64(rows)
    cols = _as_i64(cols)
    level = np.zeros(n, np.int64)
    lib.level_schedule_i64(n, len(rows), _ptr_i64(rows), _ptr_i64(cols),
                           1 if lower else 0, _ptr_i64(level))
    return level
