"""Readers/writers for the reference liblcg binary data format.

Format (documented in ``/root/reference/data/README:1-11`` and read by the
samples, e.g. ``sample8.cu:30-64`` real / ``sample4.cpp:31-61`` complex):

    case_*_A  : [int32 N][int32 nz]
                then nz records of [int32 row][int32 col][value]
                then N values of b
                (value = 1 float64 for real files, 2 float64 re/im for
                complex files)
    case_*_B  : [int32 N] then N values of x (the reference answer)

Record layout is interleaved (index, index, value), so the nnz block is
parsed with a structured numpy dtype rather than a flat read.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np


class LinearSystem(NamedTuple):
    n: int
    nnz: int
    rows: np.ndarray  # int32 (nnz,)
    cols: np.ndarray  # int32 (nnz,)
    vals: np.ndarray  # float64 or complex128 (nnz,)
    b: np.ndarray     # float64 or complex128 (n,)


def read_system(path: str, complex_values: bool = False) -> LinearSystem:
    """Read a ``case_*_A`` matrix+rhs file."""
    with open(path, "rb") as f:
        raw = f.read()
    n, nz = struct.unpack_from("<ii", raw, 0)
    off = 8
    if complex_values:
        rec = np.dtype([("r", "<i4"), ("c", "<i4"), ("re", "<f8"), ("im", "<f8")])
    else:
        rec = np.dtype([("r", "<i4"), ("c", "<i4"), ("v", "<f8")])
    triplets = np.frombuffer(raw, dtype=rec, count=nz, offset=off)
    off += rec.itemsize * nz
    if complex_values:
        vals = triplets["re"] + 1j * triplets["im"]
        b_raw = np.frombuffer(raw, dtype="<f8", count=2 * n, offset=off)
        b = b_raw[0::2] + 1j * b_raw[1::2]
    else:
        vals = triplets["v"].copy()
        b = np.frombuffer(raw, dtype="<f8", count=n, offset=off).copy()
    return LinearSystem(
        n=n,
        nnz=nz,
        rows=triplets["r"].astype(np.int32),
        cols=triplets["c"].astype(np.int32),
        vals=vals,
        b=b,
    )


def read_answer(path: str, complex_values: bool = False) -> np.ndarray:
    """Read a ``case_*_B`` answer-vector file."""
    with open(path, "rb") as f:
        raw = f.read()
    (n,) = struct.unpack_from("<i", raw, 0)
    if complex_values:
        x_raw = np.frombuffer(raw, dtype="<f8", count=2 * n, offset=4)
        return x_raw[0::2] + 1j * x_raw[1::2]
    return np.frombuffer(raw, dtype="<f8", count=n, offset=4).copy()


def write_system(path: str, rows, cols, vals, b) -> None:
    """Write a matrix+rhs in the reference format (for round-tripping and
    generating test fixtures)."""
    rows = np.asarray(rows, dtype=np.int32)
    cols = np.asarray(cols, dtype=np.int32)
    vals = np.asarray(vals)
    b = np.asarray(b)
    n = len(b)
    nz = len(vals)
    is_complex = np.iscomplexobj(vals) or np.iscomplexobj(b)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", n, nz))
        if is_complex:
            vals = vals.astype(np.complex128)
            for i in range(nz):
                f.write(struct.pack("<iidd", int(rows[i]), int(cols[i]),
                                    vals[i].real, vals[i].imag))
            b = b.astype(np.complex128)
            inter = np.empty(2 * n)
            inter[0::2] = b.real
            inter[1::2] = b.imag
            f.write(inter.astype("<f8").tobytes())
        else:
            for i in range(nz):
                f.write(struct.pack("<iid", int(rows[i]), int(cols[i]),
                                    float(vals[i])))
            f.write(b.astype("<f8").tobytes())


def write_answer(path: str, x) -> None:
    x = np.asarray(x)
    n = len(x)
    with open(path, "wb") as f:
        f.write(struct.pack("<i", n))
        if np.iscomplexobj(x):
            inter = np.empty(2 * n)
            inter[0::2] = x.real
            inter[1::2] = x.imag
            f.write(inter.astype("<f8").tobytes())
        else:
            f.write(x.astype("<f8").tobytes())
