"""Compute primitives (reference L1): SpMV, dense MV, and Pallas kernels."""

from .spmv import coo_to_ell, dense_mv, ell_spmv

__all__ = ["coo_to_ell", "dense_mv", "ell_spmv"]
