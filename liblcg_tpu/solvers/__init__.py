"""Iteration engines (reference L2): real and complex Krylov solvers plus
the shared while-loop harness."""

from . import cplx, harness, real

__all__ = ["real", "cplx", "harness"]
