"""Preconditioners: Jacobi/SSOR (device) and IC/ILU (host factorization,
level-scheduled device application).

Reference layer: ``preconditioner*.h/.cpp`` (L3).  Design fact preserved
from the reference (SURVEY §1): preconditioner *application* is an operator
passed into the solver (the ``Mfp`` callback), while *factorization* is a
library helper the user calls once — the iteration engines never factorize.
"""

from .jacobi import (
    ChebyshevPreconditioner,
    JacobiPreconditioner,
    SSORPreconditioner,
)
from .incomplete import (
    IncompleteFactorization,
    incomplete_cholesky,
    incomplete_lu,
)
from .triangular import (
    LevelSchedule,
    TriangularPreconditioner,
    level_schedule,
    triangular_solve,
)
from .blocked_tri import (
    BlockedTriangular,
    BlockedTriangularPreconditioner,
    blocked_schedule,
    blocked_triangular_solve,
)
from .dense import (
    DenseCholeskyPreconditioner,
    cholesky,
    cholesky_symmetric,
    invert_lower_triangle,
    invert_upper_triangle,
)

__all__ = [
    "JacobiPreconditioner",
    "SSORPreconditioner",
    "ChebyshevPreconditioner",
    "IncompleteFactorization",
    "incomplete_cholesky",
    "incomplete_lu",
    "LevelSchedule",
    "TriangularPreconditioner",
    "level_schedule",
    "triangular_solve",
    "BlockedTriangular",
    "BlockedTriangularPreconditioner",
    "blocked_schedule",
    "blocked_triangular_solve",
    "DenseCholeskyPreconditioner",
    "cholesky",
    "cholesky_symmetric",
    "invert_lower_triangle",
    "invert_upper_triangle",
]
