"""Dense Cholesky factorization and explicit triangular inverses.

Reference: the Eigen dense helpers — ``lcg_Cholesky`` (real A = L L^T,
preconditioner_eigen.cpp:39-94), ``clcg_Cholesky`` (complex *unconjugated*
symmetric variant, :96-151 — NOT Hermitian: it factors A = L L^T with
complex square roots, the convention the complex-symmetric solvers need),
and the explicit triangular inverses ``lcg_invert_lower/upper_triangle``
(:153-295).

Real/Hermitian factorizations use the device ``jnp.linalg`` path; the
complex-symmetric variant has no LAPACK equivalent and runs the classic
row algorithm on host (factorization is host work in this framework's
design, like the incomplete factorizations).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..operators import DenseOperator, LinearOperator


def _as_matrix(A) -> jnp.ndarray:
    if isinstance(A, DenseOperator):
        return A.A
    if isinstance(A, LinearOperator):
        raise TypeError("dense Cholesky needs a dense matrix / DenseOperator")
    return jnp.asarray(A)


def cholesky(A) -> jnp.ndarray:
    """Lower factor L with A = L L^T (real SPD) / L L^H (complex Hermitian).
    Reference ``lcg_Cholesky`` (preconditioner_eigen.cpp:39-94)."""
    return jnp.linalg.cholesky(_as_matrix(A))


def cholesky_symmetric(A) -> jnp.ndarray:
    """Unconjugated complex-symmetric Cholesky: A = L L^T with A = A^T
    complex (reference ``clcg_Cholesky``, preconditioner_eigen.cpp:96-151).

    Runs the classic row algorithm on host with complex square roots; raises
    on a zero pivot (the factorization exists whenever all leading minors
    are nonsingular — positive-definiteness is not defined here).
    """
    M = np.asarray(_as_matrix(A))
    if not np.iscomplexobj(M):
        return jnp.asarray(np.linalg.cholesky(M))
    n = M.shape[0]
    L = np.zeros_like(M)
    for i in range(n):
        for j in range(i):
            L[i, j] = (M[i, j] - L[i, :j] @ L[j, :j]) / L[j, j]
        d = M[i, i] - L[i, :i] @ L[i, :i]
        if d == 0:
            raise ValueError(f"symmetric Cholesky breakdown: zero pivot at row {i}")
        L[i, i] = np.sqrt(d)
    return jnp.asarray(L)


def invert_lower_triangle(L) -> jnp.ndarray:
    """Explicit L^{-1} (reference ``lcg_invert_lower_triangle``,
    preconditioner_eigen.cpp:153-223).  Prefer triangular *solves* in new
    code; the explicit inverse exists for reference parity (the samples
    build M^{-1} = L^{-T} L^{-1} as materialized matrices)."""
    L = _as_matrix(L)
    eye = jnp.eye(L.shape[0], dtype=L.dtype)
    return jax_triangular_solve(L, eye, lower=True)


def invert_upper_triangle(U) -> jnp.ndarray:
    """Explicit U^{-1} (reference ``lcg_invert_upper_triangle``,
    preconditioner_eigen.cpp:190-295)."""
    U = _as_matrix(U)
    eye = jnp.eye(U.shape[0], dtype=U.dtype)
    return jax_triangular_solve(U, eye, lower=False)


def jax_triangular_solve(T, B, *, lower: bool) -> jnp.ndarray:
    """Device dense triangular solve T X = B."""
    import jax.scipy.linalg as jsl

    return jsl.solve_triangular(T, B, lower=lower)


class DenseCholeskyPreconditioner(LinearOperator):
    """M^{-1} x = (L L^T)^{-1} x via two dense triangular solves — the
    dense analogue of the sample7 IC MxProduct (sample7.cpp:107-108).
    ``symmetric=True`` uses the unconjugated complex-symmetric convention."""

    def __init__(self, A, *, symmetric: bool = False):
        M = _as_matrix(A)
        self.L = cholesky_symmetric(M) if symmetric else cholesky(M)
        self.symmetric = bool(symmetric)
        self.shape = tuple(M.shape)
        self.dtype = self.L.dtype

    def mv(self, x):
        y = jax_triangular_solve(self.L, x, lower=True)
        upper = self.L.T if (self.symmetric or not jnp.issubdtype(
            self.dtype, jnp.complexfloating)) else jnp.conj(self.L.T)
        return jax_triangular_solve(upper, y, lower=False)


def _dcp_flatten(op):
    return (op.L,), (op.symmetric,)


def _dcp_unflatten(aux, children):
    obj = object.__new__(DenseCholeskyPreconditioner)
    (obj.L,) = children
    (obj.symmetric,) = aux
    try:
        obj.shape = tuple(obj.L.shape)
        obj.dtype = obj.L.dtype
    except (AttributeError, TypeError):
        obj.shape = None
        obj.dtype = None
    return obj


from jax.tree_util import register_pytree_node  # noqa: E402

register_pytree_node(
    DenseCholeskyPreconditioner, _dcp_flatten, _dcp_unflatten
)
