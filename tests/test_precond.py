"""Preconditioner tests: factorizations (native C++ and Python fallback
parity), level-scheduled triangular solves, and end-to-end PCG improvement.

Reference model: sample7 (library IC + triangular-solve MxProduct), sample8
(cuSPARSE IC0 on the real 10K case), preconditioner_eigen.cpp algorithms.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import liblcg_tpu as lcg
from liblcg_tpu import native
from liblcg_tpu.precond import (
    incomplete_cholesky,
    incomplete_lu,
    level_schedule,
    triangular_solve,
)


@pytest.fixture(scope="module")
def spd_banded():
    rng = np.random.default_rng(0)
    n = 300
    A = np.zeros((n, n))
    A[np.arange(n), np.arange(n)] = 4.0 + rng.uniform(0, 1, n)
    for off, scale in ((1, 0.5), (7, 0.3)):
        v = rng.uniform(-scale, scale, n - off)
        A[np.arange(n - off), np.arange(off, n)] = v
        A[np.arange(off, n), np.arange(n - off)] = v
    return A


def _dense(n, r, c, v):
    D = np.zeros((n, n), dtype=np.asarray(v).dtype)
    np.add.at(D, (np.asarray(r), np.asarray(c)), np.asarray(v))
    return D


@pytest.fixture()
def force_python_fallback(monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)


def test_ic0_reconstructs_banded(spd_banded):
    A = spd_banded
    n = A.shape[0]
    fac = incomplete_cholesky(lcg.DenseOperator(A))
    L = _dense(n, fac.l_rows, fac.l_cols, fac.l_vals)
    # IC(0) on a pattern with little fill-in is close to exact Cholesky.
    err = np.max(np.abs(L @ L.T - A))
    assert err < 0.2


def test_ic_native_matches_python(spd_banded):
    if not native.available():
        pytest.skip("no native toolchain")
    A = spd_banded
    n = A.shape[0]
    f_nat = incomplete_cholesky(lcg.DenseOperator(A))
    saved = native._lib
    try:
        native._lib = None
        native._tried = True
        f_py = incomplete_cholesky(lcg.DenseOperator(A))
    finally:
        native._lib = saved
    np.testing.assert_allclose(
        _dense(n, f_nat.l_rows, f_nat.l_cols, f_nat.l_vals),
        _dense(n, f_py.l_rows, f_py.l_cols, f_py.l_vals),
        atol=1e-10,
    )


def test_ilu_native_matches_python(spd_banded):
    """Exact parity holds for ILU(0) (fixed pattern).  ILUT (fill > 0) may
    legitimately diverge between implementations: dropping differently on
    near-ties changes all downstream values — both results are valid ILUT
    factorizations, so only ILU(0) is compared element-wise."""
    if not native.available():
        pytest.skip("no native toolchain")
    A = spd_banded + np.triu(np.ones_like(spd_banded), 1) * 0.01  # unsymmetric
    n = A.shape[0]
    f_nat = incomplete_lu(lcg.DenseOperator(A))
    saved = native._lib
    try:
        native._lib = None
        native._tried = True
        f_py = incomplete_lu(lcg.DenseOperator(A))
    finally:
        native._lib = saved
    np.testing.assert_allclose(
        _dense(n, f_nat.u_rows, f_nat.u_cols, f_nat.u_vals),
        _dense(n, f_py.u_rows, f_py.u_cols, f_py.u_vals),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        _dense(n, f_nat.l_rows, f_nat.l_cols, f_nat.l_vals),
        _dense(n, f_py.l_rows, f_py.l_cols, f_py.l_vals),
        atol=1e-8,
    )


def test_ilu0_factors_reconstruct(spd_banded):
    A = spd_banded
    n = A.shape[0]
    fac = incomplete_lu(lcg.DenseOperator(A))
    L = _dense(n, fac.l_rows, fac.l_cols, fac.l_vals)
    U = _dense(n, fac.u_rows, fac.u_cols, fac.u_vals)
    assert np.max(np.abs(L @ U - A)) < 0.2
    # unit lower diagonal
    np.testing.assert_allclose(np.diag(L), 1.0)


def test_level_scheduled_solve_matches_scipy_style(spd_banded):
    A = spd_banded
    n = A.shape[0]
    fac = incomplete_cholesky(lcg.DenseOperator(A))
    L = _dense(n, fac.l_rows, fac.l_cols, fac.l_vals)
    rng = np.random.default_rng(1)
    b = rng.normal(size=n)
    sched = level_schedule(n, fac.l_rows, fac.l_cols, fac.l_vals, lower=True)
    x_dev = np.asarray(triangular_solve(sched, jnp.asarray(b)))
    x_ref = np.linalg.solve(L, b)
    np.testing.assert_allclose(x_dev, x_ref, atol=1e-10)
    # upper solve via the transpose factor
    schedU = level_schedule(n, fac.u_rows, fac.u_cols, fac.u_vals, lower=False)
    y_dev = np.asarray(triangular_solve(schedU, jnp.asarray(b)))
    y_ref = np.linalg.solve(L.T, b)
    np.testing.assert_allclose(y_dev, y_ref, atol=1e-10)


def test_pcg_ic_beats_plain_cg_iterations(case_10k):
    sys_, _ = case_10k
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    params = lcg.SolverParams(epsilon=1e-12)
    plain = lcg.solve(A, jnp.asarray(sys_.b), method="cg", params=params)
    fac = incomplete_cholesky(
        lcg.SparseOperator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals,
                           assume_symmetric=True)
    )
    M = fac.preconditioner()
    pcg = lcg.solve(A, jnp.asarray(sys_.b), method="pcg", M=M, params=params)
    assert pcg.converged
    assert int(pcg.iterations) < int(plain.iterations) * 0.55, (
        f"IC-PCG {int(pcg.iterations)} vs CG {int(plain.iterations)}"
    )


def test_complex_ic_pcg(case_1k_complex):
    sys_, answer = case_1k_complex
    Asp = lcg.SparseOperator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    fac = incomplete_cholesky(Asp)
    M = fac.preconditioner()
    res = lcg.solve(Asp, jnp.asarray(sys_.b), method="pcg", M=M,
                    params=lcg.SolverParams(epsilon=1e-14, abs_diff=1))
    assert res.converged
    assert np.max(np.abs(np.asarray(res.x) - answer)) < 1e-3


def test_ssor(spd_banded):
    A = spd_banded
    n = A.shape[0]
    op = lcg.SparseOperator.from_dense(A, assume_symmetric=True)
    M = lcg.SSORPreconditioner.from_sparse(op)
    b = A @ np.ones(n)
    res = lcg.solve(op, jnp.asarray(b), method="pcg", M=M,
                    params=lcg.SolverParams(epsilon=1e-13))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-5)


def test_ic_breakdown_raises():
    A = np.array([[1.0, 2.0], [2.0, 1.0]])  # indefinite -> negative pivot
    with pytest.raises(ValueError):
        incomplete_cholesky(lcg.DenseOperator(A))


def test_ict_fill_cap(spd_banded):
    A = spd_banded
    n = A.shape[0]
    fac = incomplete_cholesky(lcg.DenseOperator(A), fill=2)
    counts = np.bincount(np.asarray(fac.l_rows), minlength=n)
    assert counts.max() <= 3  # fill off-diagonals + diagonal


def test_dense_cholesky_real(spd_banded):
    from liblcg_tpu.precond import cholesky, invert_lower_triangle

    A = spd_banded
    L = np.asarray(cholesky(A))
    np.testing.assert_allclose(L @ L.T, A, atol=1e-10)
    Linv = np.asarray(invert_lower_triangle(L))
    np.testing.assert_allclose(Linv @ L, np.eye(A.shape[0]), atol=1e-10)


def test_dense_cholesky_complex_symmetric():
    from liblcg_tpu.precond import cholesky_symmetric

    rng = np.random.default_rng(3)
    n = 40
    M = rng.uniform(-1, 1, (n, n)) + 1j * rng.uniform(-1, 1, (n, n))
    A = (M + M.T) / 2 + (4 + 0.5j) * np.eye(n)   # complex symmetric, A = A^T
    L = np.asarray(cholesky_symmetric(A))
    # unconjugated factorization: L L^T = A (NOT L L^H)
    np.testing.assert_allclose(L @ L.T, A, atol=1e-10)
    assert np.max(np.abs(np.triu(L, 1))) == 0


def test_dense_cholesky_preconditioner(complex_sym_small):
    from liblcg_tpu.precond import DenseCholeskyPreconditioner

    A, b, x_true = complex_sym_small
    M = DenseCholeskyPreconditioner(A, symmetric=True)
    # Exact factorization => PCG converges in O(1) iterations.
    res = lcg.solve(lcg.DenseOperator(A), b, method="pcg", M=M,
                    params=lcg.SolverParams(epsilon=1e-20))
    assert res.converged
    assert int(res.iterations) <= 3
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-6)
