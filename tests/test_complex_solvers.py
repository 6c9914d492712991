"""Complex-domain solver tests: golden solves of the shipped complex cases.

Modeled on the reference's complex samples: sample3 (manufactured complex-
symmetric dense system, BICG/BICG_SYM/CGS/BICGSTAB/TFQMR), sample4 (shipped
case_1K_cA, epsilon=1e-6 abs_diff, max-diff oracle vs the stored answer) and
sample6 (shipped case_10K_cA with Jacobi PCG / PBiCG).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import liblcg_tpu as lcg

#: sample4.cpp:166-168 configuration.
GOLDEN_PARAMS = lcg.SolverParams(epsilon=1e-6, abs_diff=1)

COMPLEX_UNPRECONDITIONED = ["bicg", "bicg_sym", "cgs", "bicgstab", "tfqmr"]


def _operator(sys_):
    return lcg.SparseOperator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)


@pytest.mark.parametrize("method", COMPLEX_UNPRECONDITIONED)
def test_dense_complex_symmetric(complex_sym_small, method):
    A, b, x_true = complex_sym_small
    res = lcg.solve(
        lcg.DenseOperator(A), b, method=method,
        params=lcg.SolverParams(epsilon=1e-20),
    )
    assert res.converged, f"{method}: {res.status}"
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-4)


@pytest.mark.parametrize("method", ["bicg", "bicg_sym", "cgs", "tfqmr"])
def test_case1k_golden(case_1k_complex, method):
    sys_, answer = case_1k_complex
    res = lcg.solve(_operator(sys_), jnp.asarray(sys_.b), method=method,
                    params=GOLDEN_PARAMS)
    assert res.converged, f"{method}: {res.status}"
    # sample4.cpp:63-73 oracle: max |x_i - ans_i| over components.  The
    # abs_diff rule at eps=1e-6 only guarantees ||r|| <= sqrt(eps*n) ~ 0.03,
    # so the bound here is what that stopping rule actually delivers.
    max_diff = np.max(np.abs(np.asarray(res.x) - answer))
    assert max_diff < 0.05, f"{method} max_diff={max_diff}"


@pytest.mark.parametrize("method", ["bicg", "bicg_sym", "cgs"])
def test_case1k_tight_accuracy(case_1k_complex, method):
    sys_, answer = case_1k_complex
    res = lcg.solve(_operator(sys_), jnp.asarray(sys_.b), method=method,
                    params=lcg.SolverParams(epsilon=1e-14, abs_diff=1))
    assert res.converged, f"{method}: {res.status}"
    max_diff = np.max(np.abs(np.asarray(res.x) - answer))
    assert max_diff < 1e-3, f"{method} max_diff={max_diff}"


@pytest.mark.parametrize("method", ["bicg", "bicg_sym"])
def test_case10k_complex_golden(case_10k_complex, method):
    sys_, answer = case_10k_complex
    res = lcg.solve(_operator(sys_), jnp.asarray(sys_.b), method=method,
                    params=GOLDEN_PARAMS)
    assert res.converged, f"{method}: {res.status}"
    max_diff = np.max(np.abs(np.asarray(res.x) - answer))
    assert max_diff < 0.05, f"{method} max_diff={max_diff}"


@pytest.mark.parametrize("method", ["pcg", "pbicg"])
def test_case10k_complex_preconditioned(case_10k_complex, method):
    """sample6.cpp:151-163: Jacobi P = 1/diag on the 10K complex case."""
    sys_, answer = case_10k_complex
    A = _operator(sys_)
    M = lcg.JacobiPreconditioner(A)
    res = lcg.solve(A, jnp.asarray(sys_.b), method=method, M=M,
                    params=GOLDEN_PARAMS)
    assert res.converged, f"{method}: {res.status}"
    max_diff = np.max(np.abs(np.asarray(res.x) - answer))
    assert max_diff < 0.05, f"{method} max_diff={max_diff}"


def test_complex_f32_dtype(complex_sym_small):
    """The reference's float-complex stack (clcg_cudaf.cu) is a copy of the
    double stack; here dtype is a parameter — solve in complex64."""
    A, b, x_true = complex_sym_small
    res = lcg.solve(
        lcg.DenseOperator(A.astype(np.complex64)),
        jnp.asarray(b, dtype=jnp.complex64),
        method="bicg_sym",
        params=lcg.SolverParams(epsilon=1e-10),
    )
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=2e-2)
    assert res.x.dtype == jnp.complex64


def test_shadow_residual_determinism(complex_sym_small):
    A, b, _ = complex_sym_small
    r1 = lcg.solve(lcg.DenseOperator(A), b, method="cgs",
                   params=lcg.SolverParams(epsilon=1e-12))
    r2 = lcg.solve(lcg.DenseOperator(A), b, method="cgs",
                   params=lcg.SolverParams(epsilon=1e-12))
    assert int(r1.iterations) == int(r2.iterations)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))
    # A different key gives a different (but converging) trajectory.
    r3 = lcg.solve(lcg.DenseOperator(A), b, method="cgs",
                   params=lcg.SolverParams(epsilon=1e-12),
                   key=jax.random.PRNGKey(99))
    assert r3.converged


def test_operator_mode_consistency(complex_sym_small):
    """mv/rmv/cmv/hmv implement the 4 callback modes of clcg.h:40-41."""
    A, _, _ = complex_sym_small
    op = lcg.DenseOperator(A)
    v = np.random.default_rng(0).normal(size=(A.shape[1], 2)).view(np.complex128)[:, 0]
    vj = jnp.asarray(v)
    np.testing.assert_allclose(np.asarray(op.mv(vj)), A @ v, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.rmv(vj)), A.T @ v, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.cmv(vj)), np.conj(A) @ v, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.hmv(vj)), np.conj(A.T) @ v, atol=1e-12)


def test_matrix_free_transpose_modes(complex_sym_small):
    """jax.linear_transpose supplies rmv/hmv for matrix-free operators."""
    A, _, _ = complex_sym_small
    Aj = jnp.asarray(A)
    op = lcg.MatrixFreeOperator(lambda x: Aj @ x, n=A.shape[1], dtype=jnp.complex128)
    v = jnp.asarray(
        np.random.default_rng(1).normal(size=(A.shape[1], 2)).view(np.complex128)[:, 0]
    )
    np.testing.assert_allclose(np.asarray(op.rmv(v)), np.asarray(A.T @ np.asarray(v)),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.hmv(v)),
                               np.asarray(np.conj(A.T) @ np.asarray(v)), atol=1e-12)
