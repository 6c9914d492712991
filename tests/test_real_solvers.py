"""Real-domain solver tests: convergence, accuracy and status semantics.

Modeled on the reference's self-checking samples (sample1/2/5: all seven
real solvers on a manufactured SPD system; sample8: the shipped 10K sparse
case solved to eps=1e-6 relative).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import liblcg_tpu as lcg


REAL_UNCONSTRAINED = ["cg", "cgs", "bicgstab", "bicgstab2"]


@pytest.mark.parametrize("method", REAL_UNCONSTRAINED)
def test_dense_spd_converges(spd_small, method):
    A, b, x_true = spd_small
    # The relative criterion is a *squared-norm* ratio (lcg.cpp:208-209), so
    # eps=1e-6 only guarantees ||r|| ~ 1e-3 ||x||; tighten for an accuracy check.
    params = lcg.SolverParams(epsilon=1e-12)
    res = lcg.solve(lcg.DenseOperator(A), b, method=method, params=params)
    assert res.status in (lcg.Status.CONVERGENCE, lcg.Status.ALREADY_OPTIMIZED)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=0, atol=2e-4)


def test_pcg_jacobi_dense(spd_small):
    A, b, x_true = spd_small
    op = lcg.DenseOperator(A)
    M = lcg.JacobiPreconditioner(op)
    res = lcg.solve(op, b, method="pcg", M=M)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=2e-3)


@pytest.mark.parametrize("method", ["pg", "spg"])
def test_constrained_solvers_respect_box(spd_small, method):
    A, b, x_true = spd_small  # x_true in [1, 2]
    n = len(b)
    lower = np.full(n, 1.0)
    upper = np.full(n, 2.0)
    params = lcg.SolverParams(epsilon=1e-8, max_iterations=2000)
    res = lcg.solve(
        lcg.DenseOperator(A), b, method=method, lower=lower, upper=upper,
        params=params,
    )
    x = np.asarray(res.x)
    assert np.all(x >= 1.0 - 1e-12) and np.all(x <= 2.0 + 1e-12)
    # PG/BB iterations are not monotone and the residual metric is the
    # squared-norm ratio; just require a decent solution.
    np.testing.assert_allclose(x, x_true, atol=5e-2)


@pytest.mark.parametrize("method", REAL_UNCONSTRAINED)
def test_case10k_golden(case_10k, method):
    sys, answer = case_10k
    A = lcg.SparseOperator(
        sys.n, sys.n, sys.rows, sys.cols, sys.vals, assume_symmetric=True
    )
    # eps here is the squared-norm-ratio metric (lcg.cpp:208-209); 1e-12
    # corresponds to ||r||/||x|| ~ 1e-6.
    res = lcg.solve(
        A, jnp.asarray(sys.b), method=method, params=lcg.SolverParams(epsilon=1e-12)
    )
    assert res.converged, f"{method}: {res.status}"
    x = np.asarray(res.x)
    # sample8.cu:66-74 oracle: avg error vs the shipped answer.
    avg_err = np.sqrt(np.sum((x - answer) ** 2)) / sys.n
    assert avg_err < 1e-5, f"{method} avg_err={avg_err}"


def test_case10k_pcg_jacobi(case_10k):
    sys, answer = case_10k
    A = lcg.SparseOperator(
        sys.n, sys.n, sys.rows, sys.cols, sys.vals, assume_symmetric=True
    )
    M = lcg.JacobiPreconditioner(A)
    res = lcg.solve(
        A, jnp.asarray(sys.b), method="pcg", M=M,
        params=lcg.SolverParams(epsilon=1e-12),
    )
    assert res.converged
    avg_err = np.sqrt(np.sum((np.asarray(res.x) - answer) ** 2)) / sys.n
    assert avg_err < 1e-5
    # Jacobi should not be slower than plain CG on this diagonally
    # dominant-ish system by a large margin; sanity cap only.
    assert int(res.iterations) < 2000


def test_already_optimized(spd_small):
    A, b, x_true = spd_small
    res = lcg.solve(lcg.DenseOperator(A), b, x0=jnp.asarray(x_true))
    assert res.status == lcg.Status.ALREADY_OPTIMIZED
    assert int(res.iterations) == 0


def test_max_iterations_status(spd_small):
    A, b, _ = spd_small
    params = lcg.SolverParams(max_iterations=2, epsilon=1e-14)
    res = lcg.solve(lcg.DenseOperator(A), b, params=params)
    assert res.status == lcg.Status.REACHED_MAX_ITERATIONS
    assert int(res.iterations) == 2


def test_monitor_stop(spd_small):
    A, b, _ = spd_small

    def monitor(x, residual, t):
        return t >= 3

    res = lcg.solve(lcg.DenseOperator(A), b, monitor=monitor)
    assert res.status == lcg.Status.STOP
    assert int(res.iterations) == 3


def test_nan_detection():
    # Singular operator that produces NaN via 0/0 in the step size.
    n = 8
    A = np.zeros((n, n))
    b = np.ones(n)
    res = lcg.solve(lcg.DenseOperator(A), b)
    assert res.status == lcg.Status.NAN_VALUE


def test_trace_records_residuals(spd_small):
    A, b, _ = spd_small
    res = lcg.solve(lcg.DenseOperator(A), b, trace_len=64)
    tr = np.asarray(res.trace)
    it = int(res.iterations)
    assert tr[0] > 0
    # Residuals up to the recorded horizon are populated.
    assert np.all(tr[: min(it, 64)] > 0)


def test_abs_diff_mode(spd_small):
    A, b, x_true = spd_small
    params = lcg.SolverParams(abs_diff=1, epsilon=1e-9)
    res = lcg.solve(lcg.DenseOperator(A), b, params=params)
    assert res.converged
    # abs_diff metric is sqrt(||r||^2)/n (lcg.cpp:186).
    r = b - A @ np.asarray(res.x)
    assert np.sqrt(np.sum(r * r)) / len(b) <= 1e-9


def test_invalid_params_status(spd_small):
    A, b, _ = spd_small
    res = lcg.solve(lcg.DenseOperator(A), b, params=lcg.SolverParams(epsilon=2.0))
    assert res.status == lcg.Status.INVALID_EPSILON
    res = lcg.solve(
        lcg.DenseOperator(A), b, params=lcg.SolverParams(max_iterations=-1)
    )
    assert res.status == lcg.Status.INVALID_MAX_ITERATIONS


def test_matrix_free_operator(spd_small):
    A, b, x_true = spd_small
    Aj = jnp.asarray(A)
    op = lcg.MatrixFreeOperator(lambda x: Aj @ x, n=len(b), dtype=jnp.float64)
    res = lcg.solve(op, b)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=2e-3)


def test_normal_eq_operator():
    rng = np.random.default_rng(3)
    K = rng.uniform(-1, 1, size=(100, 80))
    x_true = rng.uniform(1, 2, size=80)
    b = K.T @ (K @ x_true)
    op = lcg.NormalEqOperator(lcg.DenseOperator(K))
    res = lcg.solve(op, b, params=lcg.SolverParams(epsilon=1e-10))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-3)


def test_solver_name_aliases():
    assert lcg.canonical_method("LCG_CG") == "cg"
    assert lcg.canonical_method("LCG_BICGSTAB2") == "bicgstab2"
    assert lcg.canonical_method("CLCG_TFQMR") == "tfqmr"
    with pytest.raises(ValueError):
        lcg.canonical_method("nope")


def test_check_raises_on_failure(spd_small):
    A, b, _ = spd_small
    with pytest.raises(lcg.LcgError):
        lcg.solve(lcg.DenseOperator(A), b, check=True,
                  params=lcg.SolverParams(max_iterations=1, epsilon=1e-14))
    # success statuses never raise
    res = lcg.solve(lcg.DenseOperator(A), b, check=True)
    assert res.converged
