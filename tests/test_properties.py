"""Property tests (SURVEY §4's suggested additions beyond the reference's
sample-based strategy): CG's A-norm error monotonicity, residual-trace
decrease, and solver self-consistency across methods."""

import numpy as np
import jax.numpy as jnp
import pytest

import liblcg_tpu as lcg


@pytest.fixture(scope="module")
def spd():
    rng = np.random.default_rng(10)
    n = 60
    K = rng.uniform(-1, 1, (80, n))
    A = K.T @ K + 0.5 * np.eye(n)
    x_true = rng.normal(size=n)
    return A, A @ x_true, x_true


def test_cg_a_norm_error_monotone(spd):
    """||x_k - x*||_A decreases monotonically for CG (the defining CG
    optimality property).  Checked by re-running with increasing
    max_iterations — each prefix of the same deterministic recurrence."""
    A, b, x_true = spd
    op = lcg.DenseOperator(A)
    errs = []
    for k in (1, 2, 4, 8, 16, 32):
        res = lcg.solve(op, b, params=lcg.SolverParams(max_iterations=k,
                                                       epsilon=1e-30))
        e = np.asarray(res.x) - x_true
        errs.append(float(e @ A @ e))
    assert all(b < a * (1 + 1e-12) for a, b in zip(errs, errs[1:])), errs


def test_residual_trace_decreases_overall(spd):
    A, b, _ = spd
    res = lcg.solve(lcg.DenseOperator(A), b, trace_len=128,
                    params=lcg.SolverParams(epsilon=1e-12))
    tr = np.asarray(res.trace)[: int(res.iterations)]
    # CG residual metric is not strictly monotone, but must decrease by
    # orders of magnitude overall.
    assert tr[-1] < tr[0] * 1e-8


def test_methods_agree_on_solution(spd):
    """Cross-method consistency (the reference's own sample strategy:
    several solvers on one system check each other, sample1.cpp)."""
    A, b, _ = spd
    op = lcg.DenseOperator(A)
    xs = []
    for m in ("cg", "cgp", "cgs", "bicgstab", "bicgstab2"):
        res = lcg.solve(op, b, method=m, params=lcg.SolverParams(epsilon=1e-14))
        assert res.converged, m
        xs.append(np.asarray(res.x))
    for xi in xs[1:]:
        np.testing.assert_allclose(xi, xs[0], atol=1e-5)


def test_solution_satisfies_system(case_10k):
    """Direct residual check on the golden case: ||Ax - b|| small in the
    metric the reference's stopping rule implies."""
    sys_, _ = case_10k
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    b = jnp.asarray(sys_.b)
    res = lcg.solve(A, b, params=lcg.SolverParams(epsilon=1e-12))
    r = np.asarray(b) - np.asarray(A.mv(res.x))
    x = np.asarray(res.x)
    metric = (r @ r) / max(x @ x, 1.0)
    assert metric <= 1e-12 * 1.01


@pytest.mark.parametrize("method", ["cg", "cgf", "cgp", "cgs", "bicgstab",
                                    "bicgstab2", "minres", "gmres"])
def test_float32_dtype_sweep(spd, method):
    """Every real engine is dtype-polymorphic: f32 storage end to end.

    Pipelined CG's recurred residual drifts from the true one in finite
    precision (the documented cgp trade-off), so its reachable f32
    tolerance is looser.
    """
    A, b, x_true = spd
    eps = 1e-7 if method == "cgp" else 1e-9
    op = lcg.DenseOperator(A.astype(np.float32))
    res = lcg.solve(op, jnp.asarray(b, jnp.float32), method=method,
                    params=lcg.SolverParams(epsilon=eps))
    assert res.x.dtype == jnp.float32
    assert res.converged, f"{method}: {res.status}"
    np.testing.assert_allclose(np.asarray(res.x, np.float64), x_true,
                               atol=5e-2)
