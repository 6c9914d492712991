"""Object-oriented API tests, modeled on the reference's class-based samples
(sample2: LCG_Solver subclass, all real solvers, abs_diff=1; sample4:
CLCG_Solver subclass on the shipped complex case)."""

import numpy as np
import jax.numpy as jnp
import pytest

import liblcg_tpu as lcg


class DenseSolver(lcg.LCGSolver):
    """sample2.cpp pattern: subclass owns the kernel, overrides AxProduct."""

    def __init__(self, A):
        super().__init__()
        self.A = jnp.asarray(A)

    def AxProduct(self, x):
        return self.A @ x

    def MxProduct(self, x):
        return x / jnp.diagonal(self.A)


@pytest.fixture(scope="module")
def solver(spd_small_module):
    A, b, x_true = spd_small_module
    return DenseSolver(A).silent(), b, x_true


@pytest.fixture(scope="module")
def spd_small_module():
    rng = np.random.default_rng(42)
    m, n = 100, 80
    K = rng.uniform(-1.0, 1.0, size=(m, n))
    A = K.T @ K + 0.1 * np.eye(n)
    x_true = rng.uniform(1.0, 2.0, size=n)
    return A, A @ x_true, x_true


@pytest.mark.parametrize("method", ["cg", "cgs", "bicgstab", "bicgstab2"])
def test_minimize(solver, method):
    s, b, x_true = solver
    res = s.Minimize(b, method=method, params=lcg.SolverParams(epsilon=1e-12))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=2e-4)


def test_minimize_preconditioned(solver):
    s, b, x_true = solver
    res = s.MinimizePreconditioned(b, params=lcg.SolverParams(epsilon=1e-12))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=2e-4)


def test_minimize_constrained(solver):
    s, b, x_true = solver
    n = len(b)
    res = s.MinimizeConstrained(
        b, np.full(n, 1.0), np.full(n, 2.0), method="spg",
        params=lcg.SolverParams(epsilon=1e-8, max_iterations=2000),
    )
    x = np.asarray(res.x)
    assert np.all(x >= 1 - 1e-12) and np.all(x <= 2 + 1e-12)
    np.testing.assert_allclose(x, x_true, atol=5e-2)


def test_progress_override_stops():
    class Stopper(DenseSolver):
        def Progress(self, x, residual, t):
            return t >= 4

    rng = np.random.default_rng(1)
    K = rng.uniform(-1, 1, (60, 50))
    A = K.T @ K + 0.1 * np.eye(50)
    s = Stopper(A).silent()
    res = s.Minimize(A @ np.ones(50))
    assert res.status == lcg.Status.STOP
    assert int(res.iterations) == 4


def test_throw_errors():
    class Singular(lcg.LCGSolver):
        def AxProduct(self, x):
            return jnp.zeros_like(x)

    s = Singular().silent().throw_errors()
    s._silent = False  # force the reporting path to exercise raise
    import io as _io
    import contextlib
    with contextlib.redirect_stderr(_io.StringIO()):
        with pytest.raises(lcg.LcgError):
            s.Minimize(np.ones(8))


def test_report_prints(capsys):
    rng = np.random.default_rng(2)
    K = rng.uniform(-1, 1, (40, 30))
    A = K.T @ K + 0.1 * np.eye(30)
    s = DenseSolver(A).set_report_interval(10)
    s.Minimize(A @ np.ones(30))
    err = capsys.readouterr().err
    assert "Solver: CG. Time cost:" in err
    assert "Iteration-times:" in err
    assert "Success" in err


class ComplexDense(lcg.CLCGSolver):
    def __init__(self, A):
        super().__init__()
        self.A = jnp.asarray(A)

    def AxProduct(self, x):
        return self.A @ x

    def MxProduct(self, x):
        return x / jnp.diagonal(self.A)


def test_complex_class_minimize():
    rng = np.random.default_rng(7)
    n = 40
    M = rng.uniform(-1, 1, (n, n)) + 1j * rng.uniform(-1, 1, (n, n))
    A = (M + M.T) / 2 + (3 + 0.5j) * np.eye(n)
    x_true = rng.uniform(1, 2, n) + 1j * rng.uniform(-1, 1, n)
    b = A @ x_true
    s = ComplexDense(A).silent()
    for method in ("bicg", "bicg_sym", "cgs", "tfqmr"):
        res = s.Minimize(b, method=method, params=lcg.SolverParams(epsilon=1e-18))
        assert res.converged, method
        np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-4)
    res = s.MinimizePreconditioned(b, method="pbicg",
                                   params=lcg.SolverParams(epsilon=1e-18))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-4)


def test_minimize_with_extra_methods(spd_small_module):
    """The OO layer routes the extended method set too."""
    A, b, x_true = spd_small_module
    s = DenseSolver(A).silent().set_parameters(lcg.SolverParams(epsilon=1e-12))
    for m in ("gmres", "minres", "cgf"):
        res = s.Minimize(b, method=m)
        assert res.converged, m
        np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-3)
