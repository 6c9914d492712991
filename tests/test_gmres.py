"""Restarted GMRES(m) tests — real/complex, preconditioned, multi-cycle
restarts, sharded."""

import numpy as np
import jax.numpy as jnp
import pytest

import liblcg_tpu as lcg


def _nonsym(n=120, seed=3):
    rng = np.random.default_rng(seed)
    A = np.diag(3.0 + rng.uniform(0, 1, n)) + 0.5 * rng.normal(size=(n, n)) / np.sqrt(n)
    x_true = rng.normal(size=n)
    return A, A @ x_true, x_true


def test_gmres_nonsymmetric():
    A, b, x_true = _nonsym()
    res = lcg.solve(lcg.DenseOperator(A), b, method="gmres",
                    params=lcg.SolverParams(epsilon=1e-14), restart=30)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-8)


def test_gmres_multicycle_restarts():
    """restart smaller than needed -> several cycles, still converges."""
    A, b, x_true = _nonsym()
    res = lcg.solve(lcg.DenseOperator(A), b, method="gmres",
                    params=lcg.SolverParams(epsilon=1e-14), restart=8)
    assert res.converged
    assert int(res.iterations) > 1          # several restart cycles
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-6)


def test_pgmres_jacobi():
    A, b, x_true = _nonsym()
    M = lcg.JacobiPreconditioner(np.diag(A))
    res = lcg.solve(lcg.DenseOperator(A), b, method="pgmres", M=M,
                    params=lcg.SolverParams(epsilon=1e-14), restart=20)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-7)


def test_gmres_complex():
    rng = np.random.default_rng(5)
    n = 96
    Mx = (rng.uniform(-1, 1, (n, n)) + 1j * rng.uniform(-1, 1, (n, n))) / np.sqrt(n)
    A = Mx + (4 + 1j) * np.eye(n)
    x_true = rng.normal(size=n) + 1j * rng.normal(size=n)
    b = A @ x_true
    res = lcg.solve(lcg.DenseOperator(A), jnp.asarray(b), method="gmres",
                    params=lcg.SolverParams(epsilon=1e-18), restart=40)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-8)


def test_gmres_sharded(spd_small):
    """GMRES over the mesh: the CGS2 matmuls psum across shards."""
    from liblcg_tpu.parallel import ShardedSparseOperator, solve_sharded

    A, b, x_true = spd_small
    rows, cols = np.nonzero(A)
    Ash = ShardedSparseOperator(len(b), rows, cols, A[rows, cols], n_devices=8)
    res = solve_sharded(Ash, b, method="gmres", restart=16,
                        params=lcg.SolverParams(epsilon=1e-14))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-6)


def test_gmres_matches_case10k(case_10k):
    sys_, answer = case_10k
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    res = lcg.solve(A, jnp.asarray(sys_.b), method="gmres", restart=40,
                    params=lcg.SolverParams(epsilon=1e-12))
    assert res.converged
    err = np.sqrt(np.sum((np.asarray(res.x) - answer) ** 2)) / sys_.n
    assert err < 1e-5


def test_minres_symmetric_indefinite():
    rng = np.random.default_rng(2)
    n = 100
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eig = np.concatenate([rng.uniform(1, 5, n // 2),
                          rng.uniform(-5, -1, n - n // 2)])
    A = Q @ np.diag(eig) @ Q.T
    x_true = rng.normal(size=n)
    b = A @ x_true
    res = lcg.solve(lcg.DenseOperator(A), b, method="minres",
                    params=lcg.SolverParams(epsilon=1e-14))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-6)


def test_minres_spd_and_sharded(spd_small):
    from liblcg_tpu.parallel import ShardedSparseOperator, solve_sharded

    A, b, x_true = spd_small
    res = lcg.solve(lcg.DenseOperator(A), b, method="minres",
                    params=lcg.SolverParams(epsilon=1e-13))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-4)
    rows, cols = np.nonzero(A)
    Ash = ShardedSparseOperator(len(b), rows, cols, A[rows, cols], n_devices=8)
    rs = solve_sharded(Ash, b, method="minres",
                       params=lcg.SolverParams(epsilon=1e-13))
    assert rs.converged
    np.testing.assert_allclose(np.asarray(rs.x), x_true, atol=1e-4)


def test_minres_rejects_complex(complex_sym_small):
    A, b, _ = complex_sym_small
    with pytest.raises(ValueError):
        lcg.solve(lcg.DenseOperator(A), b, method="minres")


def test_pminres_indefinite_and_spd(spd_small):
    rng = np.random.default_rng(2)
    n = 100
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eig = np.concatenate([rng.uniform(1, 5, n // 2),
                          rng.uniform(-5, -1, n - n // 2)])
    A = Q @ np.diag(eig) @ Q.T
    x_true = rng.normal(size=n)
    b = A @ x_true
    M = lcg.JacobiPreconditioner(np.abs(np.diag(A)) + 1.0)  # SPD M required
    res = lcg.solve(lcg.DenseOperator(A), b, method="pminres", M=M,
                    params=lcg.SolverParams(epsilon=1e-16))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-6)

    As, bs, xs = spd_small
    M2 = lcg.JacobiPreconditioner(np.diag(As))
    r2 = lcg.solve(lcg.DenseOperator(As), bs, method="pminres", M=M2,
                   params=lcg.SolverParams(epsilon=1e-15))
    assert r2.converged
    np.testing.assert_allclose(np.asarray(r2.x), xs, atol=1e-4)
