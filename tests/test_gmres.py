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


def test_gmres_counts_operator_products_and_exits_early():
    """t counts operator products (like every other engine), and the
    recurred Givens residual exits mid-cycle: a well-conditioned system
    converges in far fewer products than one restart cycle."""
    rng = np.random.default_rng(3)
    n = 120
    A = np.eye(n) * 4 + rng.uniform(-1, 1, (n, n)) / np.sqrt(n)
    x_true = rng.uniform(1, 2, n)
    b = A @ x_true
    res = lcg.solve(A, b, method="gmres", restart=64,
                    params=lcg.SolverParams(epsilon=1e-16))
    assert res.converged
    assert 1 < int(res.iterations) < 30      # products, not cycles
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-6)


def test_gmres_respects_max_iterations_in_products():
    rng = np.random.default_rng(5)
    n = 80
    A = np.eye(n) * 2 + rng.uniform(-1, 1, (n, n)) / np.sqrt(n)
    b = rng.normal(size=n)
    res = lcg.solve(A, b, method="gmres", restart=16,
                    params=lcg.SolverParams(epsilon=1e-30, max_iterations=10))
    assert int(res.status_code) == int(lcg.Status.REACHED_MAX_ITERATIONS)
    assert int(res.iterations) <= 10


def test_gmres_ill_conditioned_f32():
    """cond(A) ~ 1e5 in f32: the Givens QR converges to near the f32
    floor — the normal-equations formulation (cond squared ~ 1e10) could
    not represent the small singular values at all."""
    rng = np.random.default_rng(11)
    n = 64
    U = np.linalg.qr(rng.normal(size=(n, n)))[0]
    V = np.linalg.qr(rng.normal(size=(n, n)))[0]
    A = (U * np.logspace(0, -5, n)) @ V.T
    x_true = rng.uniform(1, 2, n)
    b = A @ x_true
    res = lcg.solve(A.astype(np.float32), b.astype(np.float32),
                    method="gmres", restart=64,
                    params=lcg.SolverParams(epsilon=1e-9, max_iterations=500))
    assert res.converged
    x = np.asarray(res.x, np.float64)
    relres = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert relres < 1e-5


def test_gmres_batched_matches_single():
    rng = np.random.default_rng(3)
    n = 96
    A = np.eye(n) * 4 + rng.uniform(-1, 1, (n, n)) / np.sqrt(n)
    X = np.stack([rng.uniform(1, 2, n) for _ in range(3)])
    B = X @ A.T
    params = lcg.SolverParams(epsilon=1e-16)
    rb = lcg.solve_batched(A, B, method="gmres", params=params)
    assert np.all(np.asarray(rb.status_code) == int(lcg.Status.CONVERGENCE))
    np.testing.assert_allclose(np.asarray(rb.x), X, atol=1e-6)
    single = lcg.solve(A, B[1], method="gmres", params=params)
    assert int(np.asarray(rb.iterations)[1]) == int(single.iterations)


def test_minres_batched():
    rng = np.random.default_rng(8)
    n = 72
    M = rng.uniform(-1, 1, (n, n))
    S = (M + M.T) / 2 - 1.5 * np.eye(n) + 4 * np.eye(n)
    X = np.stack([rng.uniform(1, 2, n) for _ in range(3)])
    B = X @ S.T
    rb = lcg.solve_batched(S, B, method="minres",
                           params=lcg.SolverParams(epsilon=1e-18))
    assert np.all(np.asarray(rb.status_code) == int(lcg.Status.CONVERGENCE))
    np.testing.assert_allclose(np.asarray(rb.x), X, atol=1e-6)


def test_pgmres_batched():
    rng = np.random.default_rng(9)
    n = 64
    A = np.diag(np.linspace(1, 50, n)) + rng.uniform(-1, 1, (n, n)) / n
    X = np.stack([rng.uniform(1, 2, n) for _ in range(2)])
    B = X @ A.T
    M = lcg.JacobiPreconditioner(lcg.DenseOperator(A))
    rb = lcg.solve_batched(A, B, method="pgmres", M=M,
                           params=lcg.SolverParams(epsilon=1e-16))
    assert np.all(np.asarray(rb.status_code) == int(lcg.Status.CONVERGENCE))
    np.testing.assert_allclose(np.asarray(rb.x), X, atol=1e-6)


def test_gmres_trace_records_every_product():
    rng = np.random.default_rng(3)
    n = 120
    A = np.eye(n) * 4 + rng.uniform(-1, 1, (n, n)) / np.sqrt(n)
    b = A @ rng.uniform(1, 2, n)
    res = lcg.solve(A, b, method="gmres", restart=8, trace_len=16,
                    params=lcg.SolverParams(epsilon=1e-16))
    tr = np.asarray(res.trace)[: int(res.iterations)]
    # Dense per-product history (not just cycle boundaries), decreasing.
    assert np.count_nonzero(tr) >= len(tr) - 1
    assert tr[0] > tr[-1]


def test_gmres_batched_per_system_counts_match_single():
    """A trivially-easy system in a batch must report its own product
    count, not be charged the whole cycle the harder system needs."""
    rng = np.random.default_rng(3)
    n = 100
    A = np.diag(np.linspace(1, 60, n)) + rng.uniform(-1, 1, (n, n)) / n
    w, V = np.linalg.eig(A)
    B = np.stack([np.real(V[:, 0]), rng.normal(size=n)])
    params = lcg.SolverParams(epsilon=1e-16)
    rb = lcg.solve_batched(A, B, method="gmres", restart=80, params=params)
    singles = [int(lcg.solve(A, B[i], method="gmres", restart=80,
                             params=params).iterations) for i in range(2)]
    assert list(np.asarray(rb.iterations)) == singles


def test_gmres_hard_cap_bounds_inner_loop():
    """With max_iterations=0 the hard iteration cap bounds the products
    (a cycle may no longer overshoot it)."""
    rng = np.random.default_rng(5)
    n = 64
    A = np.eye(n) + rng.uniform(-1, 1, (n, n)) / 50
    b = rng.normal(size=n)
    params = lcg.SolverParams(epsilon=1e-30, max_iterations=0,
                              hard_iteration_cap=7)
    res = lcg.solve(A, b, method="gmres", restart=32, params=params)
    # Harness convention: a hard-cap exit lands at most one past the cap
    # (same as every per-product engine).
    assert int(res.iterations) <= 8
