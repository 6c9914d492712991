"""Pipelined CG tests: iteration parity with classic CG and preconditioned
/ batched / sharded operation."""

import numpy as np
import jax.numpy as jnp
import pytest

import liblcg_tpu as lcg


def test_cgp_matches_cg_on_case10k(case_10k):
    sys_, answer = case_10k
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    b = jnp.asarray(sys_.b)
    params = lcg.SolverParams(epsilon=1e-12)
    cg = lcg.solve(A, b, method="cg", params=params)
    cgp = lcg.solve(A, b, method="cgp", params=params)
    assert cgp.converged
    # One fused reduction point vs two: same Krylov space, parity within a
    # couple of iterations of finite-precision drift.
    assert abs(int(cgp.iterations) - int(cg.iterations)) <= 3
    err = np.sqrt(np.sum((np.asarray(cgp.x) - answer) ** 2)) / sys_.n
    assert err < 1e-5


def test_pcgp_jacobi(spd_small):
    A, b, x_true = spd_small
    op = lcg.DenseOperator(A)
    M = lcg.JacobiPreconditioner(op)
    res = lcg.solve(op, b, method="pcgp", M=M,
                    params=lcg.SolverParams(epsilon=1e-12))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=2e-4)


def test_cgp_batched(spd_small):
    A, b, x_true = spd_small
    B = np.stack([b, 2.0 * b, 0.5 * b])
    res = lcg.solve_batched(lcg.DenseOperator(A), B, method="cgp",
                            params=lcg.SolverParams(epsilon=1e-12))
    assert np.all(np.asarray(res.status_code) >= 0)
    np.testing.assert_allclose(np.asarray(res.x[0]), x_true, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.x[1]), 2 * x_true, atol=4e-4)


def test_cgp_sharded(spd_small):
    from liblcg_tpu.parallel import ShardedSparseOperator, solve_sharded

    A, b, x_true = spd_small
    rows, cols = np.nonzero(A)
    Ash = ShardedSparseOperator(len(b), rows, cols, A[rows, cols], n_devices=8)
    res = solve_sharded(Ash, b, method="cgp",
                        params=lcg.SolverParams(epsilon=1e-12))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=2e-4)


def test_cgp_alias():
    assert lcg.canonical_method("cgp") == "cg_pipelined"
    assert lcg.canonical_method("pcgp") == "pcg_pipelined"


def test_cgf_matches_cg_on_case10k(case_10k):
    sys_, answer = case_10k
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    b = jnp.asarray(sys_.b)
    params = lcg.SolverParams(epsilon=1e-12)
    cg = lcg.solve(A, b, method="cg", params=params)
    cgf = lcg.solve(A, b, method="cgf", params=params)
    assert cgf.converged
    assert abs(int(cgf.iterations) - int(cg.iterations)) <= 2
    err = np.sqrt(np.sum((np.asarray(cgf.x) - answer) ** 2)) / sys_.n
    assert err < 1e-5


def test_cgf_batched(spd_small):
    A, b, x_true = spd_small
    B = np.stack([b, 0.5 * b])
    res = lcg.solve_batched(lcg.DenseOperator(A), B, method="cgf",
                            params=lcg.SolverParams(epsilon=1e-12))
    assert np.all(np.asarray(res.status_code) >= 0)
    np.testing.assert_allclose(np.asarray(res.x[0]), x_true, atol=2e-4)


def test_cgf_alias():
    assert lcg.canonical_method("cgf") == "cg_fused"
