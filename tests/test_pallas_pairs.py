"""df64 pair-PCG whole-solve VMEM kernel (ops/pallas_pairs.py).

Interpreter-mode correctness on CPU: the kernel must reproduce the
pcg_pairs engine's iteration counts (df64 carries ~49 mantissa bits vs
f64's 52, so counts may shift by a couple on ill-conditioned systems —
on these controlled ones they match exactly) and the permuted
corner-block product must equal the scattered product.
"""

import numpy as np
import pytest

import liblcg_tpu as lcg
from liblcg_tpu.ops.pallas_pairs import (ScatteredPairKernelPlan,
                                         fits_in_vmem_pairs)


def _scattered_complex(n=300, k=12, seed=4):
    rng = np.random.default_rng(seed)
    diag = (3.0 + rng.uniform(0, 1, n)) + 1j * (0.4 + rng.uniform(0, .4, n))
    J = rng.choice(n, size=k, replace=False)
    pairs = [(J[i], J[j]) for i in range(k) for j in range(i + 1, k)
             if rng.random() < 0.4]
    rows = np.array([p[0] for p in pairs] + [p[1] for p in pairs]
                    + list(range(n)))
    cols = np.array([p[1] for p in pairs] + [p[0] for p in pairs]
                    + list(range(n)))
    cv = 0.3 * (rng.standard_normal(len(pairs))
                + 1j * rng.standard_normal(len(pairs)))
    vals = np.concatenate([cv, cv, diag])
    dense = np.zeros((n, n), complex)
    np.add.at(dense, (rows, cols), vals)
    x_true = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    return n, rows, cols, vals, dense @ x_true, x_true


def test_kernel_matches_pcg_pairs_iterations():
    n, rows, cols, vals, b, x_true = _scattered_complex()
    p = lcg.SolverParams(epsilon=1e-12, abs_diff=1)
    A = lcg.ScatteredOperator(n, rows, cols, vals)
    r_ref = lcg.solve_realified(A, b, method="pcg", M="jacobi", params=p)
    plan = ScatteredPairKernelPlan(n, rows, cols, vals)
    x, t, res = plan.solve(b, params=p, interpret=True)
    assert abs(int(t) - int(r_ref.iterations)) <= 2
    np.testing.assert_allclose(x, x_true, atol=1e-5)
    assert float(res) <= 1e-12


def test_kernel_relative_metric_and_diag_only():
    # Pure-diagonal system (kp block exists but k=0 couplings) under the
    # reference's relative ||r||^4 metric.
    n = 200
    rng = np.random.default_rng(7)
    diag = (2.0 + rng.uniform(0, 1, n)) + 1j * rng.uniform(0.1, 0.3, n)
    rows = cols = np.arange(n)
    x_true = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    b = diag * x_true
    plan = ScatteredPairKernelPlan(n, rows, cols, diag)
    assert plan.k == 0
    x, t, res = plan.solve(b, params=lcg.SolverParams(epsilon=1e-20),
                           interpret=True)
    # Jacobi-PCG on a diagonal system converges in one iteration.
    assert int(t) <= 2
    np.testing.assert_allclose(x, x_true, atol=1e-7)


def test_kernel_max_iter_and_guards():
    n, rows, cols, vals, b, _ = _scattered_complex(seed=9)
    plan = ScatteredPairKernelPlan(n, rows, cols, vals)
    _, t, res = plan.solve(
        b, params=lcg.SolverParams(epsilon=1e-30, abs_diff=1,
                                   max_iterations=3),
        interpret=True)
    assert int(t) == 3
    with pytest.raises(ValueError, match="diagonal"):
        ScatteredPairKernelPlan(3, [0, 1], [0, 1], [1.0 + 0j, 1.0 + 0j])
    assert not fits_in_vmem_pairs(1 << 22, 256)


def test_kernel_tfqmr_matches_pairs_engine():
    n, rows, cols, vals, b, x_true = _scattered_complex(seed=4)
    p = lcg.SolverParams(epsilon=1e-10, abs_diff=1)
    A = lcg.ScatteredOperator(n, rows, cols, vals)
    r_ref = lcg.solve_realified(A, b, method="tfqmr", params=p)
    plan = ScatteredPairKernelPlan(n, rows, cols, vals)
    x, t, res, st = plan.solve_tfqmr(b, params=p, interpret=True)
    assert int(st) == 0
    assert abs(int(t) - int(r_ref.iterations)) <= 2
    np.testing.assert_allclose(x, x_true, atol=1e-4)
    # max-iteration exit reports status 1 with half-step counting
    _, t2, _, st2 = plan.solve_tfqmr(
        b, params=lcg.SolverParams(epsilon=1e-30, abs_diff=1,
                                   max_iterations=4), interpret=True)
    assert int(st2) == 1 and int(t2) in (4, 5)


def test_solve_realified_pallas_tfqmr_route():
    n, rows, cols, vals, b, x_true = _scattered_complex(seed=15)
    A = lcg.ScatteredOperator(n, rows, cols, vals)
    p = lcg.SolverParams(epsilon=1e-10, abs_diff=1)
    r = lcg.solve_realified(A, b, method="tfqmr", params=p,
                            pallas="always")
    assert lcg.Status(int(r.status_code)) == lcg.Status.CONVERGENCE
    np.testing.assert_allclose(r.x, x_true, atol=1e-4)
    with pytest.raises(ValueError, match="unpreconditioned"):
        lcg.solve_realified(A, b, method="tfqmr", M="jacobi",
                            pallas="always")
    # auto never routes to the interpreter on CPU backends (slower than
    # the engine — and interpret-mode df64 is inexact, which stalls
    # tfqmr's drift-sensitive recurrence on hard spectra): it falls
    # through to the f64 engine and converges.
    r_auto = lcg.solve_realified(A, b, method="tfqmr", params=p,
                                 pallas="auto")
    assert lcg.Status(int(r_auto.status_code)) == lcg.Status.CONVERGENCE


def test_solve_realified_pallas_route():
    """pallas='always' routes to the kernel (interpreter on CPU), with
    eligibility errors naming the reason; 'never' keeps the engine."""
    n, rows, cols, vals, b, x_true = _scattered_complex(seed=13)
    A = lcg.ScatteredOperator(n, rows, cols, vals)
    p = lcg.SolverParams(epsilon=1e-12, abs_diff=1)
    r = lcg.solve_realified(A, b, method="pcg", M="jacobi", params=p,
                            pallas="always")
    assert lcg.Status(int(r.status_code)) == lcg.Status.CONVERGENCE
    np.testing.assert_allclose(r.x, x_true, atol=1e-5)
    # plan caching on the operator
    assert hasattr(A, "_pair_kernel_plan")
    with pytest.raises(ValueError, match="pcg"):
        lcg.solve_realified(A, b, method="bicg_sym", pallas="always")
    with pytest.raises(ValueError, match="ScatteredOperator"):
        dense = np.zeros((n, n), complex)
        np.add.at(dense, (rows, cols), vals)
        lcg.solve_realified(lcg.DenseOperator(dense), b, method="pcg",
                            M="jacobi", pallas="always")
    with pytest.raises(ValueError, match="monitor"):
        lcg.solve_realified(A, b, method="pcg", M="jacobi",
                            monitor=lambda x, res, t: t > 3,
                            pallas="always")
    with pytest.raises(ValueError, match="never"):
        lcg.solve_realified(A, b, method="pcg", M="jacobi", pallas="bogus")
    # auto on CPU: interpreter is slower than the engine -> engine path
    r2 = lcg.solve_realified(A, b, method="pcg", M="jacobi", params=p,
                             pallas="auto")
    assert lcg.Status(int(r2.status_code)) == lcg.Status.CONVERGENCE


def test_plan_permutation_roundtrip():
    n, rows, cols, vals, b, x_true = _scattered_complex(seed=11)
    plan = ScatteredPairKernelPlan(n, rows, cols, vals)
    b4 = np.asarray(plan.pack_b(b))
    # unpack(pack) on the solution layout: inverse permutation restores
    # the user's ordering.
    x4 = np.zeros((4, plan.n_pad), np.float32)
    z = np.asarray(b, np.complex128)[plan.perm]
    x4[0, :n] = z.real.astype(np.float32)
    x4[2, :n] = z.imag.astype(np.float32)
    np.testing.assert_allclose(plan.unpack_x(x4), b, rtol=1e-6)
    assert b4.shape == (4, plan.n_pad)
