"""Warm restart / resume (SURVEY §5: solver state is a pytree, the solution
is in/out like the reference's m vector, lcg.h:61), mixed-precision
reductions, and the timing/stats utilities."""

import numpy as np
import jax.numpy as jnp
import pytest

import liblcg_tpu as lcg


def test_warm_restart_resumes(spd_small):
    """Stopping at max_iterations and re-entering with x0 = previous x
    continues the solve (the reference's 'call again' restart)."""
    A, b, x_true = spd_small
    op = lcg.DenseOperator(A)
    one_shot = lcg.solve(op, b, params=lcg.SolverParams(epsilon=1e-12))
    total = int(one_shot.iterations)

    part1 = lcg.solve(op, b, params=lcg.SolverParams(epsilon=1e-12,
                                                     max_iterations=total // 2))
    assert part1.status == lcg.Status.REACHED_MAX_ITERATIONS
    part2 = lcg.solve(op, b, x0=part1.x, params=lcg.SolverParams(epsilon=1e-12))
    assert part2.converged
    np.testing.assert_allclose(np.asarray(part2.x), x_true, atol=2e-4)
    # Restart loses the Krylov direction history, so it may cost a few
    # extra iterations — but not a from-scratch count.
    assert int(part1.iterations) + int(part2.iterations) <= 2 * total


def test_mixed_precision_reduce_dtype(spd_small):
    """f32 storage + f64 dot accumulation converges tighter than pure f32."""
    A, b, x_true = spd_small
    op = lcg.DenseOperator(A.astype(np.float32))
    b32 = jnp.asarray(b, jnp.float32)
    pure = lcg.solve(op, b32, params=lcg.SolverParams(epsilon=1e-11))
    mixed = lcg.solve(
        op, b32,
        params=lcg.SolverParams(epsilon=1e-11, reduce_dtype="float64"),
    )
    assert mixed.x.dtype == jnp.float32  # storage dtype preserved
    assert mixed.converged
    err_mixed = np.max(np.abs(np.asarray(mixed.x, dtype=np.float64) - x_true))
    assert err_mixed < 5e-3
    # Pure f32 must also run; mixed should not be (much) worse.
    err_pure = np.max(np.abs(np.asarray(pure.x, dtype=np.float64) - x_true))
    assert err_mixed <= err_pure * 2 + 1e-6


def test_timed_solve_stats(case_10k):
    sys_, _ = case_10k
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    res, stats = lcg.timed_solve(A, jnp.asarray(sys_.b),
                                 params=lcg.SolverParams(epsilon=1e-12))
    assert res.converged
    assert stats.iterations == int(res.iterations)
    assert stats.wall_ms > 0
    assert stats.nnz == A.nnz
    assert stats.nnz_per_s and stats.nnz_per_s > 0
    assert "iters" in str(stats)


def test_profile_solve(tmp_path, spd_small):
    A, b, _ = spd_small
    res = lcg.profile_solve(str(tmp_path), lcg.DenseOperator(A), b)
    assert res.converged
    # a trace directory was produced
    assert any(tmp_path.iterdir())
