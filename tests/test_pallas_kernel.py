"""Whole-solve Pallas CG kernel (VMEM-resident) — interpret-mode tests.

The kernel keeps the complete solver state in VMEM and runs the entire
while-loop inside one pallas_call; on CPU it runs through the Pallas
interpreter, which validates the kernel logic (ref mutation inside
lax.while_loop, lane-shifted DIA product, SMEM scalar outputs).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import liblcg_tpu as lcg
from liblcg_tpu.ops.pallas_cg import fits_in_vmem, solve_cg_vmem


def test_kernel_matches_engine_on_case10k(case_10k):
    sys_, answer = case_10k
    A = lcg.BandedOperator(sys_.n, sys_.n, sys_.rows, sys_.cols,
                           sys_.vals.astype(np.float32))
    assert fits_in_vmem(sys_.n, A.n_diagonals)
    params = lcg.SolverParams(epsilon=1e-11)
    x, t, res = solve_cg_vmem(A, jnp.asarray(sys_.b, jnp.float32),
                              params=params, interpret=True)
    ref = lcg.solve(A, jnp.asarray(sys_.b, jnp.float32), params=params)
    assert abs(int(t) - int(ref.iterations)) <= 2
    err = np.sqrt(np.sum((np.asarray(x, np.float64) - answer) ** 2)) / sys_.n
    assert err < 1e-5


def test_kernel_small_banded():
    rng = np.random.default_rng(0)
    n = 256
    main = 4.0 + rng.uniform(0, 1, n)
    off = rng.uniform(-1, 1, n - 1)
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([main, off, off]).astype(np.float32)
    x_true = rng.uniform(1, 2, n).astype(np.float32)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (rows, cols), vals)
    b = dense @ x_true
    A = lcg.BandedOperator(n, n, rows, cols, vals)
    x, t, res = solve_cg_vmem(A, b, params=lcg.SolverParams(epsilon=1e-12),
                              interpret=True)
    np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-3)
    assert int(t) > 0


def test_kernel_rejects_oversize_and_wrong_type():
    assert not fits_in_vmem(10_000_000, 19)
    rng = np.random.default_rng(1)
    A = lcg.DenseOperator(np.eye(8, dtype=np.float32))
    with pytest.raises(ValueError):
        solve_cg_vmem(A, np.ones(8, np.float32))


def _banded_f32(n=256, seed=3):
    rng = np.random.default_rng(seed)
    main = 4.0 + rng.uniform(0, 1, n)
    off = rng.uniform(-1, 1, n - 1)
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([main, off, off]).astype(np.float32)
    x_true = rng.uniform(1, 2, n).astype(np.float32)
    b = np.zeros(n, np.float32)
    np.add.at(b, rows, vals * x_true[cols])
    return lcg.BandedOperator(n, n, rows, cols, vals), b, x_true


def test_solve_dispatches_to_pallas_when_required():
    """solve(pallas='always') routes through the kernel (interpreter on
    this CPU backend) and matches the XLA-loop answer and status."""
    A, b, x_true = _banded_f32()
    params = lcg.SolverParams(epsilon=1e-12)
    res_k = lcg.solve(A, b, params=params, pallas="always")
    res_x = lcg.solve(A, b, params=params, pallas="never")
    assert res_k.converged
    np.testing.assert_allclose(np.asarray(res_k.x), x_true, atol=1e-3)
    assert abs(int(res_k.iterations) - int(res_x.iterations)) <= 2


def test_pallas_dispatch_status_mapping():
    A, b, _ = _banded_f32()
    res = lcg.solve(A, b, pallas="always",
                    params=lcg.SolverParams(epsilon=1e-12, max_iterations=2))
    assert int(res.status_code) == int(lcg.Status.REACHED_MAX_ITERATIONS)
    assert int(res.iterations) == 2
    # Warm restart from the exact solution -> ALREADY_OPTIMIZED.
    res0 = lcg.solve(A, b, x0=lcg.solve(A, b, pallas="always").x,
                     pallas="always", params=lcg.SolverParams(epsilon=1e-4))
    assert int(res0.status_code) == int(lcg.Status.ALREADY_OPTIMIZED)


def test_pallas_always_rejects_infeasible():
    A, b, _ = _banded_f32()
    with pytest.raises(ValueError, match="float32-only"):
        lcg.solve(A, jnp.asarray(b, jnp.float64),
                  lmin=None, pallas="always",
                  params=lcg.SolverParams(epsilon=1e-10))
    with pytest.raises(ValueError, match="BandedOperator"):
        lcg.solve(np.eye(8, dtype=np.float32), np.ones(8, np.float32),
                  pallas="always")
    with pytest.raises(ValueError, match="monitor"):
        lcg.solve(A, b, pallas="always", monitor=lambda x, r, t: False)


def test_pallas_auto_on_cpu_uses_xla_loop():
    """On a CPU backend 'auto' must NOT route to the interpreter (it is
    orders of magnitude slower); the solve still returns trace support."""
    A, b, x_true = _banded_f32()
    res = lcg.solve(A, b, params=lcg.SolverParams(epsilon=1e-12),
                    trace_len=16)
    assert res.trace is not None
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-3)


def test_pcg_kernel_matches_engine():
    """Whole-solve Jacobi-PCG kernel: same iterations and answer as the
    XLA pcg engine (auto-routed via solve(pallas='always'))."""
    A, b, x_true = _banded_f32(seed=5)
    M = lcg.JacobiPreconditioner(A)
    params = lcg.SolverParams(epsilon=1e-12)
    res_k = lcg.solve(A, b, method="pcg", M=M, params=params, pallas="always")
    res_x = lcg.solve(A, b, method="pcg", M=M, params=params, pallas="never")
    assert res_k.converged
    np.testing.assert_allclose(np.asarray(res_k.x), x_true, atol=1e-3)
    assert abs(int(res_k.iterations) - int(res_x.iterations)) <= 2


def test_pcg_kernel_requires_diagonal_preconditioner():
    A, b, _ = _banded_f32()
    with pytest.raises(ValueError, match="diagonal"):
        lcg.solve(A, b, method="pcg", M=lambda v: v, pallas="always")


def test_batched_kernel_matches_batched_engine():
    """Multi-RHS VMEM kernel: per-system counts/answers match the XLA
    batched path, including early-converging systems frozen in-kernel."""
    A, b, x_true = _banded_f32(seed=7)
    n = len(b)
    B = np.stack([b, 2.0 * b, 0.25 * b, b * 0.0])
    params = lcg.SolverParams(epsilon=1e-12)
    rk = lcg.solve_batched(A, B, params=params, pallas="always")
    rx = lcg.solve_batched(A, B, params=params, pallas="never")
    kx, xx = np.asarray(rk.x), np.asarray(rx.x)
    np.testing.assert_allclose(kx[:3], xx[:3], atol=1e-3)
    # Zero rhs -> already optimized at t=0.
    assert int(np.asarray(rk.iterations)[3]) == 0
    assert int(np.asarray(rk.status_code)[3]) == int(lcg.Status.ALREADY_OPTIMIZED)
    kt, xt = np.asarray(rk.iterations), np.asarray(rx.iterations)
    assert np.all(np.abs(kt - xt) <= 2)


def test_batched_kernel_always_rejects_oversize():
    A, b, _ = _banded_f32()
    with pytest.raises(ValueError, match="float32-only"):
        lcg.solve_batched(A, np.stack([b, b]).astype(np.float64),
                          pallas="always")


def test_batched_pallas_always_rejects_unsupported_method():
    A, b, _ = _banded_f32()
    with pytest.raises(ValueError, match="cg"):
        lcg.solve_batched(A, np.stack([b, b]), method="bicgstab",
                          pallas="always")


def test_batched_pcg_kernel_matches_engine():
    """Multi-RHS Jacobi-PCG kernel vs the XLA batched pcg path."""
    A, b, x_true = _banded_f32(seed=11)
    M = lcg.JacobiPreconditioner(A)
    B = np.stack([b, 0.5 * b, 2.0 * b])
    params = lcg.SolverParams(epsilon=1e-12)
    rk = lcg.solve_batched(A, B, method="pcg", M=M, params=params,
                           pallas="always")
    rx = lcg.solve_batched(A, B, method="pcg", M=M, params=params,
                           pallas="never")
    np.testing.assert_allclose(np.asarray(rk.x), np.asarray(rx.x), atol=1e-3)
    assert np.all(np.abs(np.asarray(rk.iterations) -
                         np.asarray(rx.iterations)) <= 2)
    np.testing.assert_allclose(np.asarray(rk.x)[0], x_true, atol=1e-3)


def test_cgs_kernel_matches_engine():
    """Whole-solve CGS kernel (with CG this mirrors the reference CUDA
    dispatcher's exact method set, lcg_cuda.cu:44-55): iterations and
    answer match the XLA cgs engine."""
    A, b, x_true = _banded_f32(seed=9)
    params = lcg.SolverParams(epsilon=1e-12)
    res_k = lcg.solve(A, b, method="cgs", params=params, pallas="always")
    res_x = lcg.solve(A, b, method="cgs", params=params, pallas="never")
    assert res_k.converged
    np.testing.assert_allclose(np.asarray(res_k.x), x_true, atol=1e-3)
    assert abs(int(res_k.iterations) - int(res_x.iterations)) <= 2


def test_complex_cgs_never_routes_to_kernel(complex_sym_small):
    """Complex CGS must use the complex engine (shadow-residual draw),
    never the real f32 kernel, even with pallas='always' semantics
    guarded by dtype."""
    A, b, x_true = complex_sym_small
    res = lcg.solve(A, b, method="cgs", params=lcg.SolverParams(epsilon=1e-20))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-3)


def test_bicgstab_kernel_matches_engine(case_10k):
    """Whole-solve BiCGSTAB kernel (round 3): interpret-mode parity with
    the XLA engine — same iteration count and solution on case_10K."""
    sys_, answer = case_10k
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols,
                                 sys_.vals, dtype="float32")
    b = jnp.asarray(sys_.b, jnp.float32)
    p = lcg.SolverParams(epsilon=1e-8)
    r_x = lcg.solve(A, b, method="bicgstab", params=p, pallas="never")
    r_k = lcg.solve(A, b, method="bicgstab", params=p, pallas="always")
    assert abs(int(r_k.iterations) - int(r_x.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(r_k.x), np.asarray(r_x.x),
                               rtol=0, atol=1e-3)
    # eps=1e-8 on the squared metric is ~1e-4 relative residual: solution
    # accuracy vs the golden answer is correspondingly loose in f32.
    err = np.sqrt(np.sum((np.asarray(r_k.x, np.float64) - answer) ** 2))
    assert err / sys_.n < 2e-3


def test_bicgstab2_kernel_matches_engine(case_10k):
    """Whole-solve BiCGSTAB2 kernel (round 4): interpret-mode parity with
    the XLA engine incl. the restart select; abs_diff mode must refuse
    (its mid-iteration half-step exit is XLA-only)."""
    sys_, answer = case_10k
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols,
                                 sys_.vals, dtype="float32")
    b = jnp.asarray(sys_.b, jnp.float32)
    p = lcg.SolverParams(epsilon=1e-8, restart_epsilon=1e-6)
    r_x = lcg.solve(A, b, method="bicgstab2", params=p, pallas="never")
    r_k = lcg.solve(A, b, method="bicgstab2", params=p, pallas="always")
    assert abs(int(r_k.iterations) - int(r_x.iterations)) <= 3
    np.testing.assert_allclose(np.asarray(r_k.x), np.asarray(r_x.x),
                               rtol=0, atol=2e-3)
    err = np.sqrt(np.sum((np.asarray(r_k.x, np.float64) - answer) ** 2))
    assert err / sys_.n < 2e-3
    with pytest.raises(ValueError, match="abs_diff"):
        lcg.solve(A, b, method="bicgstab2",
                  params=lcg.SolverParams(epsilon=1e-6, abs_diff=1),
                  pallas="always")


def test_bicgstab_kernel_vmem_census():
    """The BiCGSTAB route sizes eligibility with its own (larger) buffer
    census: a system that fits CG's census but not BiCGSTAB's must not
    route to the kernel."""
    from liblcg_tpu.ops.pallas_cg import BICGSTAB_VEC_BUFFERS

    n_diags = 3
    # Find an n between the two budgets.
    n = 200_000
    while fits_in_vmem(n, n_diags, n_vec_buffers=BICGSTAB_VEC_BUFFERS):
        n += 50_000
    assert BICGSTAB_VEC_BUFFERS > 10
    if not fits_in_vmem(n, n_diags):
        # shrink until CG accepts but BiCGSTAB rejects
        while n > 0 and not fits_in_vmem(n, n_diags):
            n -= 10_000
    assert fits_in_vmem(n, n_diags)
    assert not fits_in_vmem(n, n_diags, n_vec_buffers=BICGSTAB_VEC_BUFFERS)


def test_batched_cgs_kernel_matches_engine(case_10k):
    """Batched multi-RHS CGS kernel (round 3): per-system iteration
    parity with the XLA batched engine on scaled case_10K copies."""
    sys_, _ = case_10k
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols,
                                 sys_.vals, dtype="float32")
    B = jnp.asarray(np.stack([sys_.b * (1 + 0.1 * k) for k in range(4)]),
                    jnp.float32)
    p = lcg.SolverParams(epsilon=1e-9)
    r_x = lcg.solve_batched(A, B, method="cgs", params=p, pallas="never")
    r_k = lcg.solve_batched(A, B, method="cgs", params=p, pallas="always")
    assert np.all(np.abs(np.asarray(r_k.iterations)
                         - np.asarray(r_x.iterations)) <= 2)
    np.testing.assert_allclose(np.asarray(r_k.x), np.asarray(r_x.x),
                               rtol=0, atol=1e-3)
