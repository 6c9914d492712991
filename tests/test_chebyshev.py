"""Chebyshev iteration + spectral bound estimation + progress printer."""

import io as _io
import numpy as np
import jax.numpy as jnp
import pytest

import liblcg_tpu as lcg
from liblcg_tpu.ops.spectra import gershgorin_bounds, power_bound


def test_gershgorin_bounds_enclose_spectrum(spd_small):
    A, _, _ = spd_small
    lo, hi = gershgorin_bounds(lcg.DenseOperator(A))
    eig = np.linalg.eigvalsh(A)
    assert lo <= eig.min() + 1e-9
    assert hi >= eig.max() - 1e-9


def test_gershgorin_for_sparse_formats(case_10k):
    sys_, _ = case_10k
    dia = lcg.BandedOperator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    ell = lcg.SparseOperator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    b1 = gershgorin_bounds(dia)
    b2 = gershgorin_bounds(ell)
    np.testing.assert_allclose(b1, b2, rtol=1e-12)


def test_power_bound(spd_small):
    A, _, _ = spd_small
    lam = power_bound(lcg.DenseOperator(A), n_iter=50)
    eig_max = np.linalg.eigvalsh(A).max()
    assert eig_max <= lam <= 1.2 * eig_max


def test_chebyshev_converges_with_explicit_bounds(spd_small):
    A, b, x_true = spd_small
    eig = np.linalg.eigvalsh(A)
    res = lcg.solve(lcg.DenseOperator(A), b, method="chebyshev",
                    lmin=eig.min(), lmax=eig.max(),
                    params=lcg.SolverParams(epsilon=1e-12,
                                            hard_iteration_cap=100000))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=2e-3)


def test_chebyshev_auto_bounds(case_10k):
    sys_, answer = case_10k
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    res = lcg.solve(A, jnp.asarray(sys_.b), method="chebyshev",
                    params=lcg.SolverParams(epsilon=1e-12,
                                            hard_iteration_cap=100000))
    assert res.converged
    err = np.sqrt(np.sum((np.asarray(res.x) - answer) ** 2)) / sys_.n
    assert err < 1e-5


def test_chebyshev_batched(spd_small):
    A, b, x_true = spd_small
    eig = np.linalg.eigvalsh(A)
    B = np.stack([b, 2 * b])
    res = lcg.solve_batched(lcg.DenseOperator(A), B, method="chebyshev",
                            lmin=eig.min(), lmax=eig.max(),
                            params=lcg.SolverParams(epsilon=1e-12,
                                                    hard_iteration_cap=100000))
    assert np.all(np.asarray(res.status_code) >= 0)
    np.testing.assert_allclose(np.asarray(res.x[0]), x_true, atol=5e-3)


def test_chebyshev_rejects_complex(complex_sym_small):
    A, b, _ = complex_sym_small
    with pytest.raises(ValueError):
        lcg.solve(lcg.DenseOperator(A), b, method="chebyshev")


def test_progress_printer(spd_small):
    from liblcg_tpu.utils.progress import make_printer

    A, b, _ = spd_small
    buf = _io.StringIO()
    mon = make_printer(interval=10, stream=buf)
    res = lcg.solve(lcg.DenseOperator(A), b, monitor=mon,
                    params=lcg.SolverParams(epsilon=1e-12))
    assert res.converged
    out = buf.getvalue()
    assert "Iteration-times: 0" in out
    assert "convergence:" in out


def test_progress_printer_with_stop(spd_small):
    from liblcg_tpu.utils.progress import make_printer

    A, b, _ = spd_small
    buf = _io.StringIO()
    mon = make_printer(interval=1, stream=buf,
                       stop=lambda x, r, t: t >= 5)
    res = lcg.solve(lcg.DenseOperator(A), b, monitor=mon)
    assert res.status == lcg.Status.STOP
    assert int(res.iterations) == 5


def test_chebyshev_preconditioner_cuts_iterations(case_10k):
    sys_, answer = case_10k
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    b = jnp.asarray(sys_.b)
    P = lcg.SolverParams(epsilon=1e-12)
    plain = lcg.solve(A, b, params=P)
    M = lcg.ChebyshevPreconditioner(A, degree=6)
    pcg = lcg.solve(A, b, method="pcg", M=M, params=P)
    assert pcg.converged
    # degree-6 polynomial preconditioning: ~6x fewer global reductions.
    assert int(pcg.iterations) * 5 < int(plain.iterations)
    err = np.sqrt(np.sum((np.asarray(pcg.x) - answer) ** 2)) / sys_.n
    assert err < 1e-5


def test_lanczos_bounds_sharper_than_gershgorin(spd_small):
    from liblcg_tpu.ops.spectra import lanczos_bounds

    A, _, _ = spd_small
    eig = np.linalg.eigvalsh(A)
    lo, hi = lanczos_bounds(lcg.DenseOperator(A), n_iter=60)
    g_lo, g_hi = gershgorin_bounds(lcg.DenseOperator(A))
    # encloses the spectrum...
    assert lo <= eig.min() + 1e-6
    assert hi >= eig.max() - 1e-6
    # ...and is no wider than the Gershgorin interval
    assert (hi - lo) <= (g_hi - g_lo) + 1e-9


def test_chebyshev_with_lanczos_bounds(spd_small):
    from liblcg_tpu.ops.spectra import lanczos_bounds

    A, b, x_true = spd_small
    op = lcg.DenseOperator(A)
    lo, hi = lanczos_bounds(op, n_iter=60)
    res = lcg.solve(op, b, method="chebyshev", lmin=lo, lmax=hi,
                    params=lcg.SolverParams(epsilon=1e-12,
                                            hard_iteration_cap=100000))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=5e-3)
