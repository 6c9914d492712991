"""Sharded pair-complex solves (parallel/realified.py) — VERDICT r4 #2.

The reference's flagship complex workload must have a multi-chip story on
complex-less backends: complex systems row-partitioned over the solver
mesh, pair engines running on local [re_d; im_d] shards, reductions as
psums.  Iteration counts must track the single-device pair solves.
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import liblcg_tpu as lcg
from liblcg_tpu.parallel.realified import pack_pairs, unpack_pairs


def _banded_complex(n=96):
    rng = np.random.default_rng(7)
    main_d = (4.0 + rng.uniform(0, 1, n)) + 1j * (0.5 + rng.uniform(0, .5, n))
    off = rng.uniform(-1, 1, n - 1) + 1j * rng.uniform(-0.3, 0.3, n - 1)
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([main_d, off, off])          # complex symmetric
    x_true = rng.uniform(1, 2, n) + 1j * rng.uniform(-1, 1, n)
    b = np.zeros(n, complex)
    np.add.at(b, rows, vals * x_true[cols])
    return n, rows, cols, vals, b, x_true


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    z = rng.standard_normal(10) + 1j * rng.standard_normal(10)
    packed = pack_pairs(z, n_devices=4, n_padded=12)
    assert packed.shape == (24,)
    # device 2's local shard is [re_2; im_2]
    nl = 3
    loc = np.asarray(packed).reshape(4, 2 * nl)[2]
    np.testing.assert_allclose(loc[:nl], z.real[6:9])
    np.testing.assert_allclose(loc[nl:], z.imag[6:9])
    np.testing.assert_allclose(unpack_pairs(packed, 4, 10), z)


@pytest.mark.parametrize("storage", ["ell", "dia"])
@pytest.mark.parametrize("method", ["bicg_sym", "cgs", "bicgstab", "tfqmr"])
def test_sharded_pairs_match_single_device(method, storage):
    n, rows, cols, vals, b, x_true = _banded_complex()
    p = lcg.SolverParams(epsilon=1e-14, abs_diff=1)
    op1 = lcg.make_sparse_operator(n, n, rows, cols, vals)
    r1 = lcg.solve_realified(op1, b, method=method, params=p)
    A8 = lcg.ShardedRealifiedOperator(n, rows, cols, vals, n_devices=8,
                                      storage=storage)
    r8 = lcg.solve_realified_sharded(A8, b, method=method, params=p)
    assert lcg.Status(int(r8.status_code)) == lcg.Status.CONVERGENCE
    # Keyed methods decorrelate the shadow draw per shard; deterministic
    # methods differ only by psum reduction order.
    tol = 3 if method == "bicg_sym" else max(
        6, int(0.3 * int(r1.iterations)))
    assert abs(int(r8.iterations) - int(r1.iterations)) <= tol
    np.testing.assert_allclose(r8.x, x_true, atol=1e-5)


def test_sharded_pairs_pcg_jacobi_and_mesh_kwarg():
    n, rows, cols, vals, b, x_true = _banded_complex()
    p = lcg.SolverParams(epsilon=1e-14, abs_diff=1)
    op1 = lcg.make_sparse_operator(n, n, rows, cols, vals)
    r1 = lcg.solve_realified(op1, b, method="pcg", M="jacobi", params=p)
    A8 = lcg.ShardedRealifiedOperator(n, rows, cols, vals, n_devices=8)
    mesh = lcg.make_mesh(8)
    # the documented route: solve_realified(..., mesh=...) delegates
    r8 = lcg.solve_realified(A8, b, method="pcg", M="jacobi", params=p,
                             mesh=mesh)
    assert lcg.Status(int(r8.status_code)) == lcg.Status.CONVERGENCE
    assert abs(int(r8.iterations) - int(r1.iterations)) <= 3
    np.testing.assert_allclose(r8.x, x_true, atol=1e-5)


def test_sharded_pairs_golden_case10kc():
    """The flagship complex 10K (sample6 configuration) sharded over 8
    devices: Jacobi-PCG count tracks the single-device pair engine (~366)
    and the answer matches the shipped solution."""
    from liblcg_tpu.utils import io

    s = io.read_system("/root/reference/data/case_10K_cA",
                       complex_values=True)
    answer = io.read_answer("/root/reference/data/case_10K_cB",
                            complex_values=True)
    A8 = lcg.ShardedRealifiedOperator(s.n, s.rows, s.cols, s.vals,
                                      n_devices=8)
    p = lcg.SolverParams(epsilon=1e-6, abs_diff=1)
    r = lcg.solve_realified_sharded(A8, s.b, method="pcg", M="jacobi",
                                    params=p)
    assert lcg.Status(int(r.status_code)) == lcg.Status.CONVERGENCE
    assert abs(int(r.iterations) - 366) <= 40
    md = float(np.max(np.abs(r.x - answer)))
    assert md < 0.1, md


def test_sharded_pairs_trace_monitor_and_errors():
    n, rows, cols, vals, b, _ = _banded_complex()
    A8 = lcg.ShardedRealifiedOperator(n, rows, cols, vals, n_devices=8)
    r = lcg.solve_realified_sharded(
        A8, b, method="bicg_sym",
        params=lcg.SolverParams(epsilon=1e-14, abs_diff=1), trace_len=8)
    tr = np.asarray(r.trace)
    assert tr.shape == (8,) and np.all(tr[1:4] > 0)
    r = lcg.solve_realified_sharded(A8, b, method="bicg_sym",
                                    monitor=lambda x, res, t: t >= 3)
    assert lcg.Status(int(r.status_code)) == lcg.Status.STOP
    assert int(r.iterations) == 3
    r = lcg.solve_realified_sharded(A8, b, method="pcg", M=None)
    assert (lcg.Status(int(r.status_code))
            == lcg.Status.NULL_PRECONDITION_MATRIX)
    with pytest.raises(ValueError, match="pair-complex"):
        lcg.solve_realified_sharded(A8, b, method="cg")
    with pytest.raises(TypeError, match="ShardedRealifiedOperator"):
        lcg.solve_realified_sharded(
            lcg.make_sparse_operator(n, n, rows, cols, vals), b)
    with pytest.raises(ValueError, match="mesh axis"):
        lcg.solve_realified_sharded(A8, b, mesh=lcg.make_mesh(4))


def test_realified_rejects_real_values():
    n = 8
    with pytest.raises(ValueError, match="complex"):
        lcg.ShardedRealifiedOperator(n, np.arange(n), np.arange(n),
                                     np.ones(n), n_devices=4)


# --- collective economy (structural, hardware-independent) -----------------


def _while_body_collectives(hlo_text: str) -> dict:
    counts = {"all_reduce_body": 0, "collective_permute_body": 0,
              "all_gather_body": 0}
    body_names = set(re.findall(r"body=%?([\w.\-]+)", hlo_text))
    for m in re.finditer(r"^(?:%)?([\w.\-]+)[^\n{]*\{(.*?)^\}", hlo_text,
                         re.M | re.S):
        if m.group(1) in body_names:
            body = m.group(2)
            counts["all_reduce_body"] += body.count("all-reduce(")
            counts["collective_permute_body"] += body.count(
                "collective-permute(")
            counts["all_gather_body"] += body.count("all-gather(")
    return counts


def test_pair_pcg_while_body_collective_counts():
    """Per iteration the sharded pair PCG must communicate exactly: the
    two fused scalar reductions (step_fn's fused_sums pair) as
    all-reduces, and the complex product's two half-windows (here DIA
    halo: 2 ppermute hops per half).  No hidden full-vector collectives.
    """
    from liblcg_tpu.parallel import api  # noqa: F401  (same import path)
    from liblcg_tpu.parallel.realified import _SHARDED_PAIR_JIT_CACHE

    n, rows, cols, vals, b, _ = _banded_complex()
    A8 = lcg.ShardedRealifiedOperator(n, rows, cols, vals, n_devices=8,
                                      storage="dia")
    p = lcg.SolverParams(epsilon=1e-30, max_iterations=5, abs_diff=1)
    _SHARDED_PAIR_JIT_CACHE.clear()
    r = lcg.solve_realified_sharded(A8, b, method="pcg", M="jacobi",
                                    params=p)
    assert int(r.iterations) == 5
    (jitted,) = _SHARDED_PAIR_JIT_CACHE.values()
    # Rebuild the call operands exactly as solve_realified_sharded did.
    from liblcg_tpu.solvers.cplx_pairs import PairJacobi

    bp = pack_pairs(b, 8, A8.re.n_padded)
    M = PairJacobi(A8.jacobi_inv_diag_packed())
    hlo = jitted.lower(A8, bp, jnp.zeros_like(bp), M).compile().as_text()
    c = _while_body_collectives(hlo)
    assert c["all_reduce_body"] == 2, c
    assert c["all_gather_body"] == 0, c
    # 2 ppermute hops per half-window exchange, 2 halves = 4 (XLA may
    # combine paired hops; accept the combined form too).
    assert 2 <= c["collective_permute_body"] <= 4, c
