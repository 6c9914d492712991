"""SPMD solve tests on the 8-device virtual CPU mesh.

The reference has no distributed code to mirror (SURVEY §2.9); these tests
validate the new multi-chip layer against the single-device engines:
sharded solves must match iteration-for-iteration (same recurrence, psum'd
reductions) and converge to the same solution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import liblcg_tpu as lcg
from liblcg_tpu.parallel import (
    Laplacian3DOperator,
    ShardedLaplacian3D,
    ShardedSparseOperator,
    make_mesh,
    solve_sharded,
)


@pytest.fixture(scope="module")
def banded_system():
    """SPD banded system with n not divisible by the mesh size (padding)."""
    rng = np.random.default_rng(0)
    n = 203
    main = 4.0 + rng.uniform(0, 1, n)
    off = rng.uniform(-1, 1, n - 1)
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([main, off, off])
    x_true = rng.uniform(1, 2, n)
    b = np.zeros(n)
    np.add.at(b, rows, vals * x_true[cols])
    return n, rows, cols, vals, b, x_true


PARAMS = lcg.SolverParams(epsilon=1e-12)


@pytest.mark.parametrize("comm", ["allgather", "halo"])
def test_sharded_cg_matches_single_device(banded_system, comm):
    n, rows, cols, vals, b, x_true = banded_system
    ref = lcg.solve(lcg.SparseOperator(n, n, rows, cols, vals), b, params=PARAMS)
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=8, comm=comm)
    assert A.comm == comm
    res = solve_sharded(A, b, method="cg", params=PARAMS)
    assert res.converged
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-4)


def test_auto_comm_picks_halo_for_banded(banded_system):
    n, rows, cols, vals, _, _ = banded_system
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=8, comm="auto")
    assert A.comm == "halo"
    assert A.halo == (1, 1)


def test_sharded_pcg_jacobi(banded_system):
    n, rows, cols, vals, b, x_true = banded_system
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=8)
    M = lcg.JacobiPreconditioner(A)
    res = solve_sharded(A, b, method="pcg", M=M, params=PARAMS)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-4)


@pytest.mark.parametrize("method", ["cgs", "bicgstab", "bicgstab2"])
def test_sharded_other_real_methods(banded_system, method):
    n, rows, cols, vals, b, x_true = banded_system
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=8)
    res = solve_sharded(A, b, method=method, params=PARAMS)
    assert res.converged, f"{method}: {res.status}"
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-3)


def test_sharded_constrained_pg(banded_system):
    n, rows, cols, vals, b, x_true = banded_system
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=8)
    res = solve_sharded(
        A, b, method="pg",
        lower=np.full(n, 1.0), upper=np.full(n, 2.0),
        params=lcg.SolverParams(epsilon=1e-10, max_iterations=3000),
    )
    assert res.converged
    x = np.asarray(res.x)
    assert np.all(x >= 1.0 - 1e-10) and np.all(x <= 2.0 + 1e-10)
    np.testing.assert_allclose(x, x_true, atol=5e-2)


def test_sharded_complex_bicg_exercises_hmv():
    rng = np.random.default_rng(7)
    n = 96
    M = rng.uniform(-1, 1, (n, n)) + 1j * rng.uniform(-1, 1, (n, n))
    Ad = (M + M.T) / 2 + (3.0 + 0.5j) * np.eye(n)
    rows, cols = np.nonzero(Ad)
    vals = Ad[rows, cols]
    x_true = rng.uniform(1, 2, n) + 1j * rng.uniform(-1, 1, n)
    b = Ad @ x_true
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=8)
    res = solve_sharded(A, b, method="bicg", params=lcg.SolverParams(epsilon=1e-20))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-3)


def test_sharded_complex_cgs_shadow_residual():
    rng = np.random.default_rng(9)
    n = 80
    M = rng.uniform(-1, 1, (n, n)) + 1j * rng.uniform(-1, 1, (n, n))
    Ad = (M + M.T) / 2 + (3.0 + 0.5j) * np.eye(n)
    rows, cols = np.nonzero(Ad)
    x_true = rng.uniform(1, 2, n) + 1j * rng.uniform(-1, 1, n)
    b = Ad @ x_true
    A = ShardedSparseOperator(n, rows, cols, Ad[rows, cols], n_devices=8)
    res = solve_sharded(A, b, method="cgs", params=lcg.SolverParams(epsilon=1e-20))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-3)


def test_stencil_matches_sharded_stencil():
    nz, ny, nx = 16, 12, 10
    n = nz * ny * nx
    rng = np.random.default_rng(3)
    lap = Laplacian3DOperator(nz, ny, nx, dtype=jnp.float64)
    x_true = rng.uniform(0, 1, n)
    b = np.asarray(lap.mv(jnp.asarray(x_true)))
    ref = lcg.solve(lap, b, params=PARAMS)
    S = ShardedLaplacian3D(nz, ny, nx, n_devices=8, dtype=jnp.float64)
    res = solve_sharded(S, b, method="cg", params=PARAMS)
    assert res.converged
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-4)


def test_stencil_operator_is_the_laplacian():
    """The fused pad/shift stencil equals the explicit 7-point matrix."""
    nz, ny, nx = 5, 4, 3
    n = nz * ny * nx
    lap = Laplacian3DOperator(nz, ny, nx, dtype=jnp.float64)
    dense = np.zeros((n, n))
    for z in range(nz):
        for y in range(ny):
            for x in range(nx):
                i = (z * ny + y) * nx + x
                dense[i, i] = 6.0
                for dz, dy, dx in [(-1, 0, 0), (1, 0, 0), (0, -1, 0),
                                   (0, 1, 0), (0, 0, -1), (0, 0, 1)]:
                    zz, yy, xx = z + dz, y + dy, x + dx
                    if 0 <= zz < nz and 0 <= yy < ny and 0 <= xx < nx:
                        dense[i, (zz * ny + yy) * nx + xx] = -1.0
    v = np.random.default_rng(1).normal(size=n)
    np.testing.assert_allclose(
        np.asarray(lap.mv(jnp.asarray(v))), dense @ v, atol=1e-12
    )


def test_sharded_monitor_and_trace(banded_system):
    n, rows, cols, vals, b, _ = banded_system
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=8)

    def monitor(x_local, residual, t):
        return t >= 3

    res = solve_sharded(A, b, method="cg", monitor=monitor, trace_len=16)
    assert res.status == lcg.Status.STOP
    assert int(res.iterations) == 3
    tr = np.asarray(res.trace)
    assert np.all(tr[:3] > 0)


def test_mesh_size_mismatch_raises(banded_system):
    n, rows, cols, vals, b, _ = banded_system
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=4)
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        solve_sharded(A, b, mesh=mesh)


def test_sharded_banded_matches_single_device(banded_system):
    from liblcg_tpu.parallel import ShardedBandedOperator

    n, rows, cols, vals, b, x_true = banded_system
    ref = lcg.solve(lcg.BandedOperator(n, n, rows, cols, vals), b, params=PARAMS)
    A = ShardedBandedOperator(n, rows, cols, vals, n_devices=8)
    assert A.halo == (1, 1)
    res = solve_sharded(A, b, method="cg", params=PARAMS)
    assert res.converged
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-4)


def test_sharded_banded_transpose_products():
    """rmv/hmv through the swapped-halo shift path vs the dense answer."""
    from liblcg_tpu.parallel import ShardedBandedOperator
    from liblcg_tpu.solvers import harness as H

    rng = np.random.default_rng(11)
    n = 64
    dense = np.zeros((n, n), dtype=complex)
    for off in (-3, -1, 0, 2):
        idx = np.arange(max(0, -off), min(n, n - off))
        dense[idx, idx + off] = rng.normal(size=len(idx)) + 1j * rng.normal(size=len(idx))
    rows, cols = np.nonzero(dense)
    A = ShardedBandedOperator(n, rows, cols, dense[rows, cols], n_devices=8)
    v = rng.normal(size=n) + 1j * rng.normal(size=n)

    mesh = make_mesh(8)
    from jax.sharding import PartitionSpec as P

    def apply(kind):
        def body(op, x):
            return getattr(op, kind)(x)
        specs = jax.tree.map(
            lambda l: P("rows", *([None] * (getattr(l, "ndim", 1) - 1))), A
        )
        f = jax.shard_map(body, mesh=mesh, in_specs=(specs, P("rows")),
                          out_specs=P("rows"))
        return np.asarray(f(A, jnp.asarray(v)))

    np.testing.assert_allclose(apply("mv"), dense @ v, atol=1e-12)
    np.testing.assert_allclose(apply("rmv"), dense.T @ v, atol=1e-12)
    np.testing.assert_allclose(apply("hmv"), dense.conj().T @ v, atol=1e-12)


def test_sharded_banded_bandwidth_guard():
    from liblcg_tpu.parallel import ShardedBandedOperator

    n = 16
    rows = np.array([0, 15])
    cols = np.array([15, 0])
    with pytest.raises(ValueError):
        ShardedBandedOperator(n, rows, cols, np.ones(2), n_devices=8)


def test_sharded_banded_pcg_padding(banded_system):
    """n not divisible by the mesh: padding rows carry a unit diagonal so
    Jacobi stays finite."""
    from liblcg_tpu.parallel import ShardedBandedOperator

    n, rows, cols, vals, b, x_true = banded_system
    A = ShardedBandedOperator(n, rows, cols, vals, n_devices=8)
    M = lcg.JacobiPreconditioner(A)
    res = solve_sharded(A, b, method="pcg", M=M, params=PARAMS)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-4)


def test_stencil3d_variable_coefficients_match_dense():
    """General 7-point stencil (mv and exact transpose) vs an explicitly
    assembled matrix, including an unsymmetric advection-like term."""
    from liblcg_tpu.parallel import Stencil3DOperator

    rng = np.random.default_rng(5)
    nz, ny, nx = 4, 5, 3
    n = nz * ny * nx
    shape = (nz, ny, nx)
    coeffs = {k: rng.normal(size=shape) for k in
              ("c0", "cxm", "cxp", "cym", "cyp", "czm", "czp")}
    op = Stencil3DOperator(nz, ny, nx, **coeffs)

    dense = np.zeros((n, n))
    idx = lambda z, y, x: (z * ny + y) * nx + x
    cg = {k: np.asarray(getattr(op, k)).reshape(shape) for k in coeffs}
    for z in range(nz):
        for y in range(ny):
            for x in range(nx):
                i = idx(z, y, x)
                dense[i, i] = cg["c0"][z, y, x]
                for k, (dz, dy, dx) in (("czm", (-1, 0, 0)), ("czp", (1, 0, 0)),
                                        ("cym", (0, -1, 0)), ("cyp", (0, 1, 0)),
                                        ("cxm", (0, 0, -1)), ("cxp", (0, 0, 1))):
                    zz, yy, xx = z + dz, y + dy, x + dx
                    if 0 <= zz < nz and 0 <= yy < ny and 0 <= xx < nx:
                        dense[i, idx(zz, yy, xx)] = cg[k][z, y, x]
    v = rng.normal(size=n)
    np.testing.assert_allclose(np.asarray(op.mv(jnp.asarray(v))), dense @ v,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.rmv(jnp.asarray(v))), dense.T @ v,
                               atol=1e-12)


def test_diffusion_operator_spd_and_sharded():
    """-div(kappa grad) via harmonic-mean faces: SPD, solvable, and the
    sharded variant matches the single-device solve."""
    from liblcg_tpu.parallel import ShardedStencil3D, Stencil3DOperator

    rng = np.random.default_rng(6)
    nz, ny, nx = 16, 6, 5
    kappa = 10.0 ** rng.uniform(-1, 1, (nz, ny, nx))   # heterogeneous
    op = Stencil3DOperator.diffusion(kappa, dtype=np.float64)
    n = nz * ny * nx
    x_true = rng.uniform(1, 2, n)
    b = np.asarray(op.mv(jnp.asarray(x_true)))
    ref = lcg.solve(op, b, params=PARAMS)
    assert ref.converged
    np.testing.assert_allclose(np.asarray(ref.x), x_true, atol=1e-5)

    sh = ShardedStencil3D(op, n_devices=8)
    res = solve_sharded(sh, b, method="cg", params=PARAMS)
    assert res.converged
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-5)


def test_sharded_chebyshev_and_reduce_dtype(banded_system):
    """Chebyshev (auto Gershgorin bounds) and mixed-precision reductions
    through the SPMD path."""
    from liblcg_tpu.parallel import ShardedBandedOperator

    n, rows, cols, vals, b, x_true = banded_system
    A = ShardedBandedOperator(n, rows, cols, vals, n_devices=8)
    res = solve_sharded(
        A, b, method="chebyshev",
        params=lcg.SolverParams(epsilon=1e-12, hard_iteration_cap=100000),
    )
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-3)

    A32 = ShardedBandedOperator(n, rows, cols, vals.astype(np.float32),
                                n_devices=8)
    res32 = solve_sharded(
        A32, b.astype(np.float32), method="cg",
        params=lcg.SolverParams(epsilon=1e-10, reduce_dtype="float64"),
    )
    assert res32.converged
    assert res32.x.dtype == jnp.float32


def test_sharded_batched_multirhs(banded_system):
    """Sharded x batched composition: multi-RHS solves over the mesh —
    per-system psum'd reductions, one compiled SPMD program."""
    from liblcg_tpu.parallel import ShardedBandedOperator

    n, rows, cols, vals, b, x_true = banded_system
    A = ShardedBandedOperator(n, rows, cols, vals, n_devices=8)
    B = np.stack([b, 2.0 * b, 0.5 * b])
    res = solve_sharded(A, B, method="cg", params=PARAMS)
    assert res.x.shape == (3, n)
    assert np.all(np.asarray(res.status_code) >= 0)
    np.testing.assert_allclose(np.asarray(res.x[0]), x_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.x[1]), 2 * x_true, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.x[2]), 0.5 * x_true, atol=1e-4)
    # iteration parity with the single-RHS sharded solve
    single = solve_sharded(A, b, method="cg", params=PARAMS)
    assert abs(int(np.asarray(res.iterations)[0]) - int(single.iterations)) <= 1


def test_sharded_batched_pcg_jacobi(banded_system):
    from liblcg_tpu.parallel import ShardedBandedOperator

    n, rows, cols, vals, b, x_true = banded_system
    A = ShardedBandedOperator(n, rows, cols, vals, n_devices=8)
    M = lcg.JacobiPreconditioner(A)
    B = np.stack([b, 3.0 * b])
    res = solve_sharded(A, B, method="pcg", M=M, params=PARAMS)
    assert np.all(np.asarray(res.status_code) >= 0)
    np.testing.assert_allclose(np.asarray(res.x[1]), 3 * x_true, atol=3e-4)


def test_sharded_batched_rejects_3d_b(banded_system):
    n, rows, cols, vals, b, _ = banded_system
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=8)
    with pytest.raises(ValueError):
        solve_sharded(A, np.stack([[b, b]]))  # 3-D b
    # Batched traces are supported since round 4 (per-system rows).
    res = solve_sharded(A, np.stack([b, b]), method="cg", trace_len=8)
    assert res.trace is not None and res.trace.shape == (2, 8)


def test_block_jacobi_ic_sharded(banded_system):
    """Per-shard IC factors as sharded leaves: fewer iterations than plain
    CG with zero communication per preconditioner application."""
    from liblcg_tpu.parallel import (BlockJacobiPreconditioner,
                                     ShardedBandedOperator)

    n, rows, cols, vals, b, x_true = banded_system
    A = ShardedBandedOperator(n, rows, cols, vals, n_devices=8)
    M = BlockJacobiPreconditioner.from_operator(A)
    plain = solve_sharded(A, b, method="cg", params=PARAMS)
    res = solve_sharded(A, b, method="pcg", M=M, params=PARAMS)
    assert res.converged
    assert int(res.iterations) < int(plain.iterations)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-4)


def test_block_jacobi_from_coo_with_shift(banded_system):
    from liblcg_tpu.parallel import (BlockJacobiPreconditioner,
                                     ShardedSparseOperator)

    n, rows, cols, vals, b, x_true = banded_system
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=4)
    n_padded = A.n_padded
    M = BlockJacobiPreconditioner.from_coo(n_padded, rows, cols, vals,
                                           n_devices=4, shift=0.05)
    res = solve_sharded(A, b, method="pcg", M=M, params=PARAMS)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-4)


@pytest.mark.parametrize("comm", ["allgather", "halo"])
def test_sharded_sparse_transpose_products(comm):
    """rmv/hmv owner-targeted exchange (halo) and reduce-scatter
    (allgather) vs the dense answer — no full-length replicated vector in
    either path."""
    rng = np.random.default_rng(13)
    n = 64
    dense = np.zeros((n, n), dtype=complex)
    for off in (-2, -1, 0, 1, 3):
        idx = np.arange(max(0, -off), min(n, n - off))
        dense[idx, idx + off] = rng.normal(size=len(idx)) + 1j * rng.normal(
            size=len(idx)
        )
    rows, cols = np.nonzero(dense)
    A = ShardedSparseOperator(
        n, rows, cols, dense[rows, cols], n_devices=8, comm=comm
    )
    assert A.comm == comm
    v = rng.normal(size=n) + 1j * rng.normal(size=n)

    mesh = make_mesh(8)
    from jax.sharding import PartitionSpec as P

    def apply(kind):
        def body(op, x):
            return getattr(op, kind)(x)

        specs = jax.tree.map(
            lambda l: P("rows", *([None] * (getattr(l, "ndim", 1) - 1))), A
        )
        f = jax.shard_map(body, mesh=mesh, in_specs=(specs, P("rows")),
                          out_specs=P("rows"))
        return np.asarray(f(A, jnp.asarray(v)))

    np.testing.assert_allclose(apply("mv"), dense @ v, atol=1e-12)
    np.testing.assert_allclose(apply("rmv"), dense.T @ v, atol=1e-12)
    np.testing.assert_allclose(apply("hmv"), dense.conj().T @ v, atol=1e-12)


def test_sharded_complex_bicg_halo_comm_with_padding():
    """BiCG (A^H per iteration) over the halo owner-targeted transpose,
    with padding rows (n not divisible by the mesh)."""
    rng = np.random.default_rng(17)
    n = 203
    main = (4.0 + rng.uniform(0, 1, n)) + 1j * rng.uniform(-0.5, 0.5, n)
    off = rng.uniform(-1, 1, n - 1) + 1j * rng.uniform(-0.3, 0.3, n - 1)
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([main, off, off])
    dense = np.zeros((n, n), dtype=complex)
    dense[rows, cols] = vals
    x_true = rng.uniform(1, 2, n) + 1j * rng.uniform(-1, 1, n)
    b = dense @ x_true
    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=8, comm="halo")
    res = solve_sharded(A, b, method="bicg",
                        params=lcg.SolverParams(epsilon=1e-20))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-4)


def test_sharded_banded_jacobi_without_stored_diagonal():
    """A banded matrix with no stored main diagonal + padding rows: the
    operator materializes a zero diagonal column with 1.0 on padding rows,
    so diagonal() is well-defined (no inf injected by Jacobi)."""
    from liblcg_tpu.parallel import ShardedBandedOperator

    n = 13  # 8 devices -> n_local 2, padding rows 13..15
    rows = np.concatenate([np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(1, n), np.arange(n - 1)])
    vals = np.ones(2 * (n - 1))
    A = ShardedBandedOperator(n, rows, cols, vals, n_devices=8)
    assert 0 in A.offsets
    d = np.asarray(A.diagonal())
    np.testing.assert_array_equal(d[n:], 1.0)
    np.testing.assert_array_equal(d[:n], 0.0)


@pytest.mark.parametrize("method", ["gmres", "minres"])
def test_sharded_batched_krylov_extras(banded_system, method):
    """Batched x sharded composition for the round-2 batched methods
    (distributed Arnoldi/Lanczos bases with per-system scalars)."""
    from liblcg_tpu.parallel import ShardedBandedOperator

    n, rows, cols, vals, b, x_true = banded_system
    dense = np.zeros((n, n))
    dense[rows, cols] = vals
    X = np.stack([x_true, 2.0 * x_true, 0.5 * x_true])
    B = X @ dense.T
    A = ShardedBandedOperator(n, rows, cols, vals, n_devices=8)
    res = solve_sharded(A, B, method=method,
                        params=lcg.SolverParams(epsilon=1e-16))
    assert np.all(np.asarray(res.status_code) == int(lcg.Status.CONVERGENCE))
    np.testing.assert_allclose(np.asarray(res.x), X, atol=1e-5)


def test_sharded_rejects_ignored_M():
    """solve_sharded must refuse M for non-preconditioned methods (the
    silent-drop guard solve() gained in round 2, solve.py:432)."""
    import pytest
    from liblcg_tpu.parallel import ShardedLaplacian3D, solve_sharded

    A = ShardedLaplacian3D(16, 8, 16, n_devices=8)
    b = jnp.ones((16 * 8 * 16,), jnp.float32)
    M = lcg.JacobiPreconditioner(jnp.full((16 * 8 * 16,), 6.0, jnp.float32))
    with pytest.raises(ValueError, match="silently ignored"):
        solve_sharded(A, b, method="cg", M=M)
