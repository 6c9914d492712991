"""Fused matrix-powers+Gram kernel (ops/pallas_powers.py): interpret-mode
parity against the XLA basis builder, and end-to-end ca_cg equivalence.

Chip numbers live in profiling/probe_r3_sstep.json and the bench's
``lap256_sstep_*`` fields; these tests pin the algebra (including the
z-Dirichlet ghost-plane masking that level >= 2 requires — the bug class
caught during bring-up) on the CPU interpreter.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import liblcg_tpu as lcg
from liblcg_tpu.ops import pallas_powers as PP
from liblcg_tpu.solvers.sstep import basis_recurrence, ca_cg, xla_basis_gram
from liblcg_tpu.types import Status


def _setup(grid=(64, 8, 128), seed=0):
    # kernel-facing vectors carry the operator's native 3-D shape.
    # nz=64 -> bz=32 -> TWO grid blocks: the inter-block halo slices and
    # cross-step SMEM moment accumulation are on the tested path (a
    # 16-plane grid runs a single block and never exercises them).
    A = lcg.Laplacian3DOperator(*grid, dtype=jnp.float32)
    n = grid[0] * grid[1] * grid[2]
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.standard_normal(n), jnp.float32).reshape(grid)
    return A, mk(), mk(), mk()


@pytest.mark.parametrize(
    "s,basis",
    [(2, "chebyshev"), (4, "chebyshev"), (6, "chebyshev"), (4, "monomial")],
)
def test_interpret_parity_vs_xla(s, basis):
    A, p, r, x = _setup()
    abc = basis_recurrence(s, basis, 0.0, 12.0)
    fn = PP.make_basis_gram(A, s=s, abc=abc, basis=basis, interpret=True)
    assert fn is not None
    P1, G1, w1, xx1 = fn(A, p, r, x)
    V1 = jnp.concatenate(P1, axis=0).reshape(2 * s + 1, -1)
    P0, G0, w0, xx0 = xla_basis_gram(
        A, p.reshape(-1), r.reshape(-1), x.reshape(-1), s=s, abc=abc)
    V0 = jnp.concatenate(P0, axis=0)
    sV = float(jnp.max(jnp.abs(V0)))
    sG = float(jnp.max(jnp.abs(G0)))
    assert float(jnp.max(jnp.abs(V1 - V0))) < 3e-6 * sV
    assert float(jnp.max(jnp.abs(G1 - G0.astype(G1.dtype)))) < 3e-5 * sG
    assert float(jnp.max(jnp.abs(w1 - w0.astype(w1.dtype)))) < 3e-5 * sG
    np.testing.assert_allclose(float(xx1), float(xx0), rtol=1e-5)


def test_multiblock_edge_masking():
    """z-Dirichlet ghost re-zeroing: multi-block grids must agree with the
    XLA operator chain at every level (the level >= 2 edge-block bug).
    nz=128 -> bz=32 -> FOUR grid blocks (two interior, two edge)."""
    A, p, r, x = _setup(grid=(128, 8, 128), seed=3)
    s = 4
    abc = basis_recurrence(s, "chebyshev", 0.0, 12.0)
    fn = PP.make_basis_gram(A, s=s, abc=abc, basis="chebyshev",
                            interpret=True)
    V1 = jnp.concatenate(fn(A, p, r, x)[0], axis=0).reshape(2 * s + 1, -1)
    V0 = jnp.concatenate(xla_basis_gram(
        A, p.reshape(-1), r.reshape(-1), x.reshape(-1), s=s, abc=abc)[0],
        axis=0)
    for lvl in range(2 * s + 1):
        err = float(jnp.max(jnp.abs(V1[lvl] - V0[lvl])))
        assert err < 3e-6 * float(jnp.max(jnp.abs(V0[lvl]))), f"level {lvl}"


def test_ca_cg_with_kernel_matches_xla_path():
    A, _, _, _ = _setup()
    n = A.shape[0]
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    params = lcg.SolverParams(epsilon=1e-10)
    s = 4
    abc = basis_recurrence(s, "chebyshev", 0.0, 12.0)
    fn = PP.make_basis_gram(A, s=s, abc=abc, basis="chebyshev",
                            interpret=True)
    out_k = ca_cg(A, b, s=s, basis="chebyshev", lmin=0.0, lmax=12.0,
                  params=params, basis_gram_fn=fn)
    out_x = ca_cg(A, b, s=s, basis="chebyshev", lmin=0.0, lmax=12.0,
                  params=params)
    assert int(out_k["status"]) == int(Status.CONVERGENCE)
    assert abs(int(out_k["t"]) - int(out_x["t"])) <= 1
    rel = jnp.linalg.norm(b - A.mv(out_k["x"])) / jnp.linalg.norm(b)
    assert float(rel) < 2e-5


def test_gating():
    abc = basis_recurrence(4, "chebyshev", 0.0, 12.0)
    # non-128-lane grid
    A = lcg.Laplacian3DOperator(16, 16, 16, dtype=jnp.float32)
    assert PP.make_basis_gram(A, s=4, abc=abc, basis="chebyshev") is None
    # f64 operator
    A = lcg.Laplacian3DOperator(16, 8, 128, dtype=jnp.float64)
    assert PP.make_basis_gram(A, s=4, abc=abc, basis="chebyshev") is None
    # s out of the supported window
    A = lcg.Laplacian3DOperator(16, 8, 128, dtype=jnp.float32)
    assert PP.make_basis_gram(A, s=8, abc=basis_recurrence(
        8, "chebyshev", 0.0, 12.0), basis="chebyshev") is None
    # non-stencil operator
    D = lcg.DenseOperator(jnp.eye(64, dtype=jnp.float32))
    assert PP.make_basis_gram(D, s=4, abc=abc, basis="chebyshev") is None
    # distributed tracing context -> XLA path (kernel is single-device)
    from liblcg_tpu.solvers import harness as H

    A = lcg.Laplacian3DOperator(16, 8, 128, dtype=jnp.float32)
    with H.distributed("rows", logical_dim=A.shape[0]):
        assert PP.make_basis_gram(A, s=4, abc=abc,
                                  basis="chebyshev") is None


# ---------------------------------------------------------------------------
# storeless two-sweep stepper (gram-only sweep + chain-rebuild recover)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("s,basis", [(2, "chebyshev"), (4, "chebyshev"),
                                     (4, "monomial")])
def test_fused_stepper_gram_parity(s, basis):
    """Sweep 1 (no basis writes) must produce the same moments as the
    basis-storing kernel / XLA builder."""
    A, p, r, x = _setup()
    abc = basis_recurrence(s, basis, 0.0, 12.0)
    st = PP.make_fused_stepper(A, s=s, abc=abc, basis=basis, interpret=True)
    assert st is not None
    G1, w1, xx1 = st.gram(A, p, r, x)
    _, G0, w0, xx0 = xla_basis_gram(
        A, p.reshape(-1), r.reshape(-1), x.reshape(-1), s=s, abc=abc)
    sG = float(jnp.max(jnp.abs(G0)))
    assert float(jnp.max(jnp.abs(G1 - G0.astype(G1.dtype)))) < 3e-5 * sG
    assert float(jnp.max(jnp.abs(w1 - w0.astype(w1.dtype)))) < 3e-5 * sG
    np.testing.assert_allclose(float(xx1), float(xx0), rtol=1e-5)


@pytest.mark.parametrize("grid", [(64, 8, 128), (128, 8, 128)])
def test_fused_stepper_recover_parity(grid):
    """Sweep 2 rebuilds the chains and accumulates x/r/p: must equal the
    explicit linear combination of the XLA basis (multi-block grids
    exercise the ghost-plane masking on the rebuilt chains)."""
    A, p, r, x = _setup(grid=grid, seed=11)
    s = 4
    mdim = 2 * s + 1
    abc = basis_recurrence(s, "chebyshev", 0.0, 12.0)
    st = PP.make_fused_stepper(A, s=s, abc=abc, basis="chebyshev",
                               interpret=True)
    rng = np.random.default_rng(13)
    C3 = jnp.asarray(rng.standard_normal((3, mdim)), jnp.float32)
    xn, rn, pn, rr, mx = st.recover(C3, p, r, x)
    P0, _, _, _ = xla_basis_gram(
        A, p.reshape(-1), r.reshape(-1), x.reshape(-1), s=s, abc=abc)
    V0 = jnp.concatenate(P0, axis=0)          # (mdim, n)
    ref = jnp.asarray(C3) @ V0                # (3, n)
    scale = float(jnp.max(jnp.abs(V0)))
    assert float(jnp.max(jnp.abs(xn.reshape(-1) - (x.reshape(-1) + ref[0])))
                 ) < 5e-5 * scale
    assert float(jnp.max(jnp.abs(rn.reshape(-1) - ref[1]))) < 5e-5 * scale
    assert float(jnp.max(jnp.abs(pn.reshape(-1) - ref[2]))) < 5e-5 * scale
    np.testing.assert_allclose(
        float(rr), float(jnp.sum(rn.astype(jnp.float64) ** 2)), rtol=1e-4)
    np.testing.assert_allclose(
        float(mx), float(jnp.sum(xn.astype(jnp.float64) ** 2)), rtol=1e-4)


def test_ca_cg_storeless_matches_xla_path():
    """End-to-end: pallas='always' on CPU routes the interpreted
    storeless stepper; iterations and answer must match the XLA path."""
    A, _, _, _ = _setup()
    n = A.shape[0]
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    params = lcg.SolverParams(epsilon=1e-10)
    out_k = ca_cg(A, b, s=4, basis="chebyshev", lmin=0.0, lmax=12.0,
                  params=params, pallas="always")
    out_x = ca_cg(A, b, s=4, basis="chebyshev", lmin=0.0, lmax=12.0,
                  params=params, pallas="never")
    assert int(out_k["status"]) == int(Status.CONVERGENCE)
    assert abs(int(out_k["t"]) - int(out_x["t"])) <= 1
    rel = jnp.linalg.norm(b - A.mv(out_k["x"])) / jnp.linalg.norm(b)
    assert float(rel) < 2e-5


def test_ca_cg_storeless_df64_coeff():
    """Storeless stepper + df64 coefficients — the full TPU-production
    configuration — on the CPU interpreter."""
    A, _, _, _ = _setup()
    n = A.shape[0]
    rng = np.random.default_rng(9)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    params = lcg.SolverParams(epsilon=1e-10)
    out_k = ca_cg(A, b, s=4, basis="chebyshev", lmin=0.0, lmax=12.0,
                  params=params, pallas="always", coeff="df64")
    out_x = ca_cg(A, b, s=4, basis="chebyshev", lmin=0.0, lmax=12.0,
                  params=params, pallas="never", coeff="wide")
    assert int(out_k["status"]) == int(Status.CONVERGENCE)
    assert abs(int(out_k["t"]) - int(out_x["t"])) <= 1
    rel = jnp.linalg.norm(b - A.mv(out_k["x"])) / jnp.linalg.norm(b)
    assert float(rel) < 2e-5


def test_fused_stepper_gating():
    abc = basis_recurrence(4, "chebyshev", 0.0, 12.0)
    A = lcg.Laplacian3DOperator(16, 16, 16, dtype=jnp.float32)
    assert PP.make_fused_stepper(A, s=4, abc=abc, basis="chebyshev") is None
    A = lcg.Laplacian3DOperator(16, 8, 128, dtype=jnp.float64)
    assert PP.make_fused_stepper(A, s=4, abc=abc, basis="chebyshev") is None
    D = lcg.DenseOperator(jnp.eye(64, dtype=jnp.float32))
    assert PP.make_fused_stepper(D, s=4, abc=abc, basis="chebyshev") is None
    from liblcg_tpu.solvers import harness as H

    A = lcg.Laplacian3DOperator(16, 8, 128, dtype=jnp.float32)
    with H.distributed("rows", logical_dim=A.shape[0]):
        assert PP.make_fused_stepper(A, s=4, abc=abc,
                                     basis="chebyshev") is None


def test_fused_vmem_model_calibration():
    """The recover sweep's scoped-VMEM model is calibrated against chip
    compiles of the IN-PLACE kernel (see _vmem_estimate_fused): bz=16 at
    256^3/s=4 compiles and is 10% faster than bz=8 (1.249 vs 1.393
    ms/iter) — the pick must be 16 — while bz=32 must stay rejected
    (the accumulator-carrying ancestor already OOMed at bz=16 with 3
    fewer live blocks).  128^3 stays at bz=32 (chip-validated)."""
    assert PP._pick_bz_fused(256, 256, 256, 4) == 16
    assert PP._vmem_estimate_fused(32, 256, 256, 4) > PP._VMEM_BUDGET
    # s=5 at bz=16 estimated 96.0 MB and compile-OOMed on chip at
    # 102.05 MB (the 100 MB scoped limit) — the budget must reject it
    # so the auto route degrades to bz=8 instead of failing to compile.
    assert PP._pick_bz_fused(256, 256, 256, 5) == 8
    assert PP._pick_bz_fused(128, 128, 128, 4) == 32
    # the 512^3 plane (1 MB) cannot fit any bz -> storeless unsupported,
    # auto route falls back (basis-storing kernel or XLA), never errors
    assert not PP.supported_fused((512, 512, 512), jnp.float32, 4)


# ---------------------------------------------------------------------------
# constant-coefficient general stencils (shifted / anisotropic Laplacians)
# ---------------------------------------------------------------------------


def _shifted_stencil(grid=(64, 8, 128), c0=8.5, cx=-1.0, cy=-0.5, cz=-2.0,
                     seed=3):
    """SPD constant-coefficient stencil (diagonally dominant shift)."""
    nz, ny, nx = grid
    n = nz * ny * nx
    ones = np.ones(n, np.float32)
    A = lcg.Stencil3DOperator(
        nz, ny, nx, c0 * ones, cx * ones, cx * ones, cy * ones, cy * ones,
        cz * ones, cz * ones, dtype=np.float32)
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal(n), jnp.float32).reshape(grid)
    return A, mk(), mk(), mk()


def test_const_stencil_detection():
    A, *_ = _shifted_stencil()
    assert A.const_coeffs == (8.5, -1.0, -1.0, -0.5, -0.5, -2.0, -2.0)
    assert PP._const_stencil_coeffs(A) == A.const_coeffs
    # a genuinely variable coefficient disables the scalar kernels
    nz, ny, nx = A.grid
    n = nz * ny * nx
    c0 = np.full(n, 8.5, np.float32)
    c0[n // 2] = 9.0
    ones = np.ones(n, np.float32)
    B = lcg.Stencil3DOperator(nz, ny, nx, c0, -ones, -ones, -ones, -ones,
                              -ones, -ones, dtype=np.float32)
    assert B.const_coeffs is None
    abc = basis_recurrence(4, "chebyshev", 0.0, 17.0)
    assert PP.make_basis_gram(B, s=4, abc=abc, basis="chebyshev") is None
    assert PP.make_fused_stepper(B, s=4, abc=abc, basis="chebyshev") is None


@pytest.mark.parametrize("s", [2, 4])
def test_const_stencil_interpret_parity(s):
    """Basis-storing kernel on a shifted anisotropic stencil must match
    the XLA builder (which uses A.mv, the variable-coefficient product)."""
    A, p, r, x = _shifted_stencil()
    abc = basis_recurrence(s, "chebyshev", 0.0, 17.0)
    fn = PP.make_basis_gram(A, s=s, abc=abc, basis="chebyshev",
                            interpret=True)
    assert fn is not None
    P1, G1, w1, xx1 = fn(A, p, r, x)
    V1 = jnp.concatenate(P1, axis=0).reshape(2 * s + 1, -1)
    P0, G0, w0, xx0 = xla_basis_gram(
        A, p.reshape(-1), r.reshape(-1), x.reshape(-1), s=s, abc=abc)
    V0 = jnp.concatenate(P0, axis=0)
    sV = float(jnp.max(jnp.abs(V0)))
    sG = float(jnp.max(jnp.abs(G0)))
    assert float(jnp.max(jnp.abs(V1 - V0))) < 3e-6 * sV
    assert float(jnp.max(jnp.abs(G1 - G0.astype(G1.dtype)))) < 3e-5 * sG


def test_const_stencil_storeless_end_to_end():
    """ca_cg over a shifted stencil through the storeless stepper
    (interpret) matches the pure-XLA path iteration-for-iteration."""
    A, *_ = _shifted_stencil(grid=(16, 8, 128))
    n = A.shape[0]
    b = jnp.ones((n,), jnp.float32)
    pp = lcg.SolverParams(epsilon=1e-10, max_iterations=400)
    kw = dict(s=4, basis="chebyshev", lmin=0.0, lmax=17.0, params=pp)
    st = PP.make_fused_stepper(A, s=4,
                               abc=basis_recurrence(4, "chebyshev", 0.0, 17.0),
                               basis="chebyshev", interpret=True)
    assert st is not None
    r1 = ca_cg(A, b, pallas="always", **kw)
    r0 = ca_cg(A, b, pallas="never", **kw)
    assert int(r1["status"]) == int(Status.CONVERGENCE)
    assert abs(int(r1["t"]) - int(r0["t"])) <= 2
    np.testing.assert_allclose(np.asarray(r1["x"]), np.asarray(r0["x"]),
                               rtol=2e-4, atol=2e-4)
