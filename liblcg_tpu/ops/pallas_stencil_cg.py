"""Fused-pass Pallas CG for the 3-D 7-point Laplacian in the HBM regime.

For grids too large for a VMEM-resident whole-solve (``pallas_cg``), the
XLA while-loop CG runs at HBM peak *for its own pass structure* but emits
roughly twice the necessary memory passes (measured 1.51 ms/iter at 256^3
f32 vs a ~0.74 ms ideal-fusion bound — PERFORMANCE.md).  This kernel pair
restructures one CG iteration into exactly two streaming passes:

  K1 (direction + stencil + dot):  d = beta*d_old - g  computed on the
      fly (the d-update classically forces its own third pass because
      beta is only known after the g-update); the 7-point product A d and
      the partial dot d^T A d come out of the same pass.  Halo planes of
      the *new* d are derived in-kernel from a (nblocks, 2, ny, nx)
      neighbor-plane array of d_old and g precomputed by plain XLA
      slicing each iteration (affine block index maps, domain edges
      pre-zeroed) — O(plane) extra traffic.
  K2 (updates + dots):  x += alpha d, g += alpha A d, with the partial
      dots g'^T g' and x'^T x' accumulated in the same pass.

Scalar recurrences (alpha, beta) and the stopping test run as XLA scalar
ops between the two kernels, inside one ``lax.while_loop`` — the whole
solve is still a single dispatch.  Scalars accumulate across grid steps
in SMEM (TPU grids execute sequentially on a core, the standard Pallas
reduction pattern).

Reference semantics matched: Hestenes-Stiefel recurrence and stopping
rules of ``lcg()`` (lcg.cpp:143-274, metric lcg.cpp:186-209).  float32
only (Mosaic has no f64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bz(nz: int) -> int:
    """Largest z-slab height <= 16 dividing nz (VMEM ~16 MB/step at
    256^2 planes)."""
    for bz in (16, 8, 4, 2, 1):
        if nz % bz == 0:
            return bz
    return 1


def supported(nz: int, ny: int, nx: int, dtype) -> bool:
    """Shapes the kernel accepts: f32, Mosaic-friendly plane tiling."""
    return (
        jnp.dtype(dtype) == jnp.float32
        and nx % 128 == 0
        and ny % 8 == 0
        and nz >= 2
    )


def _stencil_block(d_mid, d_lo, d_hi):
    """6*d - 6 face neighbors on a (BZ, ny, nx) block with explicit
    z-halo planes and zero-padded x/y boundaries."""
    d_ext = jnp.concatenate([d_lo, d_mid, d_hi], axis=0)
    p = jnp.pad(d_mid, ((0, 0), (1, 1), (1, 1)))
    return (
        6.0 * d_mid
        - d_ext[:-2]
        - d_ext[2:]
        - p[:, :-2, 1:-1]
        - p[:, 2:, 1:-1]
        - p[:, 1:-1, :-2]
        - p[:, 1:-1, 2:]
    )


def _k1_kernel(beta_ref, dold_ref, g_ref, dhalo_ref, ghalo_ref,
               dnew_ref, ad_ref, dtad_ref):
    """Direction update + stencil + partial d^T A d, one streaming pass.

    Halo planes arrive as a per-block (1, 2, ny, nx) view of a
    precomputed (nblocks, 2, ny, nx) array — every ref has a plain
    affine index map, which keeps Mosaic's input pipelining intact
    (clamped/computed index maps serialize the DMA stream).  Domain-edge
    planes are pre-zeroed outside, realizing the Dirichlet boundary with
    no in-kernel masking."""
    i = pl.program_id(0)
    beta = beta_ref[0]
    d_mid = beta * dold_ref[...] - g_ref[...]
    d_lo = beta * dhalo_ref[0, 0] - ghalo_ref[0, 0]
    d_hi = beta * dhalo_ref[0, 1] - ghalo_ref[0, 1]
    ad = _stencil_block(d_mid, d_lo[None], d_hi[None])
    dnew_ref[...] = d_mid
    ad_ref[...] = ad

    @pl.when(i == 0)
    def _():
        dtad_ref[0] = 0.0

    dtad_ref[0] += jnp.sum(d_mid * ad)


def _k2_kernel(alpha_ref, x_ref, g_ref, d_ref, ad_ref,
               xout_ref, gout_ref, gg_ref, xx_ref):
    i = pl.program_id(0)
    alpha = alpha_ref[0]
    x1 = x_ref[...] + alpha * d_ref[...]
    g1 = g_ref[...] + alpha * ad_ref[...]
    xout_ref[...] = x1
    gout_ref[...] = g1

    @pl.when(i == 0)
    def _():
        gg_ref[0] = 0.0
        xx_ref[0] = 0.0

    gg_ref[0] += jnp.sum(g1 * g1)
    xx_ref[0] += jnp.sum(x1 * x1)


def build_kernels(nz: int, ny: int, nx: int, interpret: bool = False):
    """(k1, k2) pallas_calls for one fused CG iteration (see module doc);
    exposed for profiling."""
    bz = _pick_bz(nz)
    nblocks = nz // bz
    dt = jnp.float32
    shape3 = (nz, ny, nx)

    def _i32(v):
        return jnp.asarray(v, jnp.int32)

    block = pl.BlockSpec((bz, ny, nx), lambda i: (_i32(i), 0, 0))
    halo = pl.BlockSpec((1, 2, ny, nx), lambda i: (_i32(i), 0, 0, 0))
    scalar_smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )

    k1 = pl.pallas_call(
        _k1_kernel,
        grid=(nblocks,),
        in_specs=[scalar_smem, block, block, halo, halo],
        out_specs=(block, block, scalar_smem),
        out_shape=(
            jax.ShapeDtypeStruct(shape3, dt),
            jax.ShapeDtypeStruct(shape3, dt),
            jax.ShapeDtypeStruct((1,), dt),
        ),
        interpret=interpret,
        **kw,
    )

    k2 = pl.pallas_call(
        _k2_kernel,
        grid=(nblocks,),
        in_specs=[scalar_smem, block, block, block, block],
        out_specs=(block, block, scalar_smem, scalar_smem),
        out_shape=(
            jax.ShapeDtypeStruct(shape3, dt),
            jax.ShapeDtypeStruct(shape3, dt),
            jax.ShapeDtypeStruct((1,), dt),
            jax.ShapeDtypeStruct((1,), dt),
        ),
        interpret=interpret,
        **kw,
    )
    return k1, k2


@functools.partial(
    jax.jit,
    static_argnames=("nz", "ny", "nx", "eps", "max_iter", "abs_diff",
                     "interpret"),
)
def pallas_cg_stencil(
    b: jnp.ndarray,                  # (n,) float32
    x0: jnp.ndarray,                 # (n,)
    *,
    nz: int,
    ny: int,
    nx: int,
    eps: float,
    max_iter: int,
    abs_diff: bool = False,
    interpret: bool = False,
):
    """Run fused-pass CG on the unit 7-point Laplacian.  Returns
    (x, iterations, residual) with the reference stopping semantics."""
    n = nz * ny * nx
    dt = jnp.float32
    shape3 = (nz, ny, nx)
    b3 = b.astype(dt).reshape(shape3)
    x3 = x0.astype(dt).reshape(shape3)
    k1, k2 = build_kernels(nz, ny, nx, interpret)
    bz = _pick_bz(nz)
    nblocks = nz // bz

    def halos(a3):
        """(nblocks, 2, ny, nx): [plane below block, plane above block],
        zero at the domain edges (Dirichlet) — O(nblocks * plane) XLA
        slicing per iteration, negligible against the block streams."""
        ab = a3.reshape(nblocks, bz, ny, nx)
        zero = jnp.zeros((1, ny, nx), dt)
        lo = jnp.concatenate([zero, ab[:-1, -1]], axis=0)
        hi = jnp.concatenate([ab[1:, 0], zero], axis=0)
        return jnp.stack([lo, hi], axis=1)

    def apply_k1(beta, d, g):
        dnew, ad, dtad = k1(
            jnp.full((1,), beta, dt), d, g, halos(d), halos(g)
        )
        return dnew, ad, dtad[0]

    # g0 = A x0 - b: K1 with beta = 0, g = -x0 gives d = x0, Ad = A x0.
    _, ax0, _ = apply_k1(jnp.asarray(0.0, dt), x3, -x3)
    g0 = ax0 - b3
    gmod0 = jnp.sum(g0 * g0)
    xmod0 = jnp.maximum(jnp.sum(x3 * x3), 1.0)

    def metric(gmod, xmod):
        if abs_diff:
            return jnp.sqrt(gmod) / n
        return gmod / xmod

    def cond(c):
        x, g, d, gmod, xmod, beta, t = c
        return (metric(gmod, xmod) > eps) & (t < max_iter)

    def body(c):
        x, g, d, gmod, xmod, beta, t = c
        d, ad, dtad = apply_k1(beta, d, g)
        alpha = gmod / dtad
        x, g, gg, xx = k2(jnp.full((1,), alpha, dt), x, g, d, ad)
        g1mod = gg[0]
        xmod = jnp.maximum(xx[0], 1.0)
        beta = g1mod / gmod
        return x, g, d, g1mod, xmod, beta, t + 1

    x, g, d, gmod, xmod, beta, t = lax.while_loop(
        cond, body,
        (x3, g0, jnp.zeros_like(b3), gmod0, xmod0, jnp.asarray(0.0, dt),
         jnp.int32(0)),
    )
    return x.reshape(-1), t, metric(gmod, xmod)


def solve_cg_stencil(A, b, x0=None, *, params=None, interpret: bool = False):
    """Public entry for :class:`liblcg_tpu.parallel.Laplacian3DOperator`.

    Raises ValueError when the operator/grid is unsupported — callers
    fall back to the standard ``solve(..., method="cg")`` path."""
    from ..parallel.stencil import Laplacian3DOperator
    from ..types import DEFAULT_PARAMS

    if not isinstance(A, Laplacian3DOperator):
        raise ValueError("solve_cg_stencil needs a Laplacian3DOperator")
    nz, ny, nx = A.grid
    if not supported(nz, ny, nx, A.dtype):
        raise ValueError(
            f"grid {A.grid} / dtype {A.dtype} unsupported (need f32, "
            "nx % 128 == 0, ny % 8 == 0)"
        )
    params = params or DEFAULT_PARAMS
    b = jnp.asarray(b).astype(jnp.float32)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0, jnp.float32)
    # The gridded pallas_call does not lower under jax_enable_x64 (the
    # traced index plumbing becomes i64, which Mosaic cannot legalize);
    # the kernel is f32-only anyway, so trace it in an x64-free scope.
    with jax.enable_x64(False):
        return pallas_cg_stencil(
            b, x0, nz=nz, ny=ny, nx=nx, eps=params.epsilon,
            max_iter=params.effective_max_iterations(),
            abs_diff=bool(params.abs_diff), interpret=interpret,
        )
