"""Whole-solve Pallas kernel: the entire CG iteration in VMEM.

For systems whose full solver state fits on-chip (DIA values + 4 vectors
inside ~16 MB of VMEM — roughly n <= 400K at f32 with a handful of
diagonals), the idiomatic TPU form of a Krylov solve is not a sequence of
XLA regions at all: it is ONE kernel that keeps x/r/d resident in VMEM and
runs the complete while-loop internally.  Every per-iteration cost that
dominates small solves — region launch latency, HBM round-trips for
40 KB vectors, reduce/broadcast pipeline flushes — disappears; the solve
costs one kernel launch plus pure VPU arithmetic.

The matrix is DIA (shifted-diagonal) storage, so the product is static
lane-shifted slices of a zero-padded x image — no gathers (TPU has no fast
gather).  Stopping follows the reference semantics (lcg.cpp:186-209):
relative ``||r||^2 / max(||x||^2, 1)`` or absolute ``sqrt(||r||^2)/n``.

float32 only: Mosaic has no f64.  Use the standard engine for f64 parity
runs; this kernel is the speed path (pair with ``reduce_dtype`` thinking —
the dots here accumulate in f32 over VMEM-resident data).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: The single-solve kernels run under the default ~16 MB scoped VMEM; the
#: batched kernels raise the cap via CompilerParams (vmem_limit_bytes).
#: Both eligibility checks size the REAL buffer census against 75% of the
#: respective cap, so changing either constant cannot silently overflow.
_VMEM_LIMIT_BYTES = 16 * 1024 * 1024
_BATCHED_VMEM_LIMIT_BYTES = 100 * 1024 * 1024

#: n-length (or nrhs x n) buffers live in the kernel at once: inputs
#: b + x0, the x output, two scratch buffers (d + the padded direction
#: image), and the while-loop carry's duplicate of x and g/r.  CGS carries
#: more (pk/uk/qk + shadow) — 10 covers the widest kernel in the family.
_N_VEC_BUFFERS = 10


def fits_in_vmem(n: int, n_diags: int, dtype=jnp.float32,
                 n_vec_buffers: int = _N_VEC_BUFFERS) -> bool:
    item = jnp.dtype(dtype).itemsize
    vecs = n_vec_buffers * n * item
    mat = n_diags * n * item
    return (vecs + mat) < 0.75 * _VMEM_LIMIT_BYTES


def _cg_kernel(offsets, pad_l, pad_r, n, eps, max_iter, abs_diff,
               vals_ref, b_ref, x0_ref,
               x_out, t_out, res_out,
               d_ref, g_ext_ref):
    """CG on A x = b with A in DIA storage, everything VMEM-resident.

    Layout: vectors are (1, n); ``g_ext_ref`` holds the zero-padded
    gradient image (1, pad_l + n + pad_r) so the product A d and the
    d-update read static lane-shifted slices.  To keep a single padded
    image, the kernel iterates on the gradient g = A x - b (CG's ``gk``,
    lcg.cpp:174) and directions d; the product uses d's own padded image
    via the same scratch (written each iteration).
    """
    # init: g0 = A x0 - b, d0 = -g0  (lcg.cpp:171-183)
    x = x0_ref[...]

    def dia_mv(v_ext):
        acc = None
        for i, o in enumerate(offsets):
            term = vals_ref[i : i + 1, :] * v_ext[:, pad_l + o : pad_l + o + n]
            acc = term if acc is None else acc + term
        return acc

    # Build padded image of x0 in scratch, compute g0.
    g_ext_ref[...] = jnp.zeros_like(g_ext_ref)
    g_ext_ref[:, pad_l : pad_l + n] = x
    g0 = dia_mv(g_ext_ref[...]) - b_ref[...]
    d_ref[...] = -g0
    # Re-purpose the padded scratch for the current direction d.
    g_ext_ref[:, pad_l : pad_l + n] = -g0

    gk_mod0 = jnp.sum(g0 * g0)
    x_mod0 = jnp.maximum(jnp.sum(x * x), 1.0)

    def metric(gmod, xmod):
        if abs_diff:
            return jnp.sqrt(gmod) / n
        return gmod / xmod

    def cond(c):
        x, g, gmod, xmod, t = c
        return (metric(gmod, xmod) > eps) & (t < max_iter)

    def body(c):
        x, g, gmod, xmod, t = c
        ad = dia_mv(g_ext_ref[...])
        d = d_ref[...]
        dTAd = jnp.sum(d * ad)
        ak = gmod / dTAd
        x = x + ak * d
        g = g + ak * ad
        g1mod = jnp.sum(g * g)
        betak = g1mod / gmod
        d = betak * d - g
        d_ref[...] = d
        g_ext_ref[:, pad_l : pad_l + n] = d
        return x, g, g1mod, jnp.maximum(jnp.sum(x * x), 1.0), t + 1

    x, g, gmod, xmod, t = lax.while_loop(
        cond, body, (x, g0, gk_mod0, x_mod0, jnp.int32(0))
    )
    x_out[...] = x
    t_out[0, 0] = t
    res_out[0, 0] = metric(gmod, xmod)


def solve_cg_vmem(A, b, x0=None, *, params=None, interpret: bool = False):
    """Public entry: whole-solve CG kernel for a :class:`BandedOperator`.

    Falls back politely: raises ValueError when the operator is not DIA or
    the state would not fit in VMEM — callers then use the standard
    ``solve(..., method="cg")`` path.  Returns a ``SolveResult``-compatible
    (x, iterations, residual) triple in float32.
    """
    from ..operators import BandedOperator
    from ..types import DEFAULT_PARAMS

    if not isinstance(A, BandedOperator):
        raise ValueError("solve_cg_vmem needs a BandedOperator (DIA storage)")
    n = A.shape[0]
    if not fits_in_vmem(n, A.n_diagonals):
        raise ValueError(
            f"state for n={n}, {A.n_diagonals} diagonals exceeds the VMEM "
            "budget; use solve(..., method='cg')"
        )
    params = params or DEFAULT_PARAMS
    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    return pallas_cg_dia(
        A.offsets, A.diag_vals, b, x0, n=n, eps=params.epsilon,
        max_iter=params.effective_max_iterations(),
        abs_diff=bool(params.abs_diff), interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "n", "eps", "max_iter", "abs_diff", "interpret"),
)
def pallas_cg_dia(
    offsets: Tuple[int, ...],
    dia_vals: jnp.ndarray,           # (n_diags, n) float32
    b: jnp.ndarray,                  # (n,)
    x0: jnp.ndarray,                 # (n,)
    *,
    n: int,
    eps: float,
    max_iter: int,
    abs_diff: bool = False,
    interpret: bool = False,
):
    """Run the whole-solve CG kernel.  Returns (x, iterations, residual)."""
    pad_l = max(0, -min(offsets, default=0))
    pad_r = max(0, max(offsets, default=0))
    dt = jnp.float32
    vals = dia_vals.astype(dt)
    b2 = b.astype(dt).reshape(1, n)
    x02 = x0.astype(dt).reshape(1, n)

    kernel = functools.partial(
        _cg_kernel, offsets, pad_l, pad_r, n, float(eps), max_iter, abs_diff
    )
    x, t, res = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), dt),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), dt),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, n), dt),                      # d
            pltpu.VMEM((1, pad_l + n + pad_r), dt),      # padded direction image
        ],
        interpret=interpret,
    )(vals, b2, x02)
    return x.reshape(n), t[0, 0], res[0, 0]


def _pcg_kernel(offsets, pad_l, pad_r, n, eps, max_iter, abs_diff,
                vals_ref, invd_ref, b_ref, x0_ref,
                x_out, t_out, res_out,
                d_ref, d_ext_ref):
    """Jacobi-preconditioned CG (Kaasschieter recurrence, lcg.cpp:293-434)
    with the whole state VMEM-resident: the reference's flagship CUDA path
    (lcg_cuda.cu:402-559 + sample8's csric02/Jacobi M) as ONE kernel.
    Stopping metric uses ||r||^2 like ``lpcg`` (convention r = B - Ax)."""
    x = x0_ref[...]

    def dia_mv(v_ext):
        acc = None
        for i, o in enumerate(offsets):
            term = vals_ref[i : i + 1, :] * v_ext[:, pad_l + o : pad_l + o + n]
            acc = term if acc is None else acc + term
        return acc

    d_ext_ref[...] = jnp.zeros_like(d_ext_ref)
    d_ext_ref[:, pad_l : pad_l + n] = x
    r = b_ref[...] - dia_mv(d_ext_ref[...])
    z = invd_ref[...] * r
    d_ref[...] = z
    d_ext_ref[:, pad_l : pad_l + n] = z
    zTr0 = jnp.sum(z * r)
    rmod0 = jnp.sum(r * r)
    xmod0 = jnp.maximum(jnp.sum(x * x), 1.0)

    def metric(rmod, xmod):
        if abs_diff:
            return jnp.sqrt(rmod) / n
        return rmod / xmod

    def cond(c):
        x, r, zTr, rmod, xmod, t = c
        return (metric(rmod, xmod) > eps) & (t < max_iter)

    def body(c):
        x, r, zTr, rmod, xmod, t = c
        ad = dia_mv(d_ext_ref[...])
        d = d_ref[...]
        dTAd = jnp.sum(d * ad)
        ak = zTr / dTAd                          # lcg.cpp:390
        x = x + ak * d
        r = r - ak * ad
        z = invd_ref[...] * r
        zTr1 = jnp.sum(z * r)
        betak = zTr1 / zTr                       # lcg.cpp:415
        dnew = z + betak * d
        d_ref[...] = dnew
        d_ext_ref[:, pad_l : pad_l + n] = dnew
        return (x, r, zTr1, jnp.sum(r * r),
                jnp.maximum(jnp.sum(x * x), 1.0), t + 1)

    x, r, zTr, rmod, xmod, t = lax.while_loop(
        cond, body, (x, r, zTr0, rmod0, xmod0, jnp.int32(0))
    )
    x_out[...] = x
    t_out[0, 0] = t
    res_out[0, 0] = metric(rmod, xmod)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "n", "eps", "max_iter", "abs_diff", "interpret"),
)
def pallas_pcg_dia(
    offsets: Tuple[int, ...],
    dia_vals: jnp.ndarray,           # (n_diags, n)
    inv_diag: jnp.ndarray,           # (n,)
    b: jnp.ndarray,                  # (n,)
    x0: jnp.ndarray,                 # (n,)
    *,
    n: int,
    eps: float,
    max_iter: int,
    abs_diff: bool = False,
    interpret: bool = False,
):
    """Whole-solve Jacobi-PCG kernel.  Returns (x, iterations, residual)."""
    pad_l = max(0, -min(offsets, default=0))
    pad_r = max(0, max(offsets, default=0))
    dt = jnp.float32
    vals = dia_vals.astype(dt)
    invd = inv_diag.astype(dt).reshape(1, n)
    b2 = b.astype(dt).reshape(1, n)
    x02 = x0.astype(dt).reshape(1, n)

    kernel = functools.partial(
        _pcg_kernel, offsets, pad_l, pad_r, n, float(eps), max_iter, abs_diff
    )
    x, t, res = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), dt),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), dt),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, n), dt),                      # d
            pltpu.VMEM((1, pad_l + n + pad_r), dt),      # padded direction image
        ],
        interpret=interpret,
    )(vals, invd, b2, x02)
    return x.reshape(n), t[0, 0], res[0, 0]


def solve_pcg_vmem(A, M, b, x0=None, *, params=None, interpret: bool = False):
    """Public entry: whole-solve Jacobi-PCG kernel for a BandedOperator and
    a diagonal preconditioner (anything exposing ``inv_diag``).  Raises
    ValueError when ineligible — callers fall back to solve()."""
    from ..operators import BandedOperator
    from ..types import DEFAULT_PARAMS

    if not isinstance(A, BandedOperator):
        raise ValueError("solve_pcg_vmem needs a BandedOperator (DIA storage)")
    inv_diag = getattr(M, "inv_diag", None)
    if inv_diag is None:
        raise ValueError("solve_pcg_vmem needs a diagonal preconditioner "
                         "(JacobiPreconditioner)")
    n = A.shape[0]
    if not fits_in_vmem(n, A.n_diagonals):
        raise ValueError(
            f"state for n={n}, {A.n_diagonals} diagonals exceeds the VMEM "
            "budget; use solve(..., method='pcg')"
        )
    params = params or DEFAULT_PARAMS
    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    return pallas_pcg_dia(
        A.offsets, A.diag_vals, jnp.asarray(inv_diag), b, x0, n=n,
        eps=params.epsilon, max_iter=params.effective_max_iterations(),
        abs_diff=bool(params.abs_diff), interpret=interpret,
    )


def _cg_kernel_batched(offsets, pad_l, pad_r, n, nrhs, eps, max_iter,
                       abs_diff,
                       vals_ref, b_ref, x0_ref,
                       x_out, t_out, res_out,
                       d_ref, d_ext_ref):
    """Multi-RHS CG: a (nrhs, n) stack solved in lockstep, entirely
    VMEM-resident, with per-system freezing (the batched-harness
    semantics of solve_batched, but with zero HBM traffic per iteration).
    The reference solves strictly one b at a time (lcg.h:61)."""
    x = x0_ref[...]                                    # (R, n)

    def dia_mv(v_ext):
        acc = None
        for i, o in enumerate(offsets):
            term = vals_ref[i : i + 1, :] * v_ext[:, pad_l + o : pad_l + o + n]
            acc = term if acc is None else acc + term
        return acc

    def rowsum(v):
        return jnp.sum(v, axis=1, keepdims=True)       # (R, 1)

    d_ext_ref[...] = jnp.zeros_like(d_ext_ref)
    d_ext_ref[:, pad_l : pad_l + n] = x
    g0 = dia_mv(d_ext_ref[...]) - b_ref[...]
    d_ref[...] = -g0
    d_ext_ref[:, pad_l : pad_l + n] = -g0
    gmod0 = rowsum(g0 * g0)
    xmod0 = jnp.maximum(rowsum(x * x), 1.0)

    def metric(gmod, xmod):
        if abs_diff:
            return jnp.sqrt(gmod) / n
        return gmod / xmod

    def alive_of(gmod, xmod, t):
        return (metric(gmod, xmod) > eps) & (t < max_iter)

    def cond(c):
        x, g, gmod, xmod, t = c
        return jnp.max(
            alive_of(gmod, xmod, t).astype(jnp.int32)) > 0

    def body(c):
        x, g, gmod, xmod, t = c
        alive = alive_of(gmod, xmod, t)                # (R, 1)
        ad = dia_mv(d_ext_ref[...])
        d = d_ref[...]
        dTAd = rowsum(d * ad)
        ak = gmod / jnp.where(dTAd == 0, jnp.float32(1.0), dTAd)
        x = jnp.where(alive, x + ak * d, x)
        g1 = jnp.where(alive, g + ak * ad, g)
        g1mod = rowsum(g1 * g1)
        betak = g1mod / jnp.where(gmod == 0, jnp.float32(1.0), gmod)
        dnew = jnp.where(alive, betak * d - g1, d)
        d_ref[...] = dnew
        d_ext_ref[:, pad_l : pad_l + n] = dnew
        gmod = jnp.where(alive, g1mod, gmod)
        xmod = jnp.where(alive, jnp.maximum(rowsum(x * x), 1.0), xmod)
        return x, g1, gmod, xmod, t + alive.astype(jnp.int32)

    x, g, gmod, xmod, t = lax.while_loop(
        cond, body,
        (x, g0, gmod0, xmod0, jnp.zeros((nrhs, 1), jnp.int32)),
    )
    x_out[...] = x
    t_out[...] = t
    res_out[...] = metric(gmod, xmod)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "n", "nrhs", "eps", "max_iter", "abs_diff",
                     "interpret"),
)
def pallas_cg_dia_batched(
    offsets: Tuple[int, ...],
    dia_vals: jnp.ndarray,           # (n_diags, n)
    B: jnp.ndarray,                  # (nrhs, n)
    X0: jnp.ndarray,                 # (nrhs, n)
    *,
    n: int,
    nrhs: int,
    eps: float,
    max_iter: int,
    abs_diff: bool = False,
    interpret: bool = False,
):
    """Whole-solve multi-RHS CG kernel.  Returns (X, t, res) with
    per-system (nrhs,) iteration counts and residual metrics."""
    pad_l = max(0, -min(offsets, default=0))
    pad_r = max(0, max(offsets, default=0))
    dt = jnp.float32
    vals = dia_vals.astype(dt)
    B2 = B.astype(dt)
    X02 = X0.astype(dt)

    kernel = functools.partial(
        _cg_kernel_batched, offsets, pad_l, pad_r, n, nrhs, float(eps),
        max_iter, abs_diff
    )
    # The while-loop carry duplicates the (nrhs, n) stack on the VMEM
    # stack, which exceeds the 16 MB default scoped limit; the budget
    # check above keeps the true footprint well under the raised cap.
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    x, t, res = pl.pallas_call(
        kernel,
        **kw,
        out_shape=(
            jax.ShapeDtypeStruct((nrhs, n), dt),
            jax.ShapeDtypeStruct((nrhs, 1), jnp.int32),
            jax.ShapeDtypeStruct((nrhs, 1), dt),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nrhs, n), dt),                      # d
            pltpu.VMEM((nrhs, pad_l + n + pad_r), dt),      # padded image
        ],
        interpret=interpret,
    )(vals, B2, X02)
    return x, t.reshape(nrhs), res.reshape(nrhs)


def fits_in_vmem_batched(n: int, n_diags: int, nrhs: int,
                         dtype=jnp.float32,
                         n_vec_buffers: int = _N_VEC_BUFFERS) -> bool:
    item = jnp.dtype(dtype).itemsize
    vecs = n_vec_buffers * nrhs * n * item
    mat = (n_diags + 1) * n * item         # DIA values + inv_diag
    return (vecs + mat) < 0.75 * _BATCHED_VMEM_LIMIT_BYTES


def _cgs_kernel(offsets, pad_l, pad_r, n, eps, max_iter, abs_diff,
                vals_ref, b_ref, x0_ref,
                x_out, t_out, res_out,
                r0T_ref, ext_ref):
    """CGS (Fokkema alg. 2, lcgs lcg.cpp:437-612) with the whole state
    VMEM-resident — together with the CG kernel this mirrors exactly the
    method set the reference's CUDA backend accelerates (its dispatcher
    handles CG and CGS only, lcg_cuda.cu:44-55).  Two DIA products per
    iteration through one zero-padded image scratch; fixed shadow
    residual r0T = r0 (lcg.cpp:483) parked in VMEM."""
    x = x0_ref[...]
    ext_ref[...] = jnp.zeros_like(ext_ref)

    def dia_mv_of(v):
        ext_ref[:, pad_l : pad_l + n] = v
        ext = ext_ref[...]
        acc = None
        for i, o in enumerate(offsets):
            term = vals_ref[i : i + 1, :] * ext[:, pad_l + o : pad_l + o + n]
            acc = term if acc is None else acc + term
        return acc

    r0 = b_ref[...] - dia_mv_of(x)
    r0T_ref[...] = r0
    rkr0T0 = jnp.sum(r0 * r0)
    rmod0 = rkr0T0
    xmod0 = jnp.maximum(jnp.sum(x * x), 1.0)

    def metric(rmod, xmod):
        if abs_diff:
            return jnp.sqrt(rmod) / n
        return rmod / xmod

    def cond(c):
        x, rk, pk, uk, rkr0T, rmod, xmod, t = c
        return (metric(rmod, xmod) > eps) & (t < max_iter)

    def body(c):
        # qk is not carried: the recurrence only ever uses THIS
        # iteration's qk1 = uk - ak*apk (uk1 and pk1 both read qk1, never
        # the previous iteration's value) — one less VMEM plane.
        x, rk, pk, uk, rkr0T, rmod, xmod, t = c
        apk = dia_mv_of(pk)
        AprT = jnp.sum(apk * r0T_ref[...])        # lcg.cpp:548-552
        ak = rkr0T / AprT
        qk1 = uk - ak * apk
        wk = uk + qk1
        awk = dia_mv_of(wk)
        x = x + ak * wk
        rk = rk - ak * awk
        rkr0T1 = jnp.sum(rk * r0T_ref[...])
        betak = rkr0T1 / rkr0T                    # lcg.cpp:589
        uk1 = rk + betak * qk1
        pk1 = uk1 + betak * (qk1 + betak * pk)
        return (x, rk, pk1, uk1, rkr0T1, jnp.sum(rk * rk),
                jnp.maximum(jnp.sum(x * x), 1.0), t + 1)

    x, rk, pk, uk, rkr0T, rmod, xmod, t = lax.while_loop(
        cond, body,
        (x, r0, r0, r0, rkr0T0, rmod0, xmod0, jnp.int32(0)),
    )
    x_out[...] = x
    t_out[0, 0] = t
    res_out[0, 0] = metric(rmod, xmod)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "n", "eps", "max_iter", "abs_diff", "interpret"),
)
def pallas_cgs_dia(
    offsets: Tuple[int, ...],
    dia_vals: jnp.ndarray,           # (n_diags, n)
    b: jnp.ndarray,                  # (n,)
    x0: jnp.ndarray,                 # (n,)
    *,
    n: int,
    eps: float,
    max_iter: int,
    abs_diff: bool = False,
    interpret: bool = False,
):
    """Whole-solve CGS kernel.  Returns (x, iterations, residual)."""
    pad_l = max(0, -min(offsets, default=0))
    pad_r = max(0, max(offsets, default=0))
    dt = jnp.float32
    vals = dia_vals.astype(dt)
    b2 = b.astype(dt).reshape(1, n)
    x02 = x0.astype(dt).reshape(1, n)

    kernel = functools.partial(
        _cgs_kernel, offsets, pad_l, pad_r, n, float(eps), max_iter, abs_diff
    )
    x, t, res = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), dt),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), dt),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, n), dt),                      # shadow residual r0T
            pltpu.VMEM((1, pad_l + n + pad_r), dt),      # padded image
        ],
        interpret=interpret,
    )(vals, b2, x02)
    return x.reshape(n), t[0, 0], res[0, 0]


def _bicgstab_kernel(offsets, pad_l, pad_r, n, eps, max_iter, abs_diff,
                     vals_ref, b_ref, x0_ref,
                     x_out, t_out, res_out,
                     r0T_ref, pk_ref, ext_ref):
    """Whole-solve BiCGSTAB (van der Vorst), everything VMEM-resident.

    Mirrors ``solvers/real.bicgstab`` (reference ``lbicgstab``
    lcg.cpp:629-794): two products per iteration through the shared
    padded-image scratch — first A pk, then A sk — with
    omega = (As.s)/(As.As) and the same stopping metric."""
    x = x0_ref[...]

    def dia_mv(v_ext):
        acc = None
        for i, o in enumerate(offsets):
            term = vals_ref[i : i + 1, :] * v_ext[:, pad_l + o : pad_l + o + n]
            acc = term if acc is None else acc + term
        return acc

    ext_ref[...] = jnp.zeros_like(ext_ref)
    ext_ref[:, pad_l : pad_l + n] = x
    rk = b_ref[...] - dia_mv(ext_ref[...])
    r0T_ref[...] = rk
    pk_ref[...] = rk
    ext_ref[:, pad_l : pad_l + n] = rk          # image holds pk
    rkr0T0 = jnp.sum(rk * rk)
    rmod0 = rkr0T0
    xmod0 = jnp.maximum(jnp.sum(x * x), 1.0)

    def metric(rmod, xmod):
        if abs_diff:
            return jnp.sqrt(rmod) / n
        return rmod / xmod

    def cond(c):
        x, rk, rkr0T, rmod, xmod, t = c
        return (metric(rmod, xmod) > eps) & (t < max_iter)

    def body(c):
        x, rk, rkr0T, rmod, xmod, t = c
        Apk = dia_mv(ext_ref[...])
        r0T = r0T_ref[...]
        pk = pk_ref[...]
        AprT = jnp.sum(Apk * r0T)                # lcg.cpp:720-724
        ak = rkr0T / AprT
        sk = rk - ak * Apk
        ext_ref[:, pad_l : pad_l + n] = sk
        Ask = dia_mv(ext_ref[...])
        Ass = jnp.sum(Ask * sk)
        AsAs = jnp.sum(Ask * Ask)
        wk = Ass / AsAs                          # lcg.cpp:741
        x = x + ak * pk + wk * sk
        rk = sk - wk * Ask
        rkr0T1 = jnp.sum(rk * r0T)
        betak = (ak / wk) * rkr0T1 / rkr0T       # lcg.cpp:773
        pk = rk + betak * (pk - wk * Apk)
        pk_ref[...] = pk
        ext_ref[:, pad_l : pad_l + n] = pk
        return (x, rk, rkr0T1, jnp.sum(rk * rk),
                jnp.maximum(jnp.sum(x * x), 1.0), t + 1)

    x, rk, rkr0T, rmod, xmod, t = lax.while_loop(
        cond, body, (x, rk, rkr0T0, rmod0, xmod0, jnp.int32(0))
    )
    x_out[...] = x
    t_out[0, 0] = t
    res_out[0, 0] = metric(rmod, xmod)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "n", "eps", "max_iter", "abs_diff", "interpret"),
)
def pallas_bicgstab_dia(
    offsets: Tuple[int, ...],
    dia_vals: jnp.ndarray,           # (n_diags, n)
    b: jnp.ndarray,                  # (n,)
    x0: jnp.ndarray,                 # (n,)
    *,
    n: int,
    eps: float,
    max_iter: int,
    abs_diff: bool = False,
    interpret: bool = False,
):
    """Whole-solve BiCGSTAB kernel.  Returns (x, iterations, residual).

    Size eligibility: pass ``n_vec_buffers=BICGSTAB_VEC_BUFFERS`` to
    :func:`fits_in_vmem` — this kernel holds two more n-vectors than CG
    (the shadow residual and the direction live in scratch, plus the
    Apk/sk/Ask transients)."""
    pad_l = max(0, -min(offsets, default=0))
    pad_r = max(0, max(offsets, default=0))
    dt = jnp.float32
    vals = dia_vals.astype(dt)
    b2 = b.astype(dt).reshape(1, n)
    x02 = x0.astype(dt).reshape(1, n)

    kernel = functools.partial(
        _bicgstab_kernel, offsets, pad_l, pad_r, n, float(eps), max_iter,
        abs_diff
    )
    x, t, res = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), dt),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), dt),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, n), dt),                      # shadow residual r0T
            pltpu.VMEM((1, n), dt),                      # direction pk
            pltpu.VMEM((1, pad_l + n + pad_r), dt),      # padded image
        ],
        interpret=interpret,
    )(vals, b2, x02)
    return x.reshape(n), t[0, 0], res[0, 0]


#: BiCGSTAB's VMEM census: CG's 10 n-vectors plus the extra scratch
#: direction and the second in-flight product transient.
BICGSTAB_VEC_BUFFERS = 12


def _bicgstab2_kernel(offsets, pad_l, pad_r, n, eps, max_iter, abs_diff,
                      restart_eps,
                      vals_ref, b_ref, x0_ref,
                      x_out, t_out, res_out,
                      r0T_ref, pk_ref, ext_ref):
    """Whole-solve restarted BiCGSTAB (the reference's LCG_BICGSTAB2,
    lcg.cpp:812-1034), everything VMEM-resident.

    Same recurrence as :func:`_bicgstab_kernel` plus the restart: when
    |<r, r0T>| < restart_epsilon the shadow residual and the direction
    reset to r (lcg.cpp:994-1009 — the restart branch skips the betak
    direction update; betak is computed but unused there).  Relative
    metric only — the abs_diff mode's mid-iteration half-step check is a
    branching body (solvers/real.bicgstab2) and stays on the XLA path.
    """
    x = x0_ref[...]

    def dia_mv(v_ext):
        acc = None
        for i, o in enumerate(offsets):
            term = vals_ref[i : i + 1, :] * v_ext[:, pad_l + o : pad_l + o + n]
            acc = term if acc is None else acc + term
        return acc

    ext_ref[...] = jnp.zeros_like(ext_ref)
    ext_ref[:, pad_l : pad_l + n] = x
    rk = b_ref[...] - dia_mv(ext_ref[...])
    r0T_ref[...] = rk
    pk_ref[...] = rk
    ext_ref[:, pad_l : pad_l + n] = rk          # image holds pk
    rkr0T0 = jnp.sum(rk * rk)
    rmod0 = rkr0T0
    xmod0 = jnp.maximum(jnp.sum(x * x), 1.0)

    def metric(rmod, xmod):
        if abs_diff:
            return jnp.sqrt(rmod) / n
        return rmod / xmod

    def cond(c):
        x, rk, rkr0T, rmod, xmod, t = c
        return (metric(rmod, xmod) > eps) & (t < max_iter)

    def body(c):
        x, rk, rkr0T, rmod, xmod, t = c
        Apk = dia_mv(ext_ref[...])
        r0T = r0T_ref[...]
        pk = pk_ref[...]
        AprT = jnp.sum(Apk * r0T)
        ak = rkr0T / AprT
        sk = rk - ak * Apk
        ext_ref[:, pad_l : pad_l + n] = sk
        Ask = dia_mv(ext_ref[...])
        Ass = jnp.sum(Ask * sk)
        AsAs = jnp.sum(Ask * Ask)
        wk = Ass / AsAs
        x = x + ak * pk + wk * sk
        rk = sk - wk * Ask
        rmod1 = jnp.sum(rk * rk)
        rkr0T1 = jnp.sum(rk * r0T)
        # Restart (lcg.cpp:994-1009): shadow and direction reset to rk;
        # the betak update is skipped (pk overwritten with rk).
        restart = jnp.abs(rkr0T1) < restart_eps
        r0T_ref[...] = jnp.where(restart, rk, r0T)
        rkr0T_new = jnp.where(restart, rmod1, rkr0T1)
        betak = (ak / wk) * rkr0T1 / rkr0T
        pk = jnp.where(restart, rk, rk + betak * (pk - wk * Apk))
        pk_ref[...] = pk
        ext_ref[:, pad_l : pad_l + n] = pk
        return (x, rk, rkr0T_new, rmod1,
                jnp.maximum(jnp.sum(x * x), 1.0), t + 1)

    x, rk, rkr0T, rmod, xmod, t = lax.while_loop(
        cond, body, (x, rk, rkr0T0, rmod0, xmod0, jnp.int32(0))
    )
    x_out[...] = x
    t_out[0, 0] = t
    res_out[0, 0] = metric(rmod, xmod)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "n", "eps", "max_iter", "abs_diff",
                     "restart_eps", "interpret"),
)
def pallas_bicgstab2_dia(
    offsets: Tuple[int, ...],
    dia_vals: jnp.ndarray,           # (n_diags, n)
    b: jnp.ndarray,                  # (n,)
    x0: jnp.ndarray,                 # (n,)
    *,
    n: int,
    eps: float,
    max_iter: int,
    abs_diff: bool = False,
    restart_eps: float = 1e-6,
    interpret: bool = False,
):
    """Whole-solve restarted BiCGSTAB2 kernel (same VMEM census as
    BiCGSTAB).  Returns (x, iterations, residual)."""
    pad_l = max(0, -min(offsets, default=0))
    pad_r = max(0, max(offsets, default=0))
    dt = jnp.float32
    vals = dia_vals.astype(dt)
    b2 = b.astype(dt).reshape(1, n)
    x02 = x0.astype(dt).reshape(1, n)

    kernel = functools.partial(
        _bicgstab2_kernel, offsets, pad_l, pad_r, n, float(eps), max_iter,
        abs_diff, float(restart_eps)
    )
    x, t, res = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), dt),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), dt),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, n), dt),                      # shadow residual r0T
            pltpu.VMEM((1, n), dt),                      # direction pk
            pltpu.VMEM((1, pad_l + n + pad_r), dt),      # padded image
        ],
        interpret=interpret,
    )(vals, b2, x02)
    return x.reshape(n), t[0, 0], res[0, 0]


#: Methods with a whole-solve kernel, per batching mode.
SINGLE_KERNEL_METHODS = ("cg", "pcg", "cgs", "bicgstab", "bicgstab2")
BATCHED_KERNEL_METHODS = ("cg", "pcg", "cgs")


def kernel_ineligibility(A, value_dtype, method: str, M, reduce_dtype,
                         *, batched: bool = False, nrhs: int = 0):
    """The ONE routing predicate every kernel dispatcher consults.

    Returns ``None`` when (A, dtype, method, M) can run on the
    whole-solve VMEM kernel family, else a human-readable reason — the
    shared core of ``solve.py``'s ``_try_pallas_cg(_batched)`` and
    ``refine.py``'s eligibility checks, so the rules cannot drift
    between the four dispatch sites.  Caller-specific conditions
    (monitor/trace support, cpu-backend policy, pallas=never/always
    semantics) stay with the callers."""
    from ..operators import BandedOperator

    methods = BATCHED_KERNEL_METHODS if batched else SINGLE_KERNEL_METHODS
    if method not in methods:
        kind = "batched " if batched else ""
        return f"no {kind}VMEM kernel for method {method!r}"
    if reduce_dtype is not None:
        return ("the kernel accumulates in f32 only "
                "(reduce_dtype is not supported)")
    if not isinstance(A, BandedOperator):
        return "the operator is not a BandedOperator (DIA)"
    if (jnp.dtype(value_dtype) != jnp.float32
            or jnp.dtype(A.dtype) != jnp.float32):
        return "the kernel is float32-only (Mosaic has no f64)"
    if method == "pcg" and getattr(M, "inv_diag", None) is None:
        return ("pcg kernel needs a diagonal preconditioner "
                "(JacobiPreconditioner)")
    n = A.shape[0]
    if batched:
        census = (dict(n_vec_buffers=BATCHED_CGS_VEC_BUFFERS)
                  if method == "cgs" else {})
        if not fits_in_vmem_batched(n, A.n_diagonals, nrhs, **census):
            return (f"state for n={n} x {nrhs} RHS exceeds the VMEM "
                    "budget")
    else:
        census = (dict(n_vec_buffers=BICGSTAB_VEC_BUFFERS)
                  if method in ("bicgstab", "bicgstab2") else {})
        if not fits_in_vmem(n, A.n_diagonals, **census):
            return f"state for n={n} exceeds the VMEM budget"
    return None


def _pcg_kernel_batched(offsets, pad_l, pad_r, n, nrhs, eps, max_iter,
                        abs_diff,
                        vals_ref, invd_ref, b_ref, x0_ref,
                        x_out, t_out, res_out,
                        d_ref, d_ext_ref):
    """Multi-RHS Jacobi-PCG: the batched-CG kernel's lockstep/freezing
    structure with the Kaasschieter recurrence of ``_pcg_kernel``."""
    x = x0_ref[...]                                    # (R, n)

    def dia_mv(v_ext):
        acc = None
        for i, o in enumerate(offsets):
            term = vals_ref[i : i + 1, :] * v_ext[:, pad_l + o : pad_l + o + n]
            acc = term if acc is None else acc + term
        return acc

    def rowsum(v):
        return jnp.sum(v, axis=1, keepdims=True)       # (R, 1)

    d_ext_ref[...] = jnp.zeros_like(d_ext_ref)
    d_ext_ref[:, pad_l : pad_l + n] = x
    r = b_ref[...] - dia_mv(d_ext_ref[...])
    z = invd_ref[...] * r
    d_ref[...] = z
    d_ext_ref[:, pad_l : pad_l + n] = z
    zTr0 = rowsum(z * r)
    rmod0 = rowsum(r * r)
    xmod0 = jnp.maximum(rowsum(x * x), 1.0)

    def metric(rmod, xmod):
        if abs_diff:
            return jnp.sqrt(rmod) / n
        return rmod / xmod

    def alive_of(rmod, xmod, t):
        return (metric(rmod, xmod) > eps) & (t < max_iter)

    def cond(c):
        x, r, zTr, rmod, xmod, t = c
        return jnp.max(
            alive_of(rmod, xmod, t).astype(jnp.int32)) > 0

    def body(c):
        x, r, zTr, rmod, xmod, t = c
        alive = alive_of(rmod, xmod, t)
        ad = dia_mv(d_ext_ref[...])
        d = d_ref[...]
        dTAd = rowsum(d * ad)
        ak = zTr / jnp.where(dTAd == 0, jnp.float32(1.0), dTAd)
        x = jnp.where(alive, x + ak * d, x)
        r1 = jnp.where(alive, r - ak * ad, r)
        z = invd_ref[...] * r1
        zTr1 = rowsum(z * r1)
        betak = zTr1 / jnp.where(zTr == 0, jnp.float32(1.0), zTr)
        dnew = jnp.where(alive, z + betak * d, d)
        d_ref[...] = dnew
        d_ext_ref[:, pad_l : pad_l + n] = dnew
        zTr = jnp.where(alive, zTr1, zTr)
        rmod = jnp.where(alive, rowsum(r1 * r1), rmod)
        xmod = jnp.where(alive, jnp.maximum(rowsum(x * x), 1.0), xmod)
        return x, r1, zTr, rmod, xmod, t + alive.astype(jnp.int32)

    x, r, zTr, rmod, xmod, t = lax.while_loop(
        cond, body,
        (x, r, zTr0, rmod0, xmod0, jnp.zeros((nrhs, 1), jnp.int32)),
    )
    x_out[...] = x
    t_out[...] = t
    res_out[...] = metric(rmod, xmod)


#: Batched CGS carries four (nrhs, n) state planes (x, r, p, u) plus
#: the shadow residual and two in-flight products — wider than batched
#: CG/PCG's census.
BATCHED_CGS_VEC_BUFFERS = 12


def _cgs_kernel_batched(offsets, pad_l, pad_r, n, nrhs, eps, max_iter,
                        abs_diff,
                        vals_ref, b_ref, x0_ref,
                        x_out, t_out, res_out,
                        r0T_ref, ext_ref):
    """Multi-RHS CGS: the batched kernels' lockstep/per-system-freezing
    structure with the Fokkema recurrence of ``_cgs_kernel``
    (lcgs, lcg.cpp:437-612)."""
    x = x0_ref[...]                                    # (R, n)
    ext_ref[...] = jnp.zeros_like(ext_ref)

    def dia_mv_of(v):
        ext_ref[:, pad_l : pad_l + n] = v
        ext = ext_ref[...]
        acc = None
        for i, o in enumerate(offsets):
            term = vals_ref[i : i + 1, :] * ext[:, pad_l + o : pad_l + o + n]
            acc = term if acc is None else acc + term
        return acc

    def rowsum(v):
        return jnp.sum(v, axis=1, keepdims=True)       # (R, 1)

    r0 = b_ref[...] - dia_mv_of(x)
    r0T_ref[...] = r0
    rkr0T0 = rowsum(r0 * r0)
    rmod0 = rkr0T0
    xmod0 = jnp.maximum(rowsum(x * x), 1.0)

    def metric(rmod, xmod):
        if abs_diff:
            return jnp.sqrt(rmod) / n
        return rmod / xmod

    def alive_of(rmod, xmod, t):
        return (metric(rmod, xmod) > eps) & (t < max_iter)

    def cond(c):
        x, rk, pk, uk, rkr0T, rmod, xmod, t = c
        return jnp.max(
            alive_of(rmod, xmod, t).astype(jnp.int32)) > 0

    def body(c):
        # qk is not carried (see _cgs_kernel): only this iteration's qk1
        # is ever read — one less (nrhs, n) VMEM plane.
        x, rk, pk, uk, rkr0T, rmod, xmod, t = c
        alive = alive_of(rmod, xmod, t)
        apk = dia_mv_of(pk)
        AprT = rowsum(apk * r0T_ref[...])
        ak = rkr0T / jnp.where(AprT == 0, jnp.float32(1.0), AprT)
        qk1 = uk - ak * apk
        wk = uk + qk1
        awk = dia_mv_of(wk)
        x1 = jnp.where(alive, x + ak * wk, x)
        rk1 = jnp.where(alive, rk - ak * awk, rk)
        rkr0T1 = rowsum(rk1 * r0T_ref[...])
        betak = rkr0T1 / jnp.where(rkr0T == 0, jnp.float32(1.0), rkr0T)
        uk1 = rk1 + betak * qk1
        pk1 = uk1 + betak * (qk1 + betak * pk)
        pk = jnp.where(alive, pk1, pk)
        uk = jnp.where(alive, uk1, uk)
        rkr0T = jnp.where(alive, rkr0T1, rkr0T)
        rmod = jnp.where(alive, rowsum(rk1 * rk1), rmod)
        xmod = jnp.where(alive, jnp.maximum(rowsum(x1 * x1), 1.0), xmod)
        return (x1, rk1, pk, uk, rkr0T, rmod, xmod,
                t + alive.astype(jnp.int32))

    x, rk, pk, uk, rkr0T, rmod, xmod, t = lax.while_loop(
        cond, body,
        (x, r0, r0, r0, rkr0T0, rmod0, xmod0,
         jnp.zeros((nrhs, 1), jnp.int32)),
    )
    x_out[...] = x
    t_out[...] = t
    res_out[...] = metric(rmod, xmod)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "n", "nrhs", "eps", "max_iter", "abs_diff",
                     "interpret"),
)
def pallas_cgs_dia_batched(
    offsets: Tuple[int, ...],
    dia_vals: jnp.ndarray,           # (n_diags, n)
    B: jnp.ndarray,                  # (nrhs, n)
    X0: jnp.ndarray,                 # (nrhs, n)
    *,
    n: int,
    nrhs: int,
    eps: float,
    max_iter: int,
    abs_diff: bool = False,
    interpret: bool = False,
):
    """Batched whole-solve CGS kernel.  Returns (X, t, res) with
    per-system iteration counts and residuals of shape (nrhs, 1)."""
    pad_l = max(0, -min(offsets, default=0))
    pad_r = max(0, max(offsets, default=0))
    dt = jnp.float32
    vals = dia_vals.astype(dt)
    B2 = B.astype(dt)
    X02 = X0.astype(dt)

    kernel = functools.partial(
        _cgs_kernel_batched, offsets, pad_l, pad_r, n, nrhs, float(eps),
        max_iter, abs_diff
    )
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_BATCHED_VMEM_LIMIT_BYTES
        )
    X, t, res = pl.pallas_call(
        kernel,
        **kw,
        out_shape=(
            jax.ShapeDtypeStruct((nrhs, n), dt),
            jax.ShapeDtypeStruct((nrhs, 1), jnp.int32),
            jax.ShapeDtypeStruct((nrhs, 1), dt),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nrhs, n), dt),                   # shadow residual
            pltpu.VMEM((nrhs, pad_l + n + pad_r), dt),   # padded image
        ],
        interpret=interpret,
    )(vals, B2, X02)
    return X, t.reshape(nrhs), res.reshape(nrhs)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "n", "nrhs", "eps", "max_iter", "abs_diff",
                     "interpret"),
)
def pallas_pcg_dia_batched(
    offsets: Tuple[int, ...],
    dia_vals: jnp.ndarray,           # (n_diags, n)
    inv_diag: jnp.ndarray,           # (n,)
    B: jnp.ndarray,                  # (nrhs, n)
    X0: jnp.ndarray,                 # (nrhs, n)
    *,
    n: int,
    nrhs: int,
    eps: float,
    max_iter: int,
    abs_diff: bool = False,
    interpret: bool = False,
):
    """Whole-solve multi-RHS Jacobi-PCG kernel.  Returns (X, t, res)."""
    pad_l = max(0, -min(offsets, default=0))
    pad_r = max(0, max(offsets, default=0))
    dt = jnp.float32
    vals = dia_vals.astype(dt)
    invd = inv_diag.astype(dt).reshape(1, n)
    B2 = B.astype(dt)
    X02 = X0.astype(dt)

    kernel = functools.partial(
        _pcg_kernel_batched, offsets, pad_l, pad_r, n, nrhs, float(eps),
        max_iter, abs_diff
    )
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    x, t, res = pl.pallas_call(
        kernel,
        **kw,
        out_shape=(
            jax.ShapeDtypeStruct((nrhs, n), dt),
            jax.ShapeDtypeStruct((nrhs, 1), jnp.int32),
            jax.ShapeDtypeStruct((nrhs, 1), dt),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nrhs, n), dt),                      # d
            pltpu.VMEM((nrhs, pad_l + n + pad_r), dt),      # padded image
        ],
        interpret=interpret,
    )(vals, invd, B2, X02)
    return x, t.reshape(nrhs), res.reshape(nrhs)
