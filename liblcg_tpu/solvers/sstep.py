"""Communication-avoiding (s-step) CG — the HBM-bandwidth / latency lever.

TPU-native addition with no reference counterpart (the reference's CG,
``src/lib/lcg.cpp:143-274``, is the method being accelerated; its per-
iteration cost model — 1 product + 2 reductions + 3 axpy passes over N —
is the thing s-step restructures).  Motivation, from PERFORMANCE.md's
traffic arithmetic: at HBM-streaming scale (256^3: state >> VMEM) a fused
classic CG iteration must stream ~9.5 vector-lengths per iteration and the
XLA loop already achieves that bound, so the only way down is a scheme
that amortizes state traffic across iterations.

s-step CG (Chronopoulos & Gear 1989; Carson & Demmel 2014 formulation)
advances s CG iterations per outer step:

1. Build the 2s+1 Krylov basis  V = [p, P1(A)p, ..., Ps(A)p,
   r, P1(A)r, ..., P_{s-1}(A)r]  with a three-term polynomial recurrence
   (monomial or, for conditioning, Chebyshev on a spectral interval).
2. One Gram matrix  G = [V; x]^T [V; x]  — the ONLY reduction for s
   iterations (sharded: TWO reduction rounds per s iterations — the Gram
   psum and the block-end norm psum — instead of 2 per iteration: the
   s-fold collective economy that names the method).
3. Run the s CG recurrences exactly, in (2s+1)-dimensional coefficient
   space: alpha/beta from G and the tridiagonal basis-change matrix T
   (A V c = V T c), zero vector-length work.
4. Recover x, r, p with one pass over V.

The basis+Gram stage is pluggable (``basis_gram_fn``); for stencil
operators two Pallas forms exist (ops/pallas_powers.py): a basis-storing
powers+Gram kernel (V and G in one HBM sweep) and the default STORELESS
two-sweep stepper (gram-only sweep + chain-rebuild recover sweep — the
basis never touches HBM).  Single-chip verdict (chip-measured,
profiling/probe_r3_storeless.json + probe_r3_inplace.json): storeless
s=4 with df64 coefficient algebra runs **1.249 ms/iter vs classic fused
CG's 1.516** at 256^3 f32 (1.21x) — the first variant to beat the
channel-saturated classic loop on one chip (basis-storing: 1.540; s=6
loses both ways — chain recompute grows with s).  cacg's structural win remains the collective economy above
(2 psum rounds per s iterations vs classic CG's 2 per iteration), plus
exact f64 iteration parity and +2% f32 iterations at 128^3.

Numerics: in exact arithmetic the iterates equal classic CG's.  In finite
precision the monomial basis conditions like kappa(A)^s — use the default
Chebyshev basis (bounds from ``ops.spectra``) for s > 2-3.  The Gram is
accumulated AND KEPT in the wide dtype (``_wide_dtype``) and the recovery
is an elementwise FMA sweep — see the in-code notes for the measured TPU
failure modes behind both choices.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..types import SolverParams, Status
from ..ops import df64 as D
from . import harness as H

_HI = lax.Precision.HIGHEST


def basis_recurrence(s: int, basis: str, lmin: float, lmax: float):
    """Three-term recurrence coefficients (a_j, b_j, c_j), j = 0..s-1, for
    ``v_{j+1} = (A v_j - a_j v_j - c_j v_{j-1}) / b_j``.

    monomial:   v_{j+1} = A v_j                      (a=c=0, b=1)
    chebyshev:  shifted-scaled Chebyshev on [lmin, lmax] — bounded on the
                spectrum, so the basis condition number stays polynomial
                in s instead of exponential.
    """
    if basis == "monomial":
        return (0.0,) * s, (1.0,) * s, (0.0,) * s
    if basis != "chebyshev":
        raise ValueError(f"unknown basis {basis!r} (monomial|chebyshev)")
    if not (lmax > lmin):
        raise ValueError(f"need lmax > lmin, got [{lmin}, {lmax}]")
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    a = (theta,) * s
    b = (delta,) + (delta / 2.0,) * (s - 1)
    c = (0.0,) + (delta / 2.0,) * (s - 1)
    return a, b, c


def _basis_T(s: int, abc) -> np.ndarray:
    """(2s+1, 2s+1) basis-change matrix: A (V c) = V (T c) for coefficient
    vectors supported on the valid prefix of each chain (the CG recurrence
    never touches the chain tips — Carson 2014, Lemma on basis width)."""
    a, b, c = abc
    m = 2 * s + 1
    T = np.zeros((m, m))
    for j in range(s):               # P-chain columns 0..s-1 (tip s unused)
        T[j, j] = a[j]
        T[j + 1, j] = b[j]
        if j >= 1:
            T[j - 1, j] = c[j]
    off = s + 1
    for j in range(s - 1):           # R-chain columns (tip 2s unused)
        T[off + j, off + j] = a[j]
        T[off + j + 1, off + j] = b[j]
        if j >= 1:
            T[off + j - 1, off + j] = c[j]
    return T


def _wide_dtype(storage_dtype, reduce_dtype=None):
    """Accumulation dtype for the Gram/coefficient algebra: f64 whenever
    the x64 config allows it (canonicalization-aware), else the storage
    dtype.  Gram accuracy is structural for s-step methods: a residual
    concentrated in a narrow spectral band makes the basis nearly
    collinear and the coefficient quadratic forms cancel to below f32
    resolution (measured: negative r^T G r at s >= 4 on the 96^3
    Laplacian with b = 1)."""
    want = jnp.promote_types(
        jnp.dtype(storage_dtype),
        jnp.dtype(reduce_dtype) if reduce_dtype is not None else jnp.float64,
    )
    got = jax.dtypes.canonicalize_dtype(want)
    return got if got != jnp.dtype(storage_dtype) else None


def xla_basis_gram(A, p, r, x, *, s: int, abc, reduce_dtype=None):
    """Default basis+Gram builder: 2s-1 operator products (XLA fuses the
    three-term combination into each product's pass) and ONE fused
    Gram/moment matmul  [V; x] [V; x]^T  at HIGHEST precision.

    The basis is built by in-place dynamic-update-slices into ONE
    (2s+2, n) buffer (a list + jnp.stack costs a full extra read+write
    of the basis — measured 1.0 ms/iter of pure copy at 256^3 f32).

    Returns (parts, G, w, xx): parts — tuple of stacked basis blocks
    (here one (2s+1, n) array), G = V V^T, w = V x, xx = ||x||^2.
    psum-reduced when tracing inside a ``harness.distributed`` context
    (one collective per outer step).

    KNOWN LIMIT (measured, probe_r4_cacg_envelope.json): at large n on
    this TPU the HIGHEST-precision Gram contraction materializes its
    3-way bf16 operand splits in HBM (CLAUDE.md) — 20.5 ms/iter at 192^3
    where classic CG costs 0.85.  Operators that reach this fallback at
    HBM scale (variable-coefficient stencils, wide DIA) should use
    classic CG / PCG instead; the Pallas routes avoid the contraction
    entirely (SMEM moment dots).
    """
    m = 2 * s + 1
    n = p.shape[0]
    a, bco, cco = abc
    Vx = jnp.empty((m + 1, n), p.dtype)
    Vx = lax.dynamic_update_slice_in_dim(Vx, x[None], m, 0)
    for base, v0, steps in ((0, p, s), (s + 1, r, s - 1)):
        Vx = lax.dynamic_update_slice_in_dim(Vx, v0[None], base, 0)
        prev, cur = None, v0
        for j in range(steps):
            v = A.mv(cur) - a[j] * cur
            if j >= 1 and cco[j] != 0.0:
                v = v - cco[j] * prev
            if bco[j] != 1.0:
                v = v * (1.0 / bco[j])
            Vx = lax.dynamic_update_slice_in_dim(Vx, v[None], base + j + 1, 0)
            prev, cur = cur, v
    acc = _wide_dtype(p.dtype, reduce_dtype)
    Mo = lax.dot_general(
        Vx, Vx, (((1,), (1,)), ((), ())),
        precision=_HI, preferred_element_type=acc,
    )
    ax = H.dist_axis()
    if ax is not None:
        Mo = lax.psum(Mo, ax)
    # Keep the moment block in the accumulation dtype: for residuals
    # dominated by a narrow spectral band the basis is nearly collinear,
    # the Gram nearly singular, and rounding it back to storage precision
    # re-poisons the coefficient quadratic forms that the wide
    # accumulation just rescued (measured: 96^3 f32 b=1, s>=4 produced
    # NEGATIVE r^T G r from an f32-rounded f64-accurate Gram).
    return (Vx[:m],), Mo[:m, :m], Mo[:m, m], Mo[m, m]


def ca_cg(
    A,
    b,
    x0=None,
    *,
    s: int = 4,
    lmin: Optional[float] = None,
    lmax: Optional[float] = None,
    basis: str = "chebyshev",
    params: SolverParams = SolverParams(),
    monitor: Optional[Callable] = None,
    trace_len: int = 0,
    basis_gram_fn: Optional[Callable] = None,
    recompute_residual: bool = False,
    pallas: str = "auto",
    coeff: str = "auto",
):
    """s-step CG for SPD systems: mathematically classic CG (identical
    iterates in exact arithmetic; stopping metric lcg.cpp:186-209), with s
    iterations of progress per basis build + two reduction rounds
    (vs classic CG's two per iteration — an s-fold collective saving).

    ``basis_gram_fn(A, p, r, x) -> (parts, G, w, xx)`` overrides the
    basis stage (the fused Pallas kernel plugs in here); ``parts`` is a
    tuple of stacked basis blocks whose concatenation is V in canonical
    order [p-chain | r-chain].  ``monitor`` fires at
    OUTER-step granularity (x is only materialized every s iterations) —
    the stop contract is otherwise that of run_loop.

    ``pallas``: "auto" (default) prefers the STORELESS two-sweep Pallas
    stepper for supported stencil operators (the basis never touches
    HBM: a gram-only sweep + a chain-rebuild recover sweep), else the
    basis-storing powers+Gram kernel, else XLA; "basis" forces the
    basis-storing kernel (A/B measurement hook); "always" demands a
    kernel (interpreter on CPU — the test hook); "never" forces XLA.

    ``coeff``: precision of the (2s+1)-dim coefficient recurrences —
    "wide" (promoted f64; emulated on TPU, ~0.15 ms/iter of sequential
    tiny-reduction launch tax at 256^3), "df64" (double-float f32 pairs,
    ops/df64.py — same iteration counts at fused-elementwise cost; f32
    storage only), "auto" (df64 for f32 storage off-CPU or when x64 is
    unavailable, else wide).

    Stopping semantics match the reference's: convergence is declared on
    the RECURRENCE residual — here the norm of the recovered residual
    vector at each block boundary (fused into the recovery pass), never
    the coefficient quadratic form alone (which cancels, and can even
    turn negative, at the Gram's precision floor; a floor hit freezes
    the junk step, restarts the direction from r, and a no-progress
    guard exits after two stalled blocks).  ``recompute_residual=True``
    additionally verifies convergence claims against the TRUE residual
    ``b - A x`` (one product per claiming block) — STRICTER than the
    reference/classic CG, whose certificate is also recurrence-based;
    off by default.  Per-block unconditional replacement was measured to
    DAMAGE conjugacy (96^3 f32 stalled outright at s=2-4) and is not
    offered.
    """
    if H.batch_active():
        raise NotImplementedError(
            "ca_cg does not run under the stacked batched harness; "
            "solve_batched(method='cacg') dispatches a vmapped form "
            "(solve._solve_cacg_batched) with identical per-system "
            "semantics"
        )
    if s < 1:
        raise ValueError(f"s must be >= 1, got {s}")
    if basis == "chebyshev" and (lmin is None or lmax is None):
        raise ValueError("chebyshev basis needs lmin/lmax (ops.spectra)")
    abc = basis_recurrence(s, basis, lmin, lmax)
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    n = H.dim(b)
    mdim = 2 * s + 1
    off = s + 1                       # first R-chain coordinate
    # Coefficient math must run well beyond storage precision (see
    # _wide_dtype: Gram cancellation is the s-step failure mode).  Three
    # modes: "wide" = promoted dtype (f64 — EMULATED on TPU, where every
    # tiny reduction lowers to its own ~49 us sequential loop, a measured
    # ~0.15 ms/iter launch tax at 256^3); "df64" = double-float pairs of
    # f32 (ops/df64.py — ~48-bit mantissa from pure elementwise f32 that
    # XLA fuses, no x64 requirement); "auto" = df64 for f32 storage
    # off-CPU (and whenever x64 is off), else wide.
    wide = _wide_dtype(b.dtype, params.reduce_dtype)
    if coeff not in ("auto", "wide", "df64"):
        raise ValueError(f"coeff must be auto|wide|df64, got {coeff!r}")
    if coeff == "df64" and jnp.dtype(b.dtype) != jnp.float32:
        raise ValueError(
            "coeff='df64' carries ~48 mantissa bits — a precision "
            "downgrade for f64 storage; use coeff='wide'"
        )
    if coeff == "auto":
        on_cpu = jax.devices()[0].platform == "cpu"
        use_df64 = jnp.dtype(b.dtype) == jnp.float32 and (
            wide is None or not on_cpu
        )
    else:
        use_df64 = coeff == "df64"
    cdt = wide if wide is not None else b.dtype
    Tm = jnp.asarray(_basis_T(s, abc), cdt)
    Tm_df = D.const(_basis_T(s, abc))      # exact: entries are f64 host values
    eps = params.epsilon
    max_iter = params.effective_max_iterations()

    stepper = None
    if basis_gram_fn is None and pallas != "never":
        # Pallas routing for supported stencil operators, preferring the
        # STORELESS two-sweep stepper (gram-only sweep + chain-rebuild
        # recover sweep — the basis never touches HBM: ~10 vector
        # streams per s iterations vs ~23 for the basis-storing form)
        # and falling back to the basis-storing powers+Gram kernel.
        # "auto" falls back to XLA off-accelerator; "always" demands a
        # kernel (interpreter on CPU backends — the test hook);
        # "basis" forces the basis-storing kernel (A/B measurement
        # hook).
        from ..ops.pallas_powers import make_basis_gram, make_fused_stepper

        on_cpu = jax.devices()[0].platform == "cpu"
        interp = pallas == "always" and on_cpu
        if pallas == "always" or not on_cpu:
            if pallas != "basis":
                stepper = make_fused_stepper(
                    A, s=s, abc=abc, basis=basis, interpret=interp
                )
            if stepper is None:
                basis_gram_fn = make_basis_gram(
                    A, s=s, abc=abc, basis=basis, interpret=interp,
                )
        if pallas == "always" and stepper is None and basis_gram_fn is None:
            raise ValueError(
                "pallas='always' but the powers kernel does not support "
                "this operator/grid/s (need Laplacian3DOperator or a "
                "constant-coefficient Stencil3DOperator, f32, "
                "nx % 128 == 0, ny % 8 == 0, 2 <= s <= 6, single-device)"
            )

    if stepper is None and basis_gram_fn is None:
        def basis_gram_fn(A_, p_, r_, x_):
            return xla_basis_gram(A_, p_, r_, x_, s=s, abc=abc,
                                  reduce_dtype=params.reduce_dtype)

    # When the kernel declares a native vector shape, carry every solve
    # vector IN that shape: a flat<->3-D reshape at the pallas boundary
    # is a physical relayout copy every outer step (pure-XLA consumers
    # fuse reshapes away; custom calls cannot).
    vec_shape = getattr(stepper if stepper is not None else basis_gram_fn,
                        "vec_shape", None)
    mv = A.mv
    if vec_shape is not None:
        b = b.reshape(vec_shape)
        x = x.reshape(vec_shape)
        mv = lambda v: A.mv(v.reshape(-1)).reshape(vec_shape)  # noqa: E731

    r0 = b - mv(x)
    carry = dict(
        x=x,
        r=r0,
        p=r0,
        rr=H.sq_norm(r0),
        m_mod=jnp.maximum(H.sq_norm(x), 1.0),
        t=jnp.asarray(0, jnp.int32),
        stop=jnp.asarray(False),
        stall=jnp.asarray(0, jnp.int32),
        residual=jnp.asarray(0.0, b.real.dtype),
        trace=H.init_trace(trace_len, b.real.dtype),
    )
    carry["residual"] = H.real_residual(
        carry["rr"], carry["m_mod"], n, params.abs_diff
    ).astype(b.real.dtype)

    def cond_fn(c):
        hit_max = (params.max_iterations > 0) & (
            c["t"] + 1 > params.max_iterations
        )
        # NaN residual compares False -> exits (run_loop convention).
        # stall < 2: two consecutive blocks with zero accepted steps
        # means the Gram floor sits above eps even after a direction
        # restart — exit (classified REACHED_MAX_ITERATIONS) instead of
        # spinning on frozen state.
        return (c["residual"] > eps) & ~c["stop"] & ~hit_max & (
            c["t"] <= max_iter
        ) & (c["stall"] < 2)

    def _coeff_wide(G, w, xx, t, res, trace):
        """The s CG recurrences in (2s+1)-dim coefficient space, promoted
        dtype.  Returns (stacked [x̂; r̂; p̂] with the floor-restart
        applied, t, res, trace)."""
        Gc = G.astype(cdt)
        wc = w.astype(cdt)
        xxc = xx.astype(cdt)
        p_hat = jnp.zeros((mdim,), cdt).at[0].set(1.0)
        r_hat = jnp.zeros((mdim,), cdt).at[off].set(1.0)
        x_hat = jnp.zeros((mdim,), cdt)
        rr = Gc[off, off]
        res = res.astype(cdt)
        floor = jnp.asarray(False)
        # Carried Gram products (exact recurrences): each inner step then
        # needs ONE small matvec (GT @ p_hat) instead of three — the
        # coefficient algebra runs in the wide dtype, whose tiny emulated
        # ops are launch-count-bound on TPU (measured ~0.3 ms/iter for
        # the naive 3-matvec form at 256^3).
        #   G r_hat:  Gr2 = Gr - alpha * (GT p_hat)
        #   G p_hat:  Gp2 = Gr2 + beta * Gp
        #   G x_hat:  Gx2 = Gx + alpha * Gp
        # Solver-critical contraction: HIGHEST precision (the TPU f32
        # default multiplies in bf16 passes, CLAUDE.md — and GTp feeds
        # alpha/beta through the cancellation-prone Gram algebra).
        GT = jnp.matmul(Gc, Tm, precision=_HI)
        TG = jnp.concatenate([Tm, GT], axis=0)   # one matvec -> Tp | GTp
        Gr = Gc[:, off]
        Gp = Gc[:, 0]
        Gx = jnp.zeros((mdim,), cdt)
        for _ in range(s):
            # Top-of-iteration checks, reference order (lcg.cpp:206-264):
            # a converged / max-iter / NaN state freezes, an alive state
            # steps — NaN produced by a step is ACCEPTED so it propagates
            # into ``res`` and exits the outer loop for classification.
            hit_max = (params.max_iterations > 0) & (
                t + 1 > params.max_iterations
            )
            alive = (res > eps) & ~hit_max & (t <= max_iter)
            if trace is not None:
                idx = jnp.where(alive, t, jnp.iinfo(jnp.int32).max)
                trace = H.record_trace(trace, idx, res)
            y = TG @ p_hat
            Tp, GTp = y[:mdim], y[mdim:]
            denom = p_hat @ GTp
            alpha = rr / denom
            x_hat2 = x_hat + alpha * p_hat
            r_hat2 = r_hat - alpha * Tp
            Gr2 = Gr - alpha * GTp
            Gx2 = Gx + alpha * Gp
            rr2 = r_hat2 @ Gr2
            beta = rr2 / rr
            p_hat2 = r_hat2 + beta * p_hat
            Gp2 = Gr2 + beta * Gp
            # A finite nonpositive r^T G r is impossible in exact
            # arithmetic: the coefficient algebra hit the Gram's
            # cancellation floor.  Freeze (don't accept the junk step)
            # and flag for verify-at-exit.  NaN is NOT flagged here —
            # it must propagate into res for NAN_VALUE classification.
            bad = rr2 <= 0.0
            accept = alive & ~bad
            floor = floor | (alive & bad)
            x_hat = jnp.where(accept, x_hat2, x_hat)
            r_hat = jnp.where(accept, r_hat2, r_hat)
            p_hat = jnp.where(accept, p_hat2, p_hat)
            Gr = jnp.where(accept, Gr2, Gr)
            Gp = jnp.where(accept, Gp2, Gp)
            Gx = jnp.where(accept, Gx2, Gx)
            rr = jnp.where(accept, rr2, rr)
            t = t + accept.astype(jnp.int32)
            # one (2, m) matvec instead of two dots: each tiny wide-dtype
            # reduction lowers to its own ~49 us emulation loop on TPU
            # (profiled) — batching halves that launch tax
            xd = jnp.stack([wc, Gx]) @ x_hat
            xn = xxc + 2.0 * xd[0] + xd[1]
            res = jnp.where(
                alive,
                H.real_residual(rr, jnp.maximum(xn, 1.0), n,
                                params.abs_diff),
                res,
            )
        # A Gram-floor hit restarts the direction (p := r) — applied in
        # COEFFICIENT space (p_rec = V p_hat, r_rec = V r_hat: selecting
        # coefficients yields the identical vector), so the restart
        # costs a 9-element select instead of a full extra vector pass.
        p_hat = jnp.where(floor, r_hat, p_hat)
        return jnp.stack([x_hat, r_hat, p_hat]), t, res, trace

    def _coeff_df64(G, w, xx, t, res, trace):
        """The same recurrences in double-float (hi, lo) f32 pairs
        (ops/df64.py): ~48-bit mantissa — above the Gram-cancellation
        floor that breaks plain f32 (measured: 339 vs 200 iterations at
        128^3) — from pure elementwise f32 ops that XLA fuses into a
        handful of kernels, instead of the emulated-f64 path where every
        tiny reduction is its own ~49 us sequential loop (the measured
        ~0.15 ms/iter coefficient tax at 256^3).  NaN propagates through
        the hi words, preserving the NAN_VALUE classification contract.
        Control flow mirrors _coeff_wide exactly."""
        Gc = D.from_array(G)
        wc = D.from_array(w)
        xxc = D.from_array(xx)
        e_p = np.zeros(mdim)
        e_p[0] = 1.0
        e_r = np.zeros(mdim)
        e_r[off] = 1.0
        p_hat = D.const(e_p)
        r_hat = D.const(e_r)
        x_hat = D.zeros((mdim,))
        rr = D.index(Gc, (off, off))
        floor = jnp.asarray(False)
        GT = D.matmul(Gc, Tm_df)
        TG = D.concat([Tm_df, GT], axis=0)   # one matvec -> Tp | GTp
        Gr = D.index(Gc, (slice(None), off))
        Gp = D.index(Gc, (slice(None), 0))
        Gx = D.zeros((mdim,))
        for _ in range(s):
            hit_max = (params.max_iterations > 0) & (
                t + 1 > params.max_iterations
            )
            alive = (res > eps) & ~hit_max & (t <= max_iter)
            if trace is not None:
                idx = jnp.where(alive, t, jnp.iinfo(jnp.int32).max)
                trace = H.record_trace(trace, idx, res)
            y = D.matvec(TG, p_hat)
            Tp = D.index(y, slice(0, mdim))
            GTp = D.index(y, slice(mdim, None))
            denom = D.dot(p_hat, GTp)
            alpha = D.div(rr, denom)
            nalpha = D.neg(alpha)
            x_hat2 = D.axpy(alpha, p_hat, x_hat)
            r_hat2 = D.axpy(nalpha, Tp, r_hat)
            Gr2 = D.axpy(nalpha, GTp, Gr)
            Gx2 = D.axpy(alpha, Gp, Gx)
            rr2 = D.dot(r_hat2, Gr2)
            beta = D.div(rr2, rr)
            p_hat2 = D.axpy(beta, p_hat, r_hat2)
            Gp2 = D.axpy(beta, Gp, Gr2)
            # NaN rr2 compares False -> accepted -> propagates into res,
            # exactly as the wide path's ``rr2 <= 0.0``.
            bad = D.nonpos(rr2)
            accept = alive & ~bad
            floor = floor | (alive & bad)
            x_hat = D.where(accept, x_hat2, x_hat)
            r_hat = D.where(accept, r_hat2, r_hat)
            p_hat = D.where(accept, p_hat2, p_hat)
            Gr = D.where(accept, Gr2, Gr)
            Gp = D.where(accept, Gp2, Gp)
            Gx = D.where(accept, Gx2, Gx)
            rr = D.where(accept, rr2, rr)
            t = t + accept.astype(jnp.int32)
            xd = D.matvec(D.stack([wc, Gx]), x_hat)
            xn = D.to_array(
                D.add(D.add(xxc, D.mul_pow2(D.index(xd, 0), 2.0)),
                      D.index(xd, 1))
            )
            res = jnp.where(
                alive,
                H.real_residual(D.to_array(rr), jnp.maximum(xn, 1.0), n,
                                params.abs_diff),
                res,
            )
        p_hat = D.where(floor, r_hat, p_hat)
        return D.to_array(D.stack([x_hat, r_hat, p_hat])), t, res, trace

    def body_fn(c):
        if stepper is not None:
            G, w, xx = stepper.gram(A, c["p"], c["r"], c["x"])
        else:
            parts, G, w, xx = basis_gram_fn(A, c["p"], c["r"], c["x"])
        coeff_block = _coeff_df64 if use_df64 else _coeff_wide
        C3w, t, res, trace = coeff_block(
            G, w, xx, c["t"], c["residual"], c["trace"]
        )
        # One recovery pass over the basis for all three vectors, as an
        # UNROLLED scalar-FMA chain (XLA fuses it into a single sweep
        # reading each basis row once).  NOT a dot_general: an f32
        # Precision.HIGHEST contraction at this size materializes the
        # 3-way bf16 operand splits in HBM (observed: a bf16[8,m,n]
        # temp, ~3x the basis size) — the elementwise form is both full
        # f32 precision and the traffic model's 2s+5 streams.
        # Device profiling showed three separate accumulators become
        # three XLA fusions, each re-reading every basis row
        # (2.63 ms/block at 256^3); ONE stacked (3, ...) accumulation is
        # a single sweep.  (Carrying the whole solve state stacked was
        # tried and measured WORSE — the pallas operand and the floor
        # select then materialize slice/bitcast and select passes, 2.12
        # vs 1.67 ms/iter — so the stack exists only inside this sweep.)
        if stepper is not None:
            # Storeless path: sweep 2 rebuilds the chains and emits
            # x/r/p plus the block-end norms — the basis never existed
            # in HBM.  (The acc dtype is the kernel's f32; cast to the
            # carry's accumulation dtype.)
            x_new, r_rec, p_rec_acc, rr_k, mx_k = stepper.recover(
                C3w.astype(b.dtype), c["p"], c["r"], c["x"]
            )
            rr_out = rr_k.astype(c["rr"].dtype)
            m_mod = jnp.maximum(mx_k.astype(c["m_mod"].dtype), 1.0)
        else:
            vdt = parts[0].dtype
            nd1 = parts[0].ndim - 1
            C3 = C3w.astype(vdt)  # (3, mdim): [x̂; r̂; p̂], floor-restarted
            out3 = None
            k0 = 0
            for part in parts:
                for j in range(part.shape[0]):
                    v = part[j][None]
                    coef = C3[:, k0].reshape((3,) + (1,) * nd1)
                    term = coef * v
                    out3 = term if out3 is None else out3 + term
                    k0 += 1
            dx, r_rec, p_rec_acc = out3[0], out3[1], out3[2]
            x_new = c["x"] + dx
            # The authoritative block-end residual is the NORM OF THE
            # RECOVERED RESIDUAL VECTOR — exactly the quantity classic
            # CG's stopping test uses (the recurrence residual,
            # lcg.cpp:208-209), and immune to the coefficient quadratic
            # form's cancellation (which can even turn negative at the
            # Gram floor).  XLA fuses these norms into the recovery
            # pass: no extra HBM sweep.  The in-block coefficient
            # estimates only drive freezing/counting; a block that froze
            # early on an optimistic estimate is simply resumed by the
            # outer loop.
            rr_out = H.sq_norm(r_rec)
            m_mod = jnp.maximum(H.sq_norm(x_new), 1.0)
        res_vec = H.real_residual(rr_out, m_mod, n, params.abs_diff)
        res_out = jnp.where(jnp.isnan(res.astype(b.real.dtype)),
                            jnp.asarray(jnp.nan, b.real.dtype), res_vec)
        p_new = p_rec_acc

        if recompute_residual:
            # Optional paranoia: also replace r with the TRUE residual
            # b - A x when the vector-norm test claims convergence.
            # Stricter than the reference's recurrence-residual
            # semantics; costs one product on claiming blocks.
            def _verify(_):
                r_t = b - mv(x_new)
                rr_t = H.sq_norm(r_t)
                res_t = H.real_residual(rr_t, m_mod, n, params.abs_diff)
                res_t = jnp.where(jnp.isnan(res_out), res_out, res_t)
                return r_t, rr_t, res_t

            def _keep(_):
                return r_rec, rr_out, res_out

            r_new, rr_out, res_out = lax.cond(
                res_out <= eps, _verify, _keep, None
            )
        else:
            r_new = r_rec

        stop = c["stop"]
        if monitor is not None:
            x_mon = x_new.reshape(-1) if vec_shape is not None else x_new
            stop = jnp.asarray(monitor(x_mon, res_out, t)) | stop
        stall = jnp.where(t > c["t"], 0, c["stall"] + 1)
        return dict(
            c,
            x=x_new,
            r=r_new,
            p=p_new,
            rr=rr_out,
            m_mod=m_mod,
            t=t,
            stop=stop,
            stall=stall,
            residual=res_out,
            trace=trace,
        )

    carry = lax.while_loop(cond_fn, body_fn, carry)

    res = carry["residual"]
    nan = H.has_nan(carry["x"]) | jnp.isnan(res)
    status = jnp.where(
        nan,
        int(Status.NAN_VALUE),
        jnp.where(
            carry["stop"],
            int(Status.STOP),
            jnp.where(
                res <= eps,
                int(Status.CONVERGENCE),
                int(Status.REACHED_MAX_ITERATIONS),
            ),
        ),
    ).astype(jnp.int32)
    if carry["trace"] is not None:
        carry["trace"] = H.record_trace(carry["trace"], carry["t"], res)
    carry["status"] = status
    del carry["stop"]
    del carry["stall"]
    if vec_shape is not None:
        for k in ("x", "r", "p"):
            carry[k] = carry[k].reshape(-1)
    return H.finalize(carry)
