"""Complex-domain Krylov engines: BiCG, BiCG-sym, CGS, BiCGSTAB, TFQMR,
PCG, PBiCG.

References: ``src/lib/clcg.cpp`` (native BiCG/BiCG-sym/CGS/BiCGSTAB/TFQMR)
and ``src/lib/clcg_eigen.cpp:577-801`` (PCG/PBiCG, which exist only in the
Eigen backend).  The float-complex CUDA stack (``clcg_cudaf.cu``) is a
line-for-line dtype copy in the reference; here dtype (complex64/complex128)
is just a parameter.

Inner-product conventions follow the reference exactly:
``dot_u`` = unconjugated sum a_i b_i (``clcg_dot``, lcg_complex.cpp:143-154),
``dot_c`` = conjugated sum conj(a_i) b_i (``clcg_inner``, :156-167).
Stopping metric: the reference squares the squared norm (clcg.cpp:120-121),
so the relative test is ||r||^4 / max(||x||^4, 1) and abs_diff is ||r||^2/n —
see ``harness.complex_residual``.

Shadow residuals: CGS/BiCGSTAB/TFQMR draw a random rbar0 with real parts in
[1, 2) and zero imaginary parts, redrawn while |<rbar0, r0>| < 1e-8
(clcg.cpp:399-403, 556-560, 721-725 with ``clcg_vecrnd(..., (1,0), (2,0))``).
The reference seeds from ``time(0)``; here an explicit PRNG key keeps solves
deterministic (pass ``key=`` to vary).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..types import SolverParams, Status
from . import harness as H

_DEFAULT_KEY = 1234


def _prep(A, b, x0):
    b = jnp.asarray(b)
    if not jnp.issubdtype(b.dtype, jnp.complexfloating):
        b = b.astype(jnp.complex128)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    return A, b, x


def _shadow_residual(rk, key):
    """Draw rbar0 ~ U[1,2) (real, stored complex) and redraw while
    |<rbar0, rk>| < 1e-8, max 8 attempts (clcg.cpp:399-403)."""
    if key is None:
        key = jax.random.PRNGKey(_DEFAULT_KEY)
    rdt = rk.real.dtype

    def draw(key):
        key, sub = jax.random.split(key)
        re = jax.random.uniform(sub, rk.shape, dtype=rdt, minval=1.0, maxval=2.0)
        return key, re.astype(rk.dtype)

    key, rbar0 = draw(key)

    def cond(s):
        key, rbar0, k = s
        return jnp.any(jnp.abs(H.dot_c(rbar0, rk)) < 1e-8) & (k < 8)

    def body(s):
        key, _, k = s
        key, rbar0 = draw(key)
        return (key, rbar0, k + 1)

    _, rbar0, _ = lax.while_loop(cond, body, (key, rbar0, jnp.asarray(0, jnp.int32)))
    return rbar0


def bicg(A, b, x0=None, *, params=SolverParams(), monitor=None, trace_len=0):
    """Jacobi-style BiCG with the conjugate-transpose second sequence.
    Reference: ``clbicg`` clcg.cpp:77-226; the dual product is A^H d2
    (callback mode (MatTranspose, Conjugate), clcg.cpp:188)."""
    A, b, x = _prep(A, b, x0)
    n = H.dim(b)  # global length (psum-aware when sharded)

    Ax = A.mv(x)
    r1k = b - Ax
    r2k = jnp.conj(r1k)
    carry = dict(
        x=x,
        r1k=r1k,
        r2k=r2k,
        d1k=r1k,
        d2k=r2k,
        r1r2=H.dot_c(r2k, r1k),
        rk_sq=H.sq_norm(r1k),
        m_sq=H.sq_norm(x),
        t=jnp.asarray(0, jnp.int32),
        status=H.running_status(),
        residual=jnp.asarray(0.0, b.real.dtype),
        trace=H.init_trace(trace_len, b.real.dtype),
    )

    def residual_fn(c):
        return H.complex_residual(c["rk_sq"], c["m_sq"], n, params.abs_diff)

    def step_fn(c):
        Ad1 = A.mv(c["d1k"])
        Ad1d2 = H.dot_c(c["d2k"], Ad1)            # clcg.cpp:171
        ak = c["r1r2"] / Ad1d2
        x = c["x"] + ak * c["d1k"]
        r1k = c["r1k"] - ak * Ad1
        Ahd2 = A.hmv(c["d2k"])                    # clcg.cpp:188
        r2k = c["r2k"] - jnp.conj(ak) * Ahd2
        r1r2_next = H.dot_c(r2k, r1k)
        betak = r1r2_next / c["r1r2"]
        d1k = r1k + betak * c["d1k"]
        d2k = r2k + jnp.conj(betak) * c["d2k"]
        return dict(
            c,
            x=x,
            r1k=r1k,
            r2k=r2k,
            d1k=d1k,
            d2k=d2k,
            r1r2=r1r2_next,
            rk_sq=H.sq_norm(r1k),
            m_sq=H.sq_norm(x),
        )

    return H.run_loop(
        carry,
        residual_fn=residual_fn,
        step_fn=step_fn,
        x_of=lambda c: c["x"],
        params=params,
        monitor=monitor,
    )


def bicg_sym(A, b, x0=None, *, params=SolverParams(), monitor=None, trace_len=0):
    """BiCG specialised to complex-symmetric A (A = A^T): single sequence
    with unconjugated inner products.  Reference: ``clbicg_symmetric``
    clcg.cpp:228-364 (``clcg_dot`` at :259, :320, :345)."""
    A, b, x = _prep(A, b, x0)
    n = H.dim(b)  # global length (psum-aware when sharded)

    Ax = A.mv(x)
    rk = b - Ax
    carry = dict(
        x=x,
        rk=rk,
        dk=rk,
        rkrk=H.dot_u(rk, rk),
        rk_sq=H.sq_norm(rk),
        m_sq=H.sq_norm(x),
        t=jnp.asarray(0, jnp.int32),
        status=H.running_status(),
        residual=jnp.asarray(0.0, b.real.dtype),
        trace=H.init_trace(trace_len, b.real.dtype),
    )

    def residual_fn(c):
        return H.complex_residual(c["rk_sq"], c["m_sq"], n, params.abs_diff)

    def step_fn(c):
        Adk = A.mv(c["dk"])
        dkAx = H.dot_u(c["dk"], Adk)
        ak = c["rkrk"] / dkAx
        x = c["x"] + ak * c["dk"]
        rk = c["rk"] - ak * Adk
        rkrk2 = H.dot_u(rk, rk)
        betak = rkrk2 / c["rkrk"]
        dk = rk + betak * c["dk"]
        return dict(
            c,
            x=x,
            rk=rk,
            dk=dk,
            rkrk=rkrk2,
            rk_sq=H.sq_norm(rk),
            m_sq=H.sq_norm(x),
        )

    return H.run_loop(
        carry,
        residual_fn=residual_fn,
        step_fn=step_fn,
        x_of=lambda c: c["x"],
        params=params,
        monitor=monitor,
    )


def cgs(A, b, x0=None, *, params=SolverParams(), monitor=None, trace_len=0, key=None):
    """Complex CGS with random shadow residual.  Reference: ``clcgs``
    clcg.cpp:366-522."""
    A, b, x = _prep(A, b, x0)
    n = H.dim(b)  # global length (psum-aware when sharded)

    Ax = A.mv(x)
    rk = b - Ax
    rbar0 = _shadow_residual(rk, key)
    carry = dict(
        x=x,
        rk=rk,
        rbar0=rbar0,
        pk=rk,
        uk=rk,
        qk=jnp.zeros_like(rk),
        rhok=H.dot_c(rbar0, rk),
        rk_sq=H.sq_norm(rk),
        m_sq=H.sq_norm(x),
        t=jnp.asarray(0, jnp.int32),
        status=H.running_status(),
        residual=jnp.asarray(0.0, b.real.dtype),
        trace=H.init_trace(trace_len, b.real.dtype),
    )

    def residual_fn(c):
        return H.complex_residual(c["rk_sq"], c["m_sq"], n, params.abs_diff)

    def step_fn(c):
        Apk = A.mv(c["pk"])
        sigma = H.dot_c(c["rbar0"], Apk)          # clcg.cpp:464
        ak = c["rhok"] / sigma
        qk = c["uk"] - ak * Apk
        wk = c["uk"] + qk
        Awk = A.mv(wk)
        x = c["x"] + ak * wk
        rk = c["rk"] - ak * Awk
        rhok2 = H.dot_c(c["rbar0"], rk)
        betak = rhok2 / c["rhok"]
        uk = rk + betak * qk
        pk = uk + betak * (qk + betak * c["pk"])
        return dict(
            c,
            x=x,
            rk=rk,
            pk=pk,
            uk=uk,
            qk=qk,
            rhok=rhok2,
            rk_sq=H.sq_norm(rk),
            m_sq=H.sq_norm(x),
        )

    return H.run_loop(
        carry,
        residual_fn=residual_fn,
        step_fn=step_fn,
        x_of=lambda c: c["x"],
        params=params,
        monitor=monitor,
    )


def bicgstab(A, b, x0=None, *, params=SolverParams(), monitor=None, trace_len=0, key=None):
    """Complex BiCGSTAB with random shadow residual.  Reference:
    ``clbicgstab`` clcg.cpp:524-679 (native only — the Eigen dispatcher
    rejects it, clcg_eigen.cpp:51-67)."""
    A, b, x = _prep(A, b, x0)
    n = H.dim(b)  # global length (psum-aware when sharded)

    Ax = A.mv(x)
    rk = b - Ax
    rbar0 = _shadow_residual(rk, key)
    carry = dict(
        x=x,
        rk=rk,
        rbar0=rbar0,
        pk=rk,
        Apk=jnp.zeros_like(rk),
        rhok=H.dot_c(rbar0, rk),
        rk_sq=H.sq_norm(rk),
        m_sq=H.sq_norm(x),
        t=jnp.asarray(0, jnp.int32),
        status=H.running_status(),
        residual=jnp.asarray(0.0, b.real.dtype),
        trace=H.init_trace(trace_len, b.real.dtype),
    )

    def residual_fn(c):
        return H.complex_residual(c["rk_sq"], c["m_sq"], n, params.abs_diff)

    def step_fn(c):
        Apk = A.mv(c["pk"])
        sigma = H.dot_c(c["rbar0"], Apk)
        ak = c["rhok"] / sigma
        sk = c["rk"] - ak * Apk
        Ask = A.mv(sk)
        Ass = H.dot_c(Ask, sk)                    # clcg.cpp:631
        AsAs = H.dot_c(Ask, Ask)
        omega = Ass / AsAs
        x = c["x"] + ak * c["pk"] + omega * sk
        rk = sk - omega * Ask
        rhok2 = H.dot_c(c["rbar0"], rk)
        betak = rhok2 * ak / (c["rhok"] * omega)  # clcg.cpp:658
        pk = rk + betak * (c["pk"] - omega * Apk)
        return dict(
            c,
            x=x,
            rk=rk,
            pk=pk,
            Apk=Apk,
            rhok=rhok2,
            rk_sq=H.sq_norm(rk),
            m_sq=H.sq_norm(x),
        )

    return H.run_loop(
        carry,
        residual_fn=residual_fn,
        step_fn=step_fn,
        x_of=lambda c: c["x"],
        params=params,
        monitor=monitor,
    )


def tfqmr(A, b, x0=None, *, params=SolverParams(), monitor=None, trace_len=0, key=None):
    """Transpose-free QMR.  Reference: ``cltfqmr`` clcg.cpp:681-882.

    Reproduced quirks: tau/omega start at ||r0||^2 (clcg.cpp:727-728 — the
    module of the already-squared inner product); the j=1,2 half-step
    convergence checks read the *previous* outer iteration's residual
    (rk_square is only refreshed after the half-step pair, clcg.cpp:853-854).
    The half steps and mid-loop exits require a custom loop body.
    """
    A, b, x = _prep(A, b, x0)
    n = H.dim(b)  # global length (psum-aware when sharded)
    max_iter = params.effective_max_iterations()
    eps = params.epsilon
    rdt = b.real.dtype
    is_batched = H.batch_active()

    Ax = A.mv(x)
    rk = b - Ax
    rbar0 = _shadow_residual(rk, key)
    rk_inner = H.sq_norm(rk)  # |<r,r>| == ||r||^2 (real; (nrhs,1) batched)

    carry = dict(
        x=x,
        rk=rk,
        rbar0=rbar0,
        pk=rk,
        uk=rk,
        qk=jnp.zeros_like(rk),
        dk=jnp.zeros_like(rk),
        rho=H.dot_c(rbar0, rk),
        rk_mod=rk_inner,            # module of <r,r>, carried across iters
        rk_sq=rk_inner * rk_inner,  # reference rk_square = ||r||^4
        m_sq4=jnp.maximum(H.sq_norm(x) ** 2, 1.0),
        # Scalars shaped like the reductions so batched solves get a
        # per-system copy ((nrhs, 1)) and plain solves stay 0-D.
        theta=jnp.zeros(rk_inner.shape, rdt),
        tao=rk_inner,
        eta=jnp.zeros(rk_inner.shape, b.dtype),
        t=jnp.zeros(rk_inner.shape, jnp.int32),
        status=jnp.full(rk_inner.shape, int(Status.RUNNING), jnp.int32),
        residual=jnp.zeros(rk_inner.shape, rdt),
        trace=H.init_trace(trace_len, rdt),
    )

    # Initial ALREADY_OPTIMIZED probe (clcg.cpp:738-755).
    def _init_res(c):
        if params.abs_diff:
            return jnp.sqrt(c["rk_sq"]) / n
        return c["rk_sq"] / c["m_sq4"]

    def cond_fn(c):
        alive = (c["status"] == int(Status.RUNNING)) & (c["t"] <= max_iter)
        return jnp.any(alive) if is_batched else alive

    def _half_verdict(c, x, t, res):
        """Exit verdict at one half step (monitor -> eps -> max-iter)."""
        stop = (
            monitor(x, res, t) if monitor is not None else jnp.asarray(False)
        )
        return jnp.where(
            stop,
            int(Status.STOP),
            jnp.where(
                res <= eps,
                int(Status.CONVERGENCE),
                jnp.where(
                    (params.max_iterations > 0) & (t + 1 > params.max_iterations),
                    int(Status.REACHED_MAX_ITERATIONS),
                    int(Status.RUNNING),
                ),
            ),
        ).astype(jnp.int32)

    def body_fn(c):
        """One outer iteration = two half steps + recurrence tail, all
        straight-line: half-step exits become jnp.where selects (a branch
        per half step would serialize extra XLA regions per iteration)."""
        vk = A.mv(c["pk"])
        sigma = H.dot_c(c["rbar0"], vk)
        alpha = c["rho"] / sigma
        qk = c["uk"] - alpha * vk
        uqk = c["uk"] + qk
        Auq = A.mv(uqk)
        rk = c["rk"] - alpha * Auq
        rk_mod2 = H.sq_norm(rk)
        # rk/qk are committed before the checks, like the reference's
        # in-place array updates (clcg.cpp:766-780); frozen systems
        # (batched mode) keep theirs.
        frozen_ok = c["status"] == int(Status.RUNNING)
        c = dict(
            c,
            qk=jnp.where(frozen_ok, qk, c["qk"]),
            rk=jnp.where(frozen_ok, rk, c["rk"]),
        )

        # Both half-step checks read the SAME stale residual — rk_square is
        # only refreshed after the pair (clcg.cpp:784-785, 853-854).
        res = _init_res(c)

        def half_update(c, j, alive):
            sign = c["theta"] * c["theta"] * (c["eta"] / alpha)
            if j == 1:
                omega = jnp.sqrt(c["rk_mod"] * rk_mod2)       # clcg.cpp:812
                dk_new = c["uk"] + sign * c["dk"]
            else:
                omega = rk_mod2                               # clcg.cpp:822
                dk_new = c["qk"] + sign * c["dk"]
            theta = omega / c["tao"]
            tao = omega / jnp.sqrt(1.0 + theta * theta)
            eta = (1.0 / (1.0 + theta * theta)) * alpha
            x = c["x"] + eta * dk_new
            sel = lambda new, old: jnp.where(alive, new, old)
            return dict(
                c,
                x=sel(x, c["x"]),
                dk=sel(dk_new, c["dk"]),
                theta=sel(theta, c["theta"]),
                tao=sel(tao, c["tao"]),
                eta=sel(eta, c["eta"]),
                # ||x||^4 refreshes per half step (clcg.cpp: the m module
                # is recomputed after each half update).
                m_sq4=sel(jnp.maximum(H.sq_norm(x) ** 2, 1.0), c["m_sq4"]),
                t=c["t"] + alive.astype(jnp.int32),
            )

        # Half step 1.  Systems already finished in an earlier outer
        # iteration (batched mode) stay frozen and keep their status.
        was_running = c["status"] == int(Status.RUNNING)
        if c["trace"] is not None:
            c["trace"] = H.record_trace(c["trace"], c["t"], res)
        v1 = _half_verdict(c, c["x"], c["t"], res)
        a1 = (v1 == int(Status.RUNNING)) & was_running
        c = half_update(c, 1, a1)

        # Half step 2 (skipped entirely when half 1 exited).  Its check
        # reads the same stale rk_sq but half 1's refreshed ||x||^4.
        res2 = _init_res(c)
        res = jnp.where(a1, res2, res)
        if c["trace"] is not None:
            c["trace"] = jnp.where(
                a1, H.record_trace(c["trace"], c["t"], res), c["trace"]
            )
        v2 = _half_verdict(c, c["x"], c["t"], res)
        a2 = a1 & (v2 == int(Status.RUNNING))
        c = half_update(c, 2, a2)

        # Recurrence tail, committed only while still running.
        rho2 = H.dot_c(c["rbar0"], c["rk"])
        betak = rho2 / c["rho"]
        uk = c["rk"] + betak * c["qk"]
        pk = uk + betak * (c["qk"] + betak * c["pk"])
        sel = lambda new, old: jnp.where(a2, new, old)
        c = dict(
            c,
            uk=sel(uk, c["uk"]),
            pk=sel(pk, c["pk"]),
            rho=sel(rho2, c["rho"]),
            rk_mod=sel(rk_mod2, c["rk_mod"]),
            rk_sq=sel(rk_mod2 * rk_mod2, c["rk_sq"]),
            residual=jnp.where(was_running, res, c["residual"]),
        )

        # Exit status: the first half step's verdict wins, then the second;
        # NaN anywhere in the recurrence poisons rk_mod2 -> NAN_VALUE
        # (clcg.cpp's per-step NaN scan, done via propagation).  Systems
        # that had already exited keep their recorded status.
        status = jnp.where(
            ~a1, v1, jnp.where(~a2, v2, int(Status.RUNNING))
        ).astype(jnp.int32)
        status = jnp.where(
            jnp.isnan(rk_mod2) & (status == int(Status.RUNNING)),
            int(Status.NAN_VALUE),
            status,
        ).astype(jnp.int32)
        status = jnp.where(was_running, status, c["status"]).astype(jnp.int32)
        return dict(c, status=status)

    # ALREADY_OPTIMIZED short-circuit before entering the loop.
    init_res = _init_res(carry)
    carry["residual"] = init_res
    carry["status"] = jnp.where(
        init_res <= eps, int(Status.CONVERGENCE), int(Status.RUNNING)
    ).astype(jnp.int32)

    carry = lax.while_loop(cond_fn, body_fn, carry)
    carry["status"] = jnp.where(
        carry["status"] == int(Status.RUNNING),
        int(Status.REACHED_MAX_ITERATIONS),
        carry["status"],
    ).astype(jnp.int32)
    if is_batched:
        carry = dict(
            carry,
            status=carry["status"].reshape(-1),
            t=carry["t"].reshape(-1),
            residual=carry["residual"].reshape(-1),
        )
    return H.finalize(carry)


def pcg(A, b, x0=None, *, M, params=SolverParams(), monitor=None, trace_len=0):
    """Complex PCG for complex-symmetric systems (unconjugated inner
    products).  Reference: ``clpcg`` clcg_eigen.cpp:577-683; the key line is
    ``d_new = rk.conjugate().dot(zk)`` (:598) — Eigen's conjugated .dot on a
    pre-conjugated vector, i.e. the plain unconjugated sum rk_i zk_i."""
    A, b, x = _prep(A, b, x0)
    n = H.dim(b)  # global length (psum-aware when sharded)
    apply_M = M.mv if hasattr(M, "mv") else M

    Ax = A.mv(x)
    rk = b - Ax
    dk = apply_M(rk)
    carry = dict(
        x=x,
        rk=rk,
        dk=dk,
        d_new=H.dot_u(rk, dk),
        rk_sq=H.sq_norm(rk),
        m_sq=H.sq_norm(x),
        t=jnp.asarray(0, jnp.int32),
        status=H.running_status(),
        residual=jnp.asarray(0.0, b.real.dtype),
        trace=H.init_trace(trace_len, b.real.dtype),
    )

    def residual_fn(c):
        return H.complex_residual(c["rk_sq"], c["m_sq"], n, params.abs_diff)

    def step_fn(c):
        Adk = A.mv(c["dk"])
        dkAx = H.dot_u(c["dk"], Adk)              # clcg_eigen.cpp:653
        ak = c["d_new"] / dkAx
        x = c["x"] + ak * c["dk"]
        rk = c["rk"] - ak * Adk
        sk = apply_M(rk)
        d_new = H.dot_u(rk, sk)                   # clcg_eigen.cpp:667
        betak = d_new / c["d_new"]
        dk = sk + betak * c["dk"]
        return dict(
            c,
            x=x,
            rk=rk,
            dk=dk,
            d_new=d_new,
            rk_sq=H.sq_norm(rk),
            m_sq=H.sq_norm(x),
        )

    return H.run_loop(
        carry,
        residual_fn=residual_fn,
        step_fn=step_fn,
        x_of=lambda c: c["x"],
        params=params,
        monitor=monitor,
    )


def pbicg(A, b, x0=None, *, M, params=SolverParams(), monitor=None, trace_len=0):
    """Preconditioned BiCG with an explicit shadow sequence.  Reference:
    ``clpbicg`` clcg_eigen.cpp:685-801; the dual product is conj(A) psk
    (callback mode (MatNormal, Conjugate), :765)."""
    A, b, x = _prep(A, b, x0)
    n = H.dim(b)  # global length (psum-aware when sharded)
    apply_M = M.mv if hasattr(M, "mv") else M

    Ax = A.mv(x)
    rk = b - Ax
    zk = apply_M(rk)
    pk = zk
    rsk = jnp.conj(rk)
    psk = jnp.conj(pk)
    carry = dict(
        x=x,
        rk=rk,
        rsk=rsk,
        pk=pk,
        psk=psk,
        rhok=H.dot_c(rsk, zk),                    # clcg_eigen.cpp:710
        rk_sq=H.sq_norm(rk),
        m_sq=H.sq_norm(x),
        t=jnp.asarray(0, jnp.int32),
        status=H.running_status(),
        residual=jnp.asarray(0.0, b.real.dtype),
        trace=H.init_trace(trace_len, b.real.dtype),
    )

    def residual_fn(c):
        return H.complex_residual(c["rk_sq"], c["m_sq"], n, params.abs_diff)

    def step_fn(c):
        Apk = A.mv(c["pk"])
        Aspsk = A.cmv(c["psk"])                   # clcg_eigen.cpp:765
        pkAx = H.dot_c(c["psk"], Apk)             # clcg_eigen.cpp:767
        ak = c["rhok"] / pkAx
        x = c["x"] + ak * c["pk"]
        rsk = jnp.conj(c["rk"]) - jnp.conj(ak) * Aspsk
        rk = c["rk"] - ak * Apk
        zk = apply_M(rk)
        rhok2 = H.dot_c(rsk, zk)
        betak = rhok2 / c["rhok"]
        pk = zk + betak * c["pk"]
        psk = jnp.conj(zk) + jnp.conj(betak) * c["psk"]
        return dict(
            c,
            x=x,
            rk=rk,
            rsk=rsk,
            pk=pk,
            psk=psk,
            rhok=rhok2,
            rk_sq=H.sq_norm(rk),
            m_sq=H.sq_norm(x),
        )

    return H.run_loop(
        carry,
        residual_fn=residual_fn,
        step_fn=step_fn,
        x_of=lambda c: c["x"],
        params=params,
        monitor=monitor,
    )
