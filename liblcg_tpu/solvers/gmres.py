"""Restarted GMRES(m) — dtype-polymorphic (real and complex).

Beyond the reference's method set (its nonsymmetric story is the
BiCG/CGS/BiCGSTAB family); included because GMRES is the standard
nonsymmetric Krylov workhorse a production solver library is expected to
provide.  TPU-first shape: the Arnoldi orthogonalization is classical
Gram-Schmidt applied twice (CGS2 — the standard stability fix that turns
the inner products into two (m+1, n) x (n,) matmuls on the MXU instead of
j sequential dots), the basis lives in a fixed (m+1, n) carry, and each
restart cycle is one straight-line step of the shared harness loop.

``t`` counts restart *cycles*; each cycle performs up to ``restart``
operator products.  The stopping metric is the reference's rule
(lcg.cpp:186-209) evaluated on the true residual recomputed at each cycle
boundary — so epsilon parity with the other engines holds.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..types import SolverParams
from . import harness as H


def gmres(A, b, x0=None, *, restart: int = 32, M=None,
          params=SolverParams(), monitor=None, trace_len=0):
    """Solve ``A x = b`` with restarted GMRES(m), optionally right-
    preconditioned (``M`` applies M^{-1}; solution returned in the
    original variables)."""
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    n = H.dim(b)
    m = int(restart)
    apply_M = (M.mv if hasattr(M, "mv") else M) if M is not None else None

    r0 = b - A.mv(x)
    carry = dict(
        x=x,
        rk_mod=H.sq_norm(r0),
        m_mod=jnp.maximum(H.sq_norm(x), 1.0),
        t=jnp.asarray(0, jnp.int32),
        status=H.running_status(),
        residual=jnp.asarray(0.0, b.real.dtype),
        trace=H.init_trace(trace_len, b.real.dtype),
    )

    def residual_fn(c):
        return H.real_residual(c["rk_mod"], c["m_mod"], n, params.abs_diff)

    def cycle(c):
        """One GMRES(m) restart cycle."""
        x = c["x"]
        r = b - A.mv(x)
        beta = jnp.sqrt(H.sq_norm(r)).astype(b.dtype)
        V0 = jnp.zeros((m + 1,) + b.shape, b.dtype)
        V0 = V0.at[0].set(r / beta)
        Hm0 = jnp.zeros((m + 1, m), b.dtype)

        def arnoldi(j, s):
            V, Hm = s
            vj = V[j]
            z = apply_M(vj) if apply_M is not None else vj
            w = A.mv(z)
            # CGS2: two rounds of classical Gram-Schmidt, each one matmul.
            h1 = V.conj() @ w if jnp.iscomplexobj(w) else V @ w
            h1 = _mesh_sum(h1)
            w = w - V.T @ h1
            h2 = V.conj() @ w if jnp.iscomplexobj(w) else V @ w
            h2 = _mesh_sum(h2)
            w = w - V.T @ h2
            h = h1 + h2
            wnorm = jnp.sqrt(H.sq_norm(w)).astype(b.dtype)
            # Guard lucky breakdown (wnorm == 0): keep a zero basis vector;
            # the least-squares solve ignores the dead column.
            vnext = jnp.where(wnorm == 0, w, w / jnp.where(wnorm == 0, 1, wnorm))
            V = V.at[j + 1].set(vnext)
            h = h.at[j + 1].add(wnorm)
            Hm = Hm.at[:, j].set(h)
            return V, Hm

        V, Hm = lax.fori_loop(0, m, arnoldi, (V0, Hm0))

        # Least squares min ||beta e1 - Hm y|| via the normal equations of
        # the small (m+1, m) system (m is tiny; solved on device).
        e1 = jnp.zeros((m + 1,), b.dtype).at[0].set(beta)
        G = Hm.conj().T @ Hm + 1e-30 * jnp.eye(m, dtype=b.dtype)
        y = jnp.linalg.solve(G, Hm.conj().T @ e1)
        z = V[:m].T @ y
        if apply_M is not None:
            z = apply_M(z)
        x = x + z
        rk = b - A.mv(x)
        return dict(
            c, x=x,
            rk_mod=H.sq_norm(rk),
            m_mod=jnp.maximum(H.sq_norm(x), 1.0),
        )

    def _mesh_sum(h):
        ax = H.dist_axis()
        return lax.psum(h, ax) if ax is not None else h

    return H.run_loop(
        carry,
        residual_fn=residual_fn,
        step_fn=cycle,
        x_of=lambda c: c["x"],
        params=params,
        monitor=monitor,
    )
