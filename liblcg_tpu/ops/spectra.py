"""Spectral bound estimation for Chebyshev iteration.

Chebyshev needs an interval [lmin, lmax] enclosing the spectrum.  Two
estimators:

- :func:`gershgorin_bounds` — closed-form from the Gershgorin circle
  theorem (diag +- sum of off-diagonal magnitudes per row); conservative,
  free, exact storage-format-aware row sums for the concrete operators.
- :func:`power_bound` — a few power iterations for a sharper lmax (device
  compute, one compile).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def gershgorin_bounds(A) -> Tuple[float, float]:
    """(lmin, lmax) from Gershgorin circles.  Supports BandedOperator,
    SparseOperator and DenseOperator (anything exposing its values)."""
    from ..operators import BandedOperator, DenseOperator, SparseOperator
    from ..parallel.stencil import (
        Laplacian3DOperator,
        ShardedLaplacian3D,
        ShardedStencil3D,
        Stencil3DOperator,
    )

    if isinstance(A, (Laplacian3DOperator, ShardedLaplacian3D)):
        # 7-point Laplacian rows: diag 6, off-diagonal sum <= 6.
        return 0.0, 12.0
    if isinstance(A, (Stencil3DOperator, ShardedStencil3D)):
        diag = np.asarray(A.c0)
        off = sum(
            np.abs(np.asarray(getattr(A, f)))
            for f in ("cxm", "cxp", "cym", "cyp", "czm", "czp")
        )
        dr = np.real(diag)
        return float(np.min(dr - off)), float(np.max(dr + off))
    if isinstance(A, BandedOperator):
        vals = np.asarray(A.diag_vals)          # (n_diags, n)
        diag = (
            vals[A.offsets.index(0)]
            if 0 in A.offsets
            else np.zeros(A.shape[0], vals.dtype)
        )
        off = np.sum(np.abs(vals), axis=0) - np.abs(diag)
    elif hasattr(A, "dia_vals"):                # ShardedBandedOperator
        vals = np.asarray(A.dia_vals)           # (n_padded, n_diags)
        diag = np.asarray(A.diagonal())
        off = np.sum(np.abs(vals), axis=1) - np.abs(diag)
    elif isinstance(A, SparseOperator) or hasattr(A, "ell_vals"):
        diag = np.asarray(A.diagonal())
        off = np.sum(np.abs(np.asarray(A.ell_vals)), axis=1)[: len(diag)] - np.abs(diag)
    elif hasattr(A, "off_rows"):                # ScatteredOperator
        diag = np.asarray(A.diag)
        off = np.zeros(len(diag))
        np.add.at(off, np.asarray(A.off_rows),
                  np.abs(np.asarray(A.off_vals)))
    elif isinstance(A, DenseOperator) or hasattr(A, "A"):
        M = np.asarray(A.A if hasattr(A, "A") else A)
        diag = np.diagonal(M)
        off = np.sum(np.abs(M), axis=1) - np.abs(diag)
    else:
        raise TypeError(
            f"gershgorin_bounds: unsupported operator {type(A).__name__}; "
            "pass explicit lmin/lmax or use power_bound"
        )
    dr = np.real(diag)
    return float(np.min(dr - off)), float(np.max(dr + off))


def lanczos_bounds(A, n_iter: int = 30, key=None,
                   safety: float = 0.05) -> Tuple[float, float]:
    """(lmin, lmax) estimates from ``n_iter`` Lanczos steps — much sharper
    than Gershgorin for Chebyshev intervals (Ritz values converge to the
    extreme eigenvalues first).  ``safety`` widens the interval by that
    fraction of its width on each side, since Ritz values lie inside the
    true spectrum."""
    n = A.shape[1]
    if key is None:
        key = jax.random.PRNGKey(11)
    v0 = jax.random.normal(key, (n,), dtype=A.dtype)
    v0 = v0 / jnp.linalg.norm(v0)
    k = min(int(n_iter), n)

    alphas = jnp.zeros((k,), A.dtype)
    betas = jnp.zeros((k,), A.dtype)

    def body(j, s):
        v_prev, v, beta, alphas, betas = s
        w = A.mv(v) - beta * v_prev
        alpha = jnp.vdot(v, w).real.astype(A.dtype)
        w = w - alpha * v
        beta_new = jnp.linalg.norm(w).astype(A.dtype)
        v_new = w / jnp.where(beta_new == 0, 1, beta_new)
        return (v, v_new, beta_new,
                alphas.at[j].set(alpha), betas.at[j].set(beta_new))

    _, _, _, alphas, betas = jax.lax.fori_loop(
        0, k, body, (jnp.zeros_like(v0), v0, jnp.asarray(0.0, A.dtype),
                     alphas, betas)
    )
    T = (jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1))
    ritz = jnp.linalg.eigvalsh(T)
    lo, hi = float(ritz[0]), float(ritz[-1])
    width = max(hi - lo, 1e-12)
    return lo - safety * width, hi + safety * width


def power_bound(A, n_iter: int = 20, key=None) -> float:
    """Estimate lmax = ||A||_2 by power iteration (SPD assumed)."""
    n = A.shape[1]
    if key is None:
        key = jax.random.PRNGKey(7)
    v0 = jax.random.normal(key, (n,), dtype=A.dtype)

    def body(i, v):
        w = A.mv(v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, n_iter, body, v0 / jnp.linalg.norm(v0))
    lam = jnp.vdot(v, A.mv(v)).real / jnp.vdot(v, v).real
    # 5% headroom: Chebyshev diverges if the true lmax falls outside.
    return float(lam) * 1.05
