"""Level-scheduled sparse triangular solves on device.

Sparse triangular substitution is the hard TPU kernel in this library: the
reference runs it as a sequential row scan on host/GPU
(``preconditioner.cpp:309-366`` native COO; ``preconditioner_eigen.cpp:
925-1047`` Eigen; cusparse csrsv2 in the CUDA samples).  A row-by-row scan
cannot map to a vector unit, but rows whose dependencies are satisfied can
solve *in parallel*: classic level scheduling.

Host side (once, numpy): topologically layer the rows of L (or U) into
levels; pack each level's rows and their off-diagonal entries into padded
ELL blocks.  Device side: a ``lax.fori_loop`` over levels, each level one
gather + multiply-reduce + masked scatter — static shapes, no data-dependent
control flow, XLA-fusible.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.tree_util import register_pytree_node

from ..operators import LinearOperator


class LevelSchedule(NamedTuple):
    """Device-ready level-scheduled triangular factor.

    Shapes: ``level_rows`` (n_levels, rows_per_level) padded with ``n``
    (out-of-range; scatters drop it), ``ell_cols``/``ell_vals``
    (n_levels, rows_per_level, k) padded with zeros, ``inv_diag``
    (n_levels, rows_per_level).
    """

    level_rows: jnp.ndarray
    ell_cols: jnp.ndarray
    ell_vals: jnp.ndarray
    inv_diag: jnp.ndarray
    n: int

    @property
    def n_levels(self) -> int:
        return self.level_rows.shape[0]


def level_schedule(
    n: int, rows, cols, vals, *, lower: bool = True
) -> LevelSchedule:
    """Build a LevelSchedule from COO triplets of a triangular matrix.

    ``lower=True`` expects entries with row >= col (forward substitution);
    ``lower=False`` expects row <= col (backward substitution).  The diagonal
    must be fully present and nonzero — the reference enforces the same via
    ``lcg_full_rank_coo`` (preconditioner.cpp:368-381).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)

    diag_mask = rows == cols
    diag = np.zeros(n, dtype=vals.dtype)
    diag[rows[diag_mask]] = vals[diag_mask]
    if np.any(diag == 0):
        missing = int(np.sum(diag == 0))
        raise ValueError(
            f"triangular factor is rank deficient: {missing} zero/missing "
            "diagonal entries"
        )

    o_rows = rows[~diag_mask]
    o_cols = cols[~diag_mask]
    o_vals = vals[~diag_mask]

    # Dependency depth per row: level[i] = 1 + max(level[j]) over off-diag
    # deps j.  Process rows in substitution order so deps are resolved.
    level = np.zeros(n, dtype=np.int64)
    order = np.argsort(o_rows, kind="stable")
    o_rows_s, o_cols_s = o_rows[order], o_cols[order]
    row_order = range(n) if lower else range(n - 1, -1, -1)
    # Group off-diag entries by row for the host pass.
    starts = np.searchsorted(o_rows_s, np.arange(n + 1))
    for i in row_order:
        deps = o_cols_s[starts[i] : starts[i + 1]]
        if len(deps):
            level[i] = level[deps].max() + 1

    n_levels = int(level.max()) + 1 if n else 1
    counts = np.bincount(level, minlength=n_levels)
    rows_per_level = int(counts.max())

    level_rows = np.full((n_levels, rows_per_level), n, dtype=np.int32)
    slot_of_row = np.zeros(n, dtype=np.int64)
    fill = np.zeros(n_levels, dtype=np.int64)
    for i in range(n):
        l = level[i]
        level_rows[l, fill[l]] = i
        slot_of_row[i] = fill[l]
        fill[l] += 1

    k = int(np.bincount(o_rows, minlength=n).max()) if len(o_rows) else 0
    k = max(k, 1)
    ell_cols = np.zeros((n_levels, rows_per_level, k), dtype=np.int32)
    ell_vals = np.zeros((n_levels, rows_per_level, k), dtype=vals.dtype)
    pos = np.zeros(n, dtype=np.int64)
    for idx in range(len(o_rows)):
        i = o_rows[idx]
        l = level[i]
        s = slot_of_row[i]
        p = pos[i]
        ell_cols[l, s, p] = o_cols[idx]
        ell_vals[l, s, p] = o_vals[idx]
        pos[i] += 1

    inv_diag = np.zeros((n_levels, rows_per_level), dtype=vals.dtype)
    valid = level_rows < n
    inv_diag[valid] = 1.0 / diag[level_rows[valid]]

    return LevelSchedule(
        level_rows=jnp.asarray(level_rows),
        ell_cols=jnp.asarray(ell_cols),
        ell_vals=jnp.asarray(ell_vals),
        inv_diag=jnp.asarray(inv_diag),
        n=n,
    )


def triangular_solve(sched: LevelSchedule, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``T x = b`` for the level-scheduled triangular factor T."""
    n = sched.n
    x0 = jnp.zeros(b.shape, dtype=jnp.promote_types(b.dtype, sched.ell_vals.dtype))

    def body(l, x):
        rows_l = sched.level_rows[l]          # (R,) padded with n
        cols_l = sched.ell_cols[l]            # (R, k)
        vals_l = sched.ell_vals[l]
        s = jnp.sum(vals_l * jnp.take(x, cols_l, axis=0), axis=1)
        b_l = jnp.take(b, rows_l, axis=0, mode="fill", fill_value=0)
        x_l = (b_l - s) * sched.inv_diag[l]
        return x.at[rows_l].set(x_l, mode="drop")

    return lax.fori_loop(0, sched.n_levels, body, x0)


def _sched_flatten(s: LevelSchedule):
    return (s.level_rows, s.ell_cols, s.ell_vals, s.inv_diag), (s.n,)


def _sched_unflatten(aux, children):
    return LevelSchedule(*children, n=aux[0])


# NamedTuple is already a pytree; no extra registration needed.


class TriangularPreconditioner(LinearOperator):
    """M^{-1} x = U^{-1} (D?) L^{-1} x from level-scheduled factors.

    The reference applies IC/ILU preconditioners as two user-side triangular
    solves inside the ``MxProduct`` callback (sample7.cpp:107-108,
    sample8.cu:112-118); this operator packages the same application for the
    solve loop.  ``mid_scale`` multiplies between the two solves (used by
    SSOR; identity for IC/ILU).
    """

    def __init__(
        self,
        lower: LevelSchedule,
        upper: LevelSchedule,
        mid_scale: Optional[np.ndarray] = None,
    ):
        self.lower = lower
        self.upper = upper
        self.mid_scale = None if mid_scale is None else jnp.asarray(mid_scale)
        n = lower.n
        self.shape = (n, n)
        self.dtype = lower.ell_vals.dtype

    def mv(self, x):
        y = triangular_solve(self.lower, x)
        if self.mid_scale is not None:
            y = y * self.mid_scale
        return triangular_solve(self.upper, y)


def _tri_flatten(op):
    return (op.lower, op.upper, op.mid_scale), None


def _tri_unflatten(_, children):
    obj = object.__new__(TriangularPreconditioner)
    obj.lower, obj.upper, obj.mid_scale = children
    try:
        n = obj.lower.n
        obj.shape = (n, n)
        obj.dtype = obj.lower.ell_vals.dtype
    except (AttributeError, TypeError):
        obj.shape = None
        obj.dtype = None
    return obj


register_pytree_node(TriangularPreconditioner, _tri_flatten, _tri_unflatten)
