"""Block-Jacobi (non-overlapping additive Schwarz) preconditioning for
sharded solves.

Plain Jacobi is the only preconditioner that trivially shards; the
standard production preconditioner for row-partitioned Krylov solves is
block-Jacobi: drop the couplings between row blocks, factorize each
diagonal block independently (incomplete Cholesky here — host/native C++,
like all factorizations in this framework), and apply each shard's own
triangular solves locally — zero communication per application.

Sharding mechanics: each block's level-scheduled factors have different
shapes, so they are padded to common dimensions and stacked with a leading
``n_devices`` axis.  Inside ``shard_map`` that axis is partitioned
(``P(axis)``), so every device holds exactly its own block's factors and
``mv`` squeezes the leading length-1 axis.  Padding entries are inert by
construction (sentinel rows drop on scatter; zero values).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.tree_util import register_pytree_node

from ..operators import LinearOperator
from ..precond.incomplete import incomplete_cholesky_coo
from ..precond.triangular import LevelSchedule, level_schedule, triangular_solve


def _pad_schedule(s: LevelSchedule, L: int, R: int, K: int) -> LevelSchedule:
    """Pad a LevelSchedule to (L levels, R rows/level, K entries/row)."""
    lr = np.full((L, R), s.n, dtype=np.int32)
    lr[: s.level_rows.shape[0], : s.level_rows.shape[1]] = np.asarray(s.level_rows)
    ec = np.zeros((L, R, K), dtype=np.int32)
    ev = np.zeros((L, R, K), dtype=np.asarray(s.ell_vals).dtype)
    sl = np.asarray(s.ell_cols).shape
    ec[: sl[0], : sl[1], : sl[2]] = np.asarray(s.ell_cols)
    ev[: sl[0], : sl[1], : sl[2]] = np.asarray(s.ell_vals)
    iv = np.zeros((L, R), dtype=np.asarray(s.inv_diag).dtype)
    iv[: s.inv_diag.shape[0], : s.inv_diag.shape[1]] = np.asarray(s.inv_diag)
    return LevelSchedule(
        level_rows=jnp.asarray(lr), ell_cols=jnp.asarray(ec),
        ell_vals=jnp.asarray(ev), inv_diag=jnp.asarray(iv), n=s.n,
    )


class BlockJacobiPreconditioner(LinearOperator):
    """Per-shard IC preconditioner: M^{-1} = blockdiag(L_d L_d^T)^{-1}.

    Build with :meth:`from_coo` (host, once).  Apply inside ``shard_map``:
    the stacked factor leaves carry a leading ``n_devices`` axis that
    ``solve_sharded`` partitions, so each device runs its own block's
    level-scheduled triangular solves with no communication.
    """

    def __init__(self, lower: LevelSchedule, upper: LevelSchedule,
                 n_devices: int, n_local: int, shift: float):
        self.lower = lower          # leaves (D, L, R, k) / (D, L, R)
        self.upper = upper
        self.n_devices = int(n_devices)
        self.n_local = int(n_local)
        self.shift = float(shift)
        n = n_devices * n_local
        self.shape = (n, n)
        self.dtype = lower.ell_vals.dtype

    @classmethod
    def from_coo(cls, n: int, rows, cols, vals, *, n_devices: int,
                 fill: int = 0, shift: float = 0.0):
        """Factorize each diagonal block of the row-partitioned matrix.

        ``shift`` adds ``shift * diag`` before factorizing — the standard
        guard when discarding off-block couplings makes a block lose
        diagonal dominance (IC breakdown).
        """
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)
        n_local = -(-n // n_devices)
        lowers, uppers = [], []
        for d in range(n_devices):
            r0, r1 = d * n_local, min((d + 1) * n_local, n)
            keep = (rows >= r0) & (rows < r1) & (cols >= r0) & (cols < r1)
            br = rows[keep] - r0
            bc = cols[keep] - r0
            bv = vals[keep].copy()
            if shift:
                dm = br == bc
                bv[dm] = bv[dm] * (1.0 + shift)
            # Identity rows for padding / empty tails keep the block solvable.
            present = np.zeros(n_local, dtype=bool)
            present[br[br == bc]] = True
            missing = np.nonzero(~present)[0]
            if len(missing):
                br = np.concatenate([br, missing])
                bc = np.concatenate([bc, missing])
                bv = np.concatenate([bv, np.ones(len(missing), dtype=bv.dtype)])

            fac = incomplete_cholesky_coo(n_local, br, bc, bv, fill=fill)
            lowers.append(level_schedule(n_local, fac.l_rows, fac.l_cols,
                                         fac.l_vals, lower=True))
            uppers.append(level_schedule(n_local, fac.u_rows, fac.u_cols,
                                         fac.u_vals, lower=False))

        def stack(scheds):
            L = max(s.level_rows.shape[0] for s in scheds)
            R = max(s.level_rows.shape[1] for s in scheds)
            K = max(s.ell_cols.shape[2] for s in scheds)
            padded = [_pad_schedule(s, L, R, K) for s in scheds]
            return LevelSchedule(
                level_rows=jnp.stack([p.level_rows for p in padded]),
                ell_cols=jnp.stack([p.ell_cols for p in padded]),
                ell_vals=jnp.stack([p.ell_vals for p in padded]),
                inv_diag=jnp.stack([p.inv_diag for p in padded]),
                n=n_local,
            )

        return cls(stack(lowers), stack(uppers), n_devices, n_local, shift)

    @classmethod
    def from_operator(cls, A, **kw):
        """Build from a sharded operator exposing COO-reconstructible data
        (``ShardedBandedOperator``)."""
        if hasattr(A, "dia_vals"):
            vals = np.asarray(A.dia_vals)       # (n_padded, n_diags)
            n_padded = vals.shape[0]
            rows_l, cols_l, vals_l = [], [], []
            for d, o in enumerate(A.offsets):
                r = np.arange(max(0, -o), min(n_padded, n_padded - o))
                v = vals[r, d]
                keep = v != 0
                rows_l.append(r[keep])
                cols_l.append((r + o)[keep])
                vals_l.append(v[keep])
            return cls.from_coo(
                n_padded, np.concatenate(rows_l), np.concatenate(cols_l),
                np.concatenate(vals_l), n_devices=A.n_devices, **kw,
            )
        raise TypeError(
            "from_operator supports ShardedBandedOperator; build from COO "
            "triplets with from_coo for other formats"
        )

    def _local(self, sched: LevelSchedule) -> LevelSchedule:
        """Strip the (sharded-away) leading axis inside shard_map."""
        return LevelSchedule(
            level_rows=sched.level_rows[0],
            ell_cols=sched.ell_cols[0],
            ell_vals=sched.ell_vals[0],
            inv_diag=sched.inv_diag[0],
            n=self.n_local,
        )

    def mv(self, r):
        y = triangular_solve(self._local(self.lower), r)
        return triangular_solve(self._local(self.upper), y)


def _bj_flatten(op):
    return (op.lower, op.upper), (op.n_devices, op.n_local, op.shift)


def _bj_unflatten(aux, children):
    obj = object.__new__(BlockJacobiPreconditioner)
    obj.lower, obj.upper = children
    obj.n_devices, obj.n_local, obj.shift = aux
    n = obj.n_devices * obj.n_local
    obj.shape = (n, n)
    try:
        obj.dtype = obj.lower.ell_vals.dtype
    except AttributeError:
        obj.dtype = None
    return obj


register_pytree_node(
    BlockJacobiPreconditioner, _bj_flatten, _bj_unflatten
)
