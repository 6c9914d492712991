"""Row-partitioned sparse operator for SPMD solves.

The solver-world analogue of tensor/data parallelism (SURVEY §2.9): the
matrix rows are block-partitioned over the 1-D solver mesh, every solve
vector is carried as the matching local shard, and the per-iteration
communication is

- ``mv`` (the hot op, 1-2 per iteration):
  * ``comm="allgather"`` — gather the full x over ICI, then one local
    ELL gather-multiply-reduce.  Correct for any sparsity pattern.
  * ``comm="halo"`` — exchange only the boundary slices each neighbor
    needs via two ``lax.ppermute`` hops, then compute on the extended
    local window.  Valid when the matrix bandwidth fits one block
    (checked at construction); this is the banded/stencil fast path whose
    communication volume is O(halo) instead of O(n).
- ``rmv``/``hmv`` (only used by complex BiCG/PBiCG): local transpose
  contributions scatter-added into a full-length vector, one ``psum``,
  then the local slice.  Costlier than ``mv`` by design — the reference's
  BiCG also pays a second full product for A^H (clcg.cpp:188).

Construction is host-side numpy (once), mirroring where the reference does
its COO sorting and CSR conversion on host (lcg_complex_cuda.cu:267,
sample8.cu:142-173).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.tree_util import register_pytree_node

from ..operators import LinearOperator
from ..ops.spmv import coo_to_ell, ell_spmv


class ShardedSparseOperator(LinearOperator):
    """Sparse operator row-partitioned into ``n_devices`` equal blocks.

    Outside ``shard_map`` the leaves are global ``(n_padded, k)`` arrays;
    inside the solve they are the local ``(n_local, k)`` shards and ``mv``
    consumes/produces local ``(n_local,)`` vectors.  ``axis_name`` is the
    mesh axis the operator communicates over.
    """

    #: Logical (unpadded) system size; shadows the base-class property so the
    #: instance attribute can report the user's N rather than n_padded.
    n = None

    def __init__(
        self,
        n: int,
        rows,
        cols,
        vals,
        *,
        n_devices: int,
        axis_name: str = "rows",
        comm: str = "auto",
        dtype=None,
    ):
        if comm not in ("auto", "allgather", "halo"):
            raise ValueError(f"unknown comm strategy {comm!r}")
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        vals = np.asarray(vals)
        if dtype is not None:
            vals = vals.astype(dtype)

        self.n = int(n)
        self.n_devices = int(n_devices)
        self.axis_name = axis_name
        n_local = -(-n // n_devices)
        self.n_local = n_local
        self.n_padded = n_local * n_devices
        self.shape = (self.n_padded, self.n_padded)
        self.dtype = jnp.dtype(vals.dtype)
        self.nnz = int(len(vals))

        ell_cols, ell_vals = coo_to_ell(self.n_padded, rows, cols, vals, 1)

        # Decide halo feasibility: every block's column footprint must lie
        # within [block_start - n_local, block_end + n_local).
        block_of = rows // n_local
        lo = cols - block_of * n_local          # col offset from block start
        hi = lo - (n_local - 1)                 # offset past block end
        h_l = int(max(0, -(lo.min() if len(lo) else 0)))
        h_r = int(max(0, (hi.max() if len(hi) else 0)))
        halo_ok = h_l <= n_local and h_r <= n_local and n_devices > 1
        if comm == "halo" and not halo_ok:
            raise ValueError(
                f"halo comm infeasible: bandwidth needs halo ({h_l},{h_r}) "
                f"but block size is {n_local}"
            )
        self.comm = (
            "halo" if (comm == "halo" or (comm == "auto" and halo_ok)) else "allgather"
        )
        if n_devices == 1:
            self.comm = "allgather"  # degenerates to a plain local gather

        if self.comm == "halo":
            self.halo = (h_l, h_r)
            # Remap columns into the extended local frame
            # [block_start - h_l, block_end + h_r):  local = col - start + h_l.
            starts = (np.arange(self.n_padded) // n_local * n_local)[:, None]
            local_cols = ell_cols.astype(np.int64) - starts + h_l
            # Padding entries (val == 0) may map out of range; park them at 0.
            local_cols = np.where(ell_vals != 0, local_cols, 0)
            n_ext = n_local + h_l + h_r
            if len(rows):
                assert local_cols.min() >= 0 and local_cols.max() < n_ext
            self.ell_cols = jnp.asarray(local_cols.astype(np.int32))
        else:
            self.halo = (0, 0)
            self.ell_cols = jnp.asarray(ell_cols)
        self.ell_vals = jnp.asarray(ell_vals)

        diag = np.ones(self.n_padded, dtype=vals.dtype)  # 1 on padding rows
        diag[:n] = 0
        dm = rows == cols
        np.add.at(diag, rows[dm], vals[dm])
        self._diag = jnp.asarray(diag)

    # -- SPMD products (call inside shard_map; arrays are local shards) ------

    def _gather_x(self, x):
        """The communication step: extended/full source vector for the local
        ELL product."""
        ax = self.axis_name
        if self.comm == "halo":
            h_l, h_r = self.halo
            D = self.n_devices
            parts = []
            if h_l:
                # Receive the left neighbor's trailing h_l entries.
                left = lax.ppermute(
                    x[-h_l:], ax, perm=[(i, (i + 1) % D) for i in range(D)]
                )
                parts.append(left)
            parts.append(x)
            if h_r:
                # Receive the right neighbor's leading h_r entries.
                right = lax.ppermute(
                    x[:h_r], ax, perm=[(i, (i - 1) % D) for i in range(D)]
                )
                parts.append(right)
            return jnp.concatenate(parts) if len(parts) > 1 else x
        return lax.all_gather(x, ax, tiled=True)

    def mv(self, x):
        return ell_spmv(self.ell_cols, self.ell_vals, self._gather_x(x))

    def cmv(self, x):
        return ell_spmv(self.ell_cols, jnp.conj(self.ell_vals), self._gather_x(x))

    def _transpose_apply(self, x, conj: bool):
        ax = self.axis_name
        vals = jnp.conj(self.ell_vals) if conj else self.ell_vals
        cols = self.ell_cols
        if self.comm == "halo":
            # Recover global column indices arithmetically (padding entries
            # have val == 0, so their garbage targets are harmless).
            start = lax.axis_index(ax) * self.n_local
            cols = cols + start - self.halo[0]
        contrib = (vals * x[:, None]).ravel()
        full = jax.ops.segment_sum(
            contrib, cols.ravel(), num_segments=self.n_padded
        )
        full = lax.psum(full, ax)
        return lax.dynamic_slice(
            full, (lax.axis_index(ax) * self.n_local,), (self.n_local,)
        )

    def rmv(self, x):
        return self._transpose_apply(x, conj=False)

    def hmv(self, x):
        return self._transpose_apply(x, conj=True)

    def diagonal(self):
        return self._diag

    @classmethod
    def from_system(cls, system, *, n_devices: int, **kw):
        """Build from a :class:`liblcg_tpu.utils.io.LinearSystem`."""
        return cls(
            system.n, system.rows, system.cols, system.vals,
            n_devices=n_devices, **kw,
        )


def _sharded_flatten(op):
    leaves = (op.ell_cols, op.ell_vals, op._diag)
    aux = (
        op.n, op.n_devices, op.axis_name, op.comm, op.halo,
        op.n_local, op.n_padded, op.shape, str(op.dtype), op.nnz,
    )
    return leaves, aux


def _sharded_unflatten(aux, children):
    obj = object.__new__(ShardedSparseOperator)
    obj.ell_cols, obj.ell_vals, obj._diag = children
    (obj.n, obj.n_devices, obj.axis_name, obj.comm, obj.halo,
     obj.n_local, obj.n_padded, obj.shape, dtype_str, obj.nnz) = aux
    obj.dtype = jnp.dtype(dtype_str)
    return obj


register_pytree_node(ShardedSparseOperator, _sharded_flatten, _sharded_unflatten)
