"""Matrix-free 3-D 7-point Laplacian operators (single-device and sharded).

The weak-scaling workload from BASELINE.md ("synthetic 100M-row 3D 7-point
Laplacian CSR, row-partitioned") — except that on TPU the idiomatic form of
a stencil operator is not a sparse gather at all: it is a fused
pad/shift/add over a dense 3-D grid, which XLA vectorizes at HBM
speed-of-light with zero index traffic.  The sharded variant partitions the
grid into z-slabs and exchanges one boundary plane per neighbor per product
via ``lax.ppermute`` (the one-hop halo pattern of SURVEY §2.9), so the
communication volume per product is O(nx*ny) against O(nx*ny*nz_local)
compute — the textbook weak-scaling regime.

Operator: (A u)[i,j,k] = 6 u[i,j,k] - sum of the 6 face neighbors, with
homogeneous Dirichlet boundaries — symmetric positive definite.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.tree_util import register_pytree_node

from ..operators import LinearOperator


def _stencil_interior(u_ext: jnp.ndarray) -> jnp.ndarray:
    """6*u - face neighbors for a z-extended block ``u_ext`` of shape
    (nz_local + 2, ny, nx); x/y boundaries are Dirichlet (zero-padded)."""
    p = jnp.pad(u_ext, ((0, 0), (1, 1), (1, 1)))
    core = u_ext[1:-1]
    return (
        6.0 * core
        - u_ext[:-2]
        - u_ext[2:]
        - p[1:-1, :-2, 1:-1]
        - p[1:-1, 2:, 1:-1]
        - p[1:-1, 1:-1, :-2]
        - p[1:-1, 1:-1, 2:]
    )


class Laplacian3DOperator(LinearOperator):
    """Single-device 7-point Laplacian on an (nz, ny, nx) grid, flattened
    with z slowest (row i = z*ny*nx + y*nx + x)."""

    def __init__(self, nz: int, ny: int, nx: int, dtype=jnp.float32):
        self.grid = (int(nz), int(ny), int(nx))
        n = nz * ny * nx
        self.shape = (n, n)
        self.dtype = jnp.dtype(dtype)
        self.nnz = 7 * n - 2 * (nx * ny + ny * nz + nz * nx)  # interior bonds

    def mv(self, x):
        nz, ny, nx = self.grid
        u = x.reshape(nz, ny, nx)
        u_ext = jnp.pad(u, ((1, 1), (0, 0), (0, 0)))
        return _stencil_interior(u_ext).reshape(-1)

    def rmv(self, x):
        return self.mv(x)  # symmetric

    def hmv(self, x):
        return self.mv(x)

    def diagonal(self):
        return jnp.full((self.shape[0],), 6.0, dtype=self.dtype)


def _lap_flatten(op):
    return (), (op.grid, str(op.dtype))


def _lap_unflatten(aux, _):
    obj = object.__new__(Laplacian3DOperator)
    obj.grid, dtype_str = aux
    nz, ny, nx = obj.grid
    n = nz * ny * nx
    obj.shape = (n, n)
    obj.dtype = jnp.dtype(dtype_str)
    obj.nnz = 7 * n - 2 * (nx * ny + ny * nz + nz * nx)
    return obj


register_pytree_node(Laplacian3DOperator, _lap_flatten, _lap_unflatten)


class ShardedLaplacian3D(LinearOperator):
    """Z-slab-partitioned 7-point Laplacian for SPMD solves.

    Each device owns ``nz // n_devices`` contiguous z-planes; ``mv`` (called
    inside ``shard_map`` on local flat shards) ppermutes one boundary plane
    to each neighbor and applies the fused stencil.  Edge devices receive
    zeros from the missing neighbor (``ppermute`` semantics), which realizes
    the Dirichlet boundary for free.
    """

    n = None  # instance attribute shadows the base-class property

    def __init__(
        self,
        nz: int,
        ny: int,
        nx: int,
        *,
        n_devices: int,
        axis_name: str = "rows",
        dtype=jnp.float32,
    ):
        if nz % n_devices != 0:
            raise ValueError(f"nz={nz} must divide evenly over {n_devices} devices")
        self.grid = (int(nz), int(ny), int(nx))
        self.n_devices = int(n_devices)
        self.axis_name = axis_name
        self.nz_local = nz // n_devices
        n = nz * ny * nx
        self.n = n
        self.n_padded = n
        self.n_local = n // n_devices
        self.shape = (n, n)
        self.dtype = jnp.dtype(dtype)
        self.nnz = 7 * n - 2 * (nx * ny + ny * nz + nz * nx)

    def mv(self, x):
        nz, ny, nx = self.grid
        D = self.n_devices
        ax = self.axis_name
        u = x.reshape(self.nz_local, ny, nx)
        # Halo planes: from the z-below neighbor (shard i-1) and z-above
        # (shard i+1); missing neighbors contribute zeros (Dirichlet).
        below = lax.ppermute(u[-1:], ax, perm=[(i, i + 1) for i in range(D - 1)])
        above = lax.ppermute(u[:1], ax, perm=[(i + 1, i) for i in range(D - 1)])
        u_ext = jnp.concatenate([below, u, above], axis=0)
        return _stencil_interior(u_ext).reshape(-1)

    def rmv(self, x):
        return self.mv(x)

    def hmv(self, x):
        return self.mv(x)

    def diagonal(self):
        return jnp.full((self.n,), 6.0, dtype=self.dtype)


def _slap_flatten(op):
    return (), (op.grid, op.n_devices, op.axis_name, str(op.dtype))


def _slap_unflatten(aux, _):
    grid, n_devices, axis_name, dtype_str = aux
    obj = object.__new__(ShardedLaplacian3D)
    obj.grid = grid
    obj.n_devices = n_devices
    obj.axis_name = axis_name
    nz, ny, nx = grid
    obj.nz_local = nz // n_devices
    n = nz * ny * nx
    obj.n = n
    obj.n_padded = n
    obj.n_local = n // n_devices
    obj.shape = (n, n)
    obj.dtype = jnp.dtype(dtype_str)
    obj.nnz = 7 * n - 2 * (nx * ny + ny * nz + nz * nx)
    return obj


register_pytree_node(ShardedLaplacian3D, _slap_flatten, _slap_unflatten)
