"""SPMD solve over a device mesh — the capability the reference never had.

Runs on whatever devices are visible; to simulate an 8-device slice on CPU:
    python samples/sample5_multichip.py --virtual
"""

import _bootstrap  # noqa: F401  (checkout-run import path; no-op when installed)


import sys

import numpy as np
import jax


def main():
    if "--virtual" in sys.argv:
        # Must happen before any backend initialization.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import liblcg_tpu as lcg
    from liblcg_tpu.parallel import (
        ShardedLaplacian3D, ShardedSparseOperator, solve_sharded,
    )

    D = len(jax.devices())
    print(f"{D} devices: {jax.devices()[0].platform}")

    # Row-sharded banded sparse system with a one-hop ppermute halo.
    rng = np.random.default_rng(0)
    n = 100_000
    main_d = 4.0 + rng.uniform(0, 1, n)
    off = rng.uniform(-1, 1, n - 1)
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([main_d, off, off])
    x_true = rng.uniform(1, 2, n)
    b = np.zeros(n)
    np.add.at(b, rows, vals * x_true[cols])

    A = ShardedSparseOperator(n, rows, cols, vals, n_devices=D)
    print("comm strategy:", A.comm, "halo:", A.halo)
    res = solve_sharded(A, b, method="cg", params=lcg.SolverParams(epsilon=1e-12))
    print(res, " max err:", np.max(np.abs(np.asarray(res.x) - x_true)))

    # Matrix-free 3-D Laplacian, z-slab domain decomposition.
    nz, ny, nx = 8 * D, 64, 64
    S = ShardedLaplacian3D(nz, ny, nx, n_devices=D, dtype=jnp.float64)
    bb = np.ones(nz * ny * nx)
    res = solve_sharded(S, bb, method="cg", params=lcg.SolverParams(epsilon=1e-10))
    print("stencil:", res)


if __name__ == "__main__":
    main()
