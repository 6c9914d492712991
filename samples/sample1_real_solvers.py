"""All real solvers on a manufactured SPD system (reference sample1/2/5).

Builds the normal-equations SPD system of sample1.cpp:48-52 (random 100x80
kernel K, A = K^T K), solves with every real method, checks max_diff
against the manufactured solution, and exercises PCG with Jacobi and the
box-constrained PG/SPG with bounds [1, 2] (sample1.cpp:98-113).
"""

import _bootstrap  # noqa: F401  (checkout-run import path; no-op when installed)


import numpy as np
import jax
import jax.numpy as jnp

import liblcg_tpu as lcg


def main():
    rng = np.random.default_rng(42)
    m, n = 100, 80
    K = rng.uniform(-1.0, 1.0, size=(m, n))
    x_true = rng.uniform(1.0, 2.0, size=n)
    # Matrix-free normal equations: the solver only ever sees K^T (K x).
    A = lcg.NormalEqOperator(lcg.DenseOperator(K))
    b = np.asarray(A.mv(jnp.asarray(x_true)))

    params = lcg.SolverParams(epsilon=1e-12)
    for method in ("cg", "cgs", "bicgstab", "bicgstab2"):
        res = lcg.solve(A, b, method=method, params=params)
        err = np.max(np.abs(np.asarray(res.x) - x_true))
        print(f"{method:10s} {res!r}  max_diff={err:.3e}")

    # diag(K^T K) — the sample1.cpp:98-107 Jacobi recipe.
    M = lcg.JacobiPreconditioner(np.einsum("ij,ij->j", K, K))
    res = lcg.solve(A, b, method="pcg", M=M, params=params)
    print(f"{'pcg':10s} {res!r}  max_diff="
          f"{np.max(np.abs(np.asarray(res.x) - x_true)):.3e}")

    lower, upper = np.full(n, 1.0), np.full(n, 2.0)
    for method in ("pg", "spg"):
        res = lcg.solve(A, b, method=method, lower=lower, upper=upper,
                        params=lcg.SolverParams(epsilon=1e-8, max_iterations=2000))
        err = np.max(np.abs(np.asarray(res.x) - x_true))
        print(f"{method:10s} {res!r}  max_diff={err:.3e}")


if __name__ == "__main__":
    main()
