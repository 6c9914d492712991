"""Complex solvers on the shipped case_1K system (reference sample4/sample6):
BICG / BICG_SYM / CGS / TFQMR at epsilon=1e-6 abs_diff, max_diff oracle."""

import _bootstrap  # noqa: F401  (checkout-run import path; no-op when installed)


import numpy as np
import jax.numpy as jnp

import liblcg_tpu as lcg
from liblcg_tpu.utils import io

DATA = "/root/reference/data"


def main():
    sys_ = io.read_system(f"{DATA}/case_1K_cA", complex_values=True)
    answer = io.read_answer(f"{DATA}/case_1K_cB", complex_values=True)
    A = lcg.SparseOperator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    params = lcg.SolverParams(epsilon=1e-6, abs_diff=1)

    for method in ("bicg", "bicg_sym", "cgs", "tfqmr"):
        res = lcg.solve(A, jnp.asarray(sys_.b), method=method, params=params)
        md = np.max(np.abs(np.asarray(res.x) - answer))
        print(f"{method:10s} {res!r}  max_diff={md:.3e}")

    # Jacobi-preconditioned PCG / PBiCG (sample6.cpp:151-163).
    M = lcg.JacobiPreconditioner(A)
    for method in ("pcg", "pbicg"):
        res = lcg.solve(A, jnp.asarray(sys_.b), method=method, M=M, params=params)
        md = np.max(np.abs(np.asarray(res.x) - answer))
        print(f"{method:10s} {res!r}  max_diff={md:.3e}")


if __name__ == "__main__":
    main()
