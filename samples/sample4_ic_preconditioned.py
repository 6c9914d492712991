"""Incomplete-Cholesky preconditioned solves (reference sample7/sample8):
factorize on host (native C++ when available), apply as level-scheduled
device triangular solves inside the compiled loop."""

import _bootstrap  # noqa: F401  (checkout-run import path; no-op when installed)


import numpy as np
import jax.numpy as jnp

import liblcg_tpu as lcg
from liblcg_tpu.precond import incomplete_cholesky
from liblcg_tpu.utils import io

DATA = "/root/reference/data"


def main():
    sys_ = io.read_system(f"{DATA}/case_10K_A")
    answer = io.read_answer(f"{DATA}/case_10K_B")
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    b = jnp.asarray(sys_.b)
    params = lcg.SolverParams(epsilon=1e-12)

    plain = lcg.solve(A, b, method="cg", params=params)
    print("CG       :", plain)

    fac = incomplete_cholesky(
        lcg.SparseOperator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals,
                           assume_symmetric=True)
    )
    M = fac.preconditioner()
    pcg = lcg.solve(A, b, method="pcg", M=M, params=params)
    print("IC(0)-PCG:", pcg)
    err = np.sqrt(np.sum((np.asarray(pcg.x) - answer) ** 2)) / sys_.n
    print(f"avg error vs shipped answer: {err:.3e}")


if __name__ == "__main__":
    main()
