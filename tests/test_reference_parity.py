"""Iteration-count parity against the actual reference binary.

The expected counts below were measured by building the reference library
from /root/reference (cmake, native backend) and driving its own
``lcg_solver`` with its own ``lcg_matvec_coo`` callback on the shipped
data/case_10K system at epsilon=1e-12 (the squared-norm-ratio rule):

    CG=121  CGS=68  BICGSTAB=80  BICGSTAB2=81

CG and CGS reproduce exactly (same recurrence, deterministic arithmetic);
the BiCGSTAB variants' omega/restart computations are rounding-sensitive,
so those match within a small band.
"""

import jax.numpy as jnp
import pytest

import liblcg_tpu as lcg

#: (method, reference iterations, allowed |difference|)
REFERENCE_COUNTS = [
    ("cg", 121, 0),
    ("cgs", 68, 0),
    ("bicgstab", 80, 5),
    ("bicgstab2", 81, 6),
]


@pytest.mark.parametrize("method,ref_iters,tol", REFERENCE_COUNTS)
def test_iteration_count_parity_case10k(case_10k, method, ref_iters, tol):
    sys_, _ = case_10k
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    res = lcg.solve(A, jnp.asarray(sys_.b), method=method,
                    params=lcg.SolverParams(epsilon=1e-12))
    assert res.converged, f"{method}: {res.status}"
    got = int(res.iterations)
    assert abs(got - ref_iters) <= tol, (
        f"{method}: {got} iterations vs reference binary's {ref_iters}"
    )
