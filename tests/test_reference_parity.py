"""Iteration-count parity against the actual reference binary.

The expected counts below are measured by building the reference library
from /root/reference (native backend) and driving its own ``lcg_solver``
with its own ``lcg_matvec_coo`` callback on the shipped data/case_10K
system at epsilon=1e-12 (the squared-norm-ratio rule):

    CG=121  CGS=68  BICGSTAB=80  BICGSTAB2=81

CG and CGS reproduce exactly (same recurrence, deterministic arithmetic);
the BiCGSTAB variants' omega/restart computations are rounding-sensitive,
so those match within a small band.

REPRODUCIBLE ORACLE: every count in this file (and the walls in
bench_baseline.json) regenerates via ``profiling/make_reference_counts.sh``
(builds the unmodified reference sources, compiles
profiling/reference_counts.cpp against them, runs the shipped data;
``--quick`` skips the timing workloads).  Last regenerated 2026-08-19 —
all pinned counts confirmed (profiling/reference_counts.json).
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


#: Complex-domain counts from the reference's own lcg_sample4 binary
#: (case_1K, epsilon=1e-6, abs_diff — sample4.cpp:166-168): BiCG 407,
#: CGS 732, TFQMR 1464.  The case needs ~400+ iterations at n=1000 (very
#: ill-conditioned), so trajectories shift by a few iterations under ANY
#: change of floating-point reduction order (compiler fusion choices on
#: either side); CGS/TFQMR additionally draw a RANDOM shadow residual
#: seeded from time(0) in the reference (clcg.cpp:399-403).  Counts must
#: land within a few percent.
COMPLEX_REFERENCE_COUNTS = [
    ("bicg", 407, 15),
    ("bicg_sym", 407, 15),
    ("cgs", 732, 30),
    ("tfqmr", 1464, 50),
]


#: Complex-10K counts from the reference binary (native clcg_solver with a
#: COO callback on data/case_10K_cA, epsilon=1e-6 abs_diff — the sample6
#: configuration, sample6.cpp:194-195), regenerated 2026-08-19 by
#: profiling/make_reference_counts.sh: BICG 450, BICG_SYM 450, CGS 817,
#: TFQMR 1536 (BICGSTAB takes 8635 iterations — the reference's own
#: bicgstab effectively fails on this spectrum, so it is not pinned).
#: At 450+ iterations and n=10000 the trajectories are even more
#: reduction-order-sensitive than case_1K; bands are a few percent.
COMPLEX10K_REFERENCE_COUNTS = [
    ("bicg", 450, 30),
    ("bicg_sym", 450, 30),
    ("cgs", 817, 80),       # random shadow residual on both sides
    ("tfqmr", 1536, 150),
]


@pytest.mark.parametrize("method,ref_iters,tol", COMPLEX10K_REFERENCE_COUNTS)
def test_complex_iteration_parity_case10k(case_10k_complex, method, ref_iters,
                                          tol):
    sys_, answer = case_10k_complex
    A = lcg.SparseOperator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    res = lcg.solve(A, jnp.asarray(sys_.b), method=method,
                    params=lcg.SolverParams(epsilon=1e-6, abs_diff=1))
    assert res.converged, f"{method}: {res.status}"
    got = int(res.iterations)
    assert abs(got - ref_iters) <= tol, (
        f"{method}: {got} iterations vs reference binary's {ref_iters}"
    )
    import numpy as np

    md = float(np.max(np.abs(np.asarray(res.x) - answer)))
    assert md < 0.1, f"{method}: max_diff vs shipped answer {md}"


@pytest.mark.parametrize("method,ref_iters,tol", COMPLEX_REFERENCE_COUNTS)
def test_complex_iteration_parity_case1k(case_1k_complex, method, ref_iters, tol):
    sys_, _ = case_1k_complex
    import liblcg_tpu as lcg_mod

    A = lcg_mod.SparseOperator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    res = lcg_mod.solve(A, jnp.asarray(sys_.b), method=method,
                        params=lcg_mod.SolverParams(epsilon=1e-6, abs_diff=1))
    assert res.converged, f"{method}: {res.status}"
    got = int(res.iterations)
    assert abs(got - ref_iters) <= tol, (
        f"{method}: {got} iterations vs reference binary's {ref_iters}"
    )
