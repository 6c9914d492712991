#!/usr/bin/env python
"""Headline benchmark: CG on the reference's shipped case_10K system.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The workload is the reference's own headline configuration (BASELINE.md):
solve the 10,000-unknown / 48,834-nnz real SPD sparse system shipped with
liblcg (data/case_10K_A) with CG to epsilon=1e-12 under the squared-norm-
ratio stopping rule (~ ||r||/||x|| <= 1e-6), float64, verifying the solution
against the shipped answer vector.  ``vs_baseline`` is the speedup over the
reference's native C++ backend measured on this host's CPU
(bench_baseline.json; best of 7, 121 iterations, identical stopping rule).

Secondary fields report SpMV throughput (nnz/s) and the iteration count
(which must match the reference's 121 — same recurrence, same arithmetic).
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import liblcg_tpu as lcg
from liblcg_tpu.utils import io

REFERENCE_DATA = "/root/reference/data"
REPS = 7


def load_case10k():
    path = f"{REFERENCE_DATA}/case_10K_A"
    if os.path.exists(path):
        sys_ = io.read_system(path, complex_values=False)
        ans = io.read_answer(f"{REFERENCE_DATA}/case_10K_B", complex_values=False)
        return sys_, ans
    # Fallback: synthetic SPD system of the same size/density profile.
    rng = np.random.default_rng(0)
    n = 10_000
    diag = 6.0 + rng.uniform(0, 1, n)
    off = rng.uniform(-1, 1, n - 1)
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([diag, off, off])
    x_true = rng.uniform(1, 2, n)
    dense_b = np.zeros(n)
    np.add.at(dense_b, rows, vals * x_true[cols])
    return io.LinearSystem(n, len(vals), rows.astype(np.int32),
                           cols.astype(np.int32), vals, dense_b), x_true


def main():
    sys_, answer = load_case10k()
    A = lcg.SparseOperator(
        sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals, assume_symmetric=True
    )
    b = jnp.asarray(sys_.b)
    params = lcg.SolverParams(epsilon=1e-12)

    # Warm-up: compile + first solve.  Sync by materializing the solution on
    # host — block_until_ready has been observed to return early through the
    # remote-TPU tunnel, producing fantasy timings.
    res = lcg.solve(A, b, method="cg", params=params)
    np.asarray(res.x)

    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        res = lcg.solve(A, b, method="cg", params=params)
        np.asarray(res.x)
        best = min(best, (time.perf_counter() - t0) * 1e3)

    iters = int(res.iterations)
    avg_err = float(np.sqrt(np.sum((np.asarray(res.x) - answer) ** 2)) / sys_.n)
    ok = bool(res.converged and avg_err < 1e-5)

    # SpMV-only throughput (the hot op): 1000 chained products inside ONE
    # compiled loop, so per-call dispatch latency doesn't pollute the number.
    from jax import lax

    x = jnp.asarray(answer, dtype=b.dtype)
    k_mv = 1000
    mv_loop = jax.jit(
        lambda v: lax.fori_loop(0, k_mv, lambda i, u: A.mv(u) / 6.0, v)
    )
    jax.block_until_ready(mv_loop(x))
    spmv_best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(mv_loop(x))
        spmv_best = min(spmv_best, (time.perf_counter() - t0) / k_mv)
    spmv_nnz_s = sys_.nnz / spmv_best

    baseline_ms = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_baseline.json")) as f:
            baseline_ms = json.load(f)["case_10K_cg"]["best_ms"]
    except Exception:
        pass
    vs_baseline = (baseline_ms / best) if baseline_ms else 1.0

    print(json.dumps({
        "metric": "case10k_cg_solve_wall_ms",
        "value": round(best, 3),
        "unit": "ms",
        "vs_baseline": round(vs_baseline, 3),
        "iterations": iters,
        "converged": ok,
        "avg_err": avg_err,
        "spmv_nnz_per_s": round(spmv_nnz_s, 0),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
