#!/usr/bin/env python
"""Headline benchmark.  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline workload — the BASELINE.md scaling configuration: CG on the 3-D
7-point Laplacian (128^3 = 2.1M unknowns, 14.6M nnz), float64, 100
iterations, matrix-free fused-stencil operator.  ``vs_baseline`` is the
speedup over the reference's own native backend running the identical
workload on this host's CPU (lcg_solver(LCG_CG) with an OpenMP stencil
callback, 4 threads — bench_baseline.json).

Secondary fields: float32 throughput on the same workload, and the shipped
case_10K sparse system (10K unknowns, 48,834 nnz, DIA operator) solved to
the reference tolerance with its iteration count — which must equal the
reference's 121 (same recurrence, same stopping rule).  case_10K is tiny:
121 strictly sequential matvec latencies dominate, which favours the CPU;
it is reported honestly in ``case10k_*`` with its own vs-baseline ratio.

Timing discipline (see .claude/skills/verify/SKILL.md): sync via host
materialization (block_until_ready has been observed to return early
through the remote-TPU tunnel) and never benchmark while other processes
load the host.
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
GRID = 128
LAP_ITERS = 100
REPS = 5


def _sync(res):
    np.asarray(res.x[:8] if res.x.ndim == 1 else res.x[0, :8])


def bench_laplacian(dtype):
    A = lcg.Laplacian3DOperator(GRID, GRID, GRID, dtype=dtype)
    n = GRID ** 3
    b = jnp.ones((n,), dtype)
    params = lcg.SolverParams(epsilon=1e-30, max_iterations=LAP_ITERS)
    res = lcg.solve(A, b, params=params)
    _sync(res)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        res = lcg.solve(A, b, params=params)
        _sync(res)
        best = min(best, time.perf_counter() - t0)
    assert int(res.iterations) == LAP_ITERS
    return best * 1e3, A.nnz * LAP_ITERS / best


def bench_case10k():
    path = f"{REFERENCE_DATA}/case_10K_A"
    if not os.path.exists(path):
        return None
    sys_ = io.read_system(path)
    answer = io.read_answer(f"{REFERENCE_DATA}/case_10K_B")
    A = lcg.make_sparse_operator(sys_.n, sys_.n, sys_.rows, sys_.cols, sys_.vals)
    b = jnp.asarray(sys_.b)
    params = lcg.SolverParams(epsilon=1e-12)
    res = lcg.solve(A, b, method="cg", params=params)
    np.asarray(res.x)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        res = lcg.solve(A, b, method="cg", params=params)
        np.asarray(res.x)
        best = min(best, time.perf_counter() - t0)
    avg_err = float(np.sqrt(np.sum((np.asarray(res.x) - answer) ** 2)) / sys_.n)

    # Multi-RHS throughput: 32 systems in one compiled loop.  The
    # reference's own application domain (geophysical inversion) solves
    # many right-hand sides against one operator; it can only do them
    # serially (lcg.h:61).
    nrhs = 32
    B = jnp.stack([b * (1.0 + 0.01 * i) for i in range(nrhs)])
    rb = lcg.solve_batched(A, B, method="cg", params=params)
    np.asarray(rb.x[0, :4])
    bbest = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rb = lcg.solve_batched(A, B, method="cg", params=params)
        np.asarray(rb.x[0, :4])
        bbest = min(bbest, time.perf_counter() - t0)

    return {
        "ms": round(best * 1e3, 2),
        "iterations": int(res.iterations),
        "converged": bool(res.converged and avg_err < 1e-5),
        "avg_err": avg_err,
        "batched32_ms_per_solve": round(bbest * 1e3 / nrhs, 3),
    }


def main():
    lap64_ms, lap64_nnz_s = bench_laplacian(jnp.float64)
    lap32_ms, lap32_nnz_s = bench_laplacian(jnp.float32)
    c10k = bench_case10k()

    baseline = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_baseline.json")) as f:
            baseline = json.load(f)
    except Exception:
        pass
    lap_base = baseline.get("laplacian_128_cg100", {}).get("best_ms")
    c10k_base = baseline.get("case_10K_cg", {}).get("best_ms")

    out = {
        "metric": "laplacian128_f64_cg100_wall_ms",
        "value": round(lap64_ms, 1),
        "unit": "ms",
        "vs_baseline": round(lap_base / lap64_ms, 2) if lap_base else 1.0,
        "lap_f64_nnz_per_s": f"{lap64_nnz_s:.3e}",
        "lap_f32_wall_ms": round(lap32_ms, 1),
        "lap_f32_nnz_per_s": f"{lap32_nnz_s:.3e}",
        "device": str(jax.devices()[0]),
    }
    if c10k is not None:
        out["case10k_cg_wall_ms"] = c10k["ms"]
        out["case10k_iterations"] = c10k["iterations"]
        out["case10k_converged"] = c10k["converged"]
        out["case10k_batched32_ms_per_solve"] = c10k["batched32_ms_per_solve"]
        if c10k_base:
            out["case10k_vs_baseline"] = round(c10k_base / c10k["ms"], 3)
            out["case10k_batched_vs_baseline"] = round(
                c10k_base / c10k["batched32_ms_per_solve"], 2
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
