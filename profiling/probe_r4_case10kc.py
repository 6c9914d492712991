"""TPU probe (round 4): the shipped complex 10K system on the chip.

VERDICT r3 "What's missing" #1: the reference's flagship complex workload
(data/case_10K_cA — sample6.cpp:151-195 Jacobi-PCG/PBiCG, sample10.cu
Jacobi-then-IC) had no on-chip number.  Contenders measured here:

  0. ScatteredDirectSolver (host Woodbury, k=198): exact, no chip needed —
     the pattern is diagonal + 200 scattered symmetric entries.
  1. Pair-complex Jacobi-PCG (solvers/cplx_pairs.py): the reference's own
     algorithm in pure real arithmetic, whole solve in one while_loop.
  2. Pair-complex BiCG-sym: the unpreconditioned complex-symmetric method.
  3. Decision-tree case-3 path (PARITY.md): interleaved realified DIA
     (197 scattered complex offsets -> 591 real, scan form) + Jacobi-CGNR.

Correctness first (vs the shipped case_10K_cB answer), then device time
via the chained-dispatch slope (bench.py:_slope methodology — the only
measurement that survives the ~32 ms tunnel RTT).

Writes profiling/probe_r4_case10kc.json incrementally (the scan-DIA
compile is the known long pole, so it runs last).
"""

import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax import lax

import liblcg_tpu as lcg
from liblcg_tpu.solvers.cplx_pairs import (
    PairJacobi, bicg_sym_pairs, pcg_pairs,
)
from liblcg_tpu.operators import realify, split_complex
from liblcg_tpu.types import SolverParams
from liblcg_tpu.utils import io

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_r4_case10kc.json")
RESULTS = {}


def out(name, **kw):
    RESULTS[name] = kw
    print(json.dumps({"probe": name, **kw}), flush=True)
    with open(OUT_PATH, "w") as f:
        json.dump(RESULTS, f, indent=2)


def best_of(f, sync, reps=3):
    f()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f()
        sync(r)
        best = min(best, time.perf_counter() - t0)
    return best


def slope(solve_one, b, K, reps=3):
    @jax.jit
    def run(b, K):
        def body(i, acc):
            x = solve_one(b * (1.0 + acc * 1e-30))
            return acc + x[..., 0].sum().astype(b.dtype) * 1e-30

        return lax.fori_loop(0, K, body, jnp.zeros((), b.dtype))

    t1 = best_of(lambda: run(b, jnp.int32(1)), lambda r: np.asarray(r), reps)
    tK = best_of(lambda: run(b, jnp.int32(K)), lambda r: np.asarray(r), reps)
    return (tK - t1) / (K - 1), t1


def main():
    import sys

    only_cgnr = "--only-cgnr" in sys.argv
    skip_cgnr = "--skip-cgnr" in sys.argv
    # Load previous partial results so phase-split runs merge.
    if os.path.exists(OUT_PATH):
        try:
            with open(OUT_PATH) as f:
                RESULTS.update(json.load(f))
        except Exception:
            pass

    dev = jax.devices()[0]
    out("device", platform=dev.platform, kind=str(dev))

    s = io.read_system("/root/reference/data/case_10K_cA",
                       complex_values=True)
    answer = io.read_answer("/root/reference/data/case_10K_cB",
                            complex_values=True)
    n = s.n
    p = SolverParams(epsilon=1e-6, abs_diff=1)

    if only_cgnr:
        run_cgnr(s, answer, n)
        out("done_cgnr", ok=True)
        return

    # ---- 0: host Woodbury direct (exact) --------------------------------
    t0 = time.perf_counter()
    D = lcg.ScatteredDirectSolver(n, s.rows, s.cols, s.vals)
    factor_ms = (time.perf_counter() - t0) * 1e3
    r = D.solve(np.asarray(s.b))
    wall = best_of(lambda: D.solve(np.asarray(s.b)), lambda r: r.x, reps=5)
    out("direct", k=D.k, factor_ms=round(factor_ms, 2),
        wall_ms=round(wall * 1e3, 3),
        max_diff=float(np.max(np.abs(r.x - answer))))

    # ---- 1/2: pair-complex engines on chip ------------------------------
    # ScatteredOperator, NOT SparseOperator: the realified ELL gather
    # graph is a pinned remote-compile hang (PARITY.md; re-confirmed this
    # round — pair-PCG over realified ELL exceeded 9.5 min of compile).
    # The diag+scatter product compiles fine.
    A = lcg.ScatteredOperator(n, s.rows, s.cols, s.vals)
    R = realify(A).astype(jnp.float64)
    bp = jnp.asarray(split_complex(np.asarray(s.b)))
    diag_c = np.asarray(A.diagonal())
    Mj = PairJacobi.from_complex_diag(diag_c)

    t0 = time.time()
    rp = lcg.solve_realified(A, s.b, method="pcg", M="jacobi", params=p)
    np.asarray(rp.x[:2])
    compile_s = time.time() - t0
    wall = best_of(
        lambda: lcg.solve_realified(A, s.b, method="pcg", M="jacobi",
                                    params=p),
        lambda r: np.asarray(r.x[:2]))
    iters_pcg = int(rp.iterations)
    out("pairs_pcg_correct", compile_s=round(compile_s, 1),
        iterations=iters_pcg, status=int(rp.status_code),
        max_diff=float(np.max(np.abs(rp.x - answer))),
        wall_ms=round(wall * 1e3, 2))

    t0 = time.time()
    rb = lcg.solve_realified(A, s.b, method="bicg_sym", params=p)
    np.asarray(rb.x[:2])
    compile_s = time.time() - t0
    iters_sym = int(rb.iterations)
    out("pairs_bicg_sym_correct", compile_s=round(compile_s, 1),
        iterations=iters_sym, status=int(rb.status_code),
        max_diff=float(np.max(np.abs(rb.x - answer))))

    # Device time: fixed-iteration slopes (chained, data-dependent).
    pfix = SolverParams(epsilon=1e-30, abs_diff=1, max_iterations=iters_pcg)

    def one_pcg(bv):
        return pcg_pairs(R, bv, M=Mj, params=pfix)["x"]

    dev_s, wall1 = slope(one_pcg, bp, K=8)
    out("pairs_pcg_slope", device_ms=round(dev_s * 1e3, 3),
        us_per_iter=round(dev_s * 1e6 / iters_pcg, 2),
        wall_ms=round(wall1 * 1e3, 2), fixed_iters=iters_pcg)

    pfix2 = SolverParams(epsilon=1e-30, abs_diff=1, max_iterations=iters_sym)

    def one_sym(bv):
        return bicg_sym_pairs(R, bv, params=pfix2)["x"]

    dev_s, wall1 = slope(one_sym, bp, K=8)
    out("pairs_bicg_sym_slope", device_ms=round(dev_s * 1e3, 3),
        us_per_iter=round(dev_s * 1e6 / iters_sym, 2),
        wall_ms=round(wall1 * 1e3, 2), fixed_iters=iters_sym)

    if not skip_cgnr:
        run_cgnr(s, answer, n)

    out("done", ok=True)


def run_cgnr(s, answer, n):
    """Decision-tree case-3 path (realified scan-DIA + Jacobi-CGNR) — the
    long compile pole (591-offset scan form), phase-splittable via
    --only-cgnr / --skip-cgnr."""
    r2, c2, v2 = lcg.realify_coo(s.rows, s.cols, s.vals)
    A2 = lcg.make_sparse_operator(2 * n, 2 * n, r2, c2, v2, format="dia")
    fmt = type(A2).__name__
    b2 = jnp.asarray(lcg.split_complex_interleaved(np.asarray(s.b)))
    NE = lcg.NormalEqOperator(A2)
    rhs = A2.rmv(b2)
    Mne = lcg.JacobiPreconditioner(NE)
    pn = SolverParams(epsilon=1e-16)
    t0 = time.time()
    rn = lcg.solve(NE, rhs, method="pcg", M=Mne, params=pn, pallas="never")
    np.asarray(rn.x[:2])
    compile_s = time.time() - t0
    x = lcg.merge_complex_interleaved(np.asarray(rn.x))
    wall = best_of(
        lambda: lcg.solve(NE, rhs, method="pcg", M=Mne, params=pn,
                          pallas="never"),
        lambda r: np.asarray(r.x[:2]))
    out("cgnr_scan_dia", format=fmt, compile_s=round(compile_s, 1),
        iterations=int(rn.iterations), status=int(rn.status_code),
        max_diff=float(np.max(np.abs(x - answer))),
        wall_ms=round(wall * 1e3, 2))


if __name__ == "__main__":
    main()
