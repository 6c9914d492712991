"""TPU probe (round 4): PG/SPG device-time evidence (VERDICT r3 missing #3).

The box-constrained solvers are the reference's inverse-problem specialty
(lcg.cpp:1054-1447, driven by sample1.cpp:110-113 and sample2/5); they were
implemented and tested here but never measured on chip.  The SPG inner
Armijo backtracking (extra A.mv per backtrack, lcg.cpp:1377-1399) is
exactly the data-dependent structure this chip/tunnel punishes — this
probe measures what it actually costs.

Workload: 3-D Laplacian 64^3 f32 (matrix-free fused stencil, the same
operator family as the bench's lap fields), manufactured solution pushed
partially outside the box [1, 2] so the constraints bind (the sample1
recipe).  Measured:

  1. convergence run (sample2 config: abs_diff=1): iterations to
     epsilon, total backtracks (engine 'bt' counter), max_diff on the
     INTERIOR active set;
  2. fixed-iteration chained slopes: PG and SPG device ms/iter (and the
     matvec-equivalent count: PG = 1 + matvec/iter, SPG = 2 + bt/t).

Writes profiling/probe_r4_constrained.json incrementally.
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
from liblcg_tpu.solvers.real import pg as pg_engine
from liblcg_tpu.solvers.real import spg as spg_engine
from liblcg_tpu.types import SolverParams

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_r4_constrained.json")
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
    dev = jax.devices()[0]
    out("device", platform=dev.platform, kind=str(dev))

    g = 64
    n = g ** 3
    # f64, solution INSIDE the box — the sample1.cpp:110-113 recipe
    # (fm ~ U[1,2] with box [1,2]).  A binding-constraint optimum can
    # never satisfy PG/SPG's FULL-gradient stopping metric (the reference
    # lpg uses ||g||^2 too, lcg.cpp:1146); past stagnation the BB step's
    # s^T y hits 0/0 and both the reference and this engine exit
    # NAN_VALUE — measured here first with an out-of-box optimum.
    A = lcg.Laplacian3DOperator(g, g, g, dtype=jnp.float64)
    rng = np.random.default_rng(11)
    x_goal = rng.uniform(1.0, 2.0, n)
    b = jnp.asarray(np.asarray(A.mv(jnp.asarray(x_goal))))
    lo = jnp.full((n,), 1.0)
    hi = jnp.full((n,), 2.0)

    # ---- convergence runs (abs_diff metric, f64-reachable eps) -----------
    p_conv = SolverParams(epsilon=1e-8, abs_diff=1, max_iterations=5000)
    run_spg = jax.jit(lambda bv: spg_engine(A, bv, lower=lo, upper=hi,
                                            params=p_conv))
    t0 = time.time()
    c = run_spg(b)
    np.asarray(c["x"][:2])
    compile_s = time.time() - t0
    wall = best_of(lambda: run_spg(b), lambda c: np.asarray(c["x"][:2]))
    t_spg = int(c["t"])
    out("spg_converge", compile_s=round(compile_s, 1), iterations=t_spg,
        status=int(c["status"]), backtracks=int(c["bt"]),
        backtracks_per_iter=round(int(c["bt"]) / max(t_spg, 1), 3),
        residual=float(c["residual"]), wall_ms=round(wall * 1e3, 2),
        err=float(np.max(np.abs(np.asarray(c["x"]) - x_goal))))

    run_pg = jax.jit(lambda bv: pg_engine(A, bv, lower=lo, upper=hi,
                                          params=p_conv))
    c = run_pg(b)
    np.asarray(c["x"][:2])
    wall = best_of(lambda: run_pg(b), lambda c: np.asarray(c["x"][:2]))
    out("pg_converge", iterations=int(c["t"]), status=int(c["status"]),
        residual=float(c["residual"]), wall_ms=round(wall * 1e3, 2),
        err=float(np.max(np.abs(np.asarray(c["x"]) - x_goal))))

    # ---- fixed-iteration slopes ------------------------------------------
    iters = 64
    p_fix = SolverParams(epsilon=1e-30, abs_diff=1, max_iterations=iters)

    def one_pg(bv):
        return pg_engine(A, bv, lower=lo, upper=hi, params=p_fix)["x"]

    dev_s, wall1 = slope(one_pg, b, K=16)
    out("pg_slope", device_ms=round(dev_s * 1e3, 3),
        us_per_iter=round(dev_s * 1e6 / iters, 2),
        wall_ms=round(wall1 * 1e3, 2), fixed_iters=iters, n=n)

    def one_spg(bv):
        return spg_engine(A, bv, lower=lo, upper=hi, params=p_fix)["x"]

    dev_s, wall1 = slope(one_spg, b, K=16)
    # Matvec-equivalent accounting: what one SPG iteration costs in A.mv
    # units comes from the converge run's bt/t plus the 2 structural mv.
    out("spg_slope", device_ms=round(dev_s * 1e3, 3),
        us_per_iter=round(dev_s * 1e6 / iters, 2),
        wall_ms=round(wall1 * 1e3, 2), fixed_iters=iters, n=n)

    # Comparator: plain CG iteration cost on the same operator (the
    # matvec-normalized baseline for the PERFORMANCE.md paragraph).
    pcgp = SolverParams(epsilon=1e-30, max_iterations=iters)

    def one_cg(bv):
        from liblcg_tpu.solvers.real import cg as cg_engine

        return cg_engine(A, bv, params=pcgp)["x"]

    dev_s, wall1 = slope(one_cg, b, K=16)
    out("cg_slope_comparator", device_ms=round(dev_s * 1e3, 3),
        us_per_iter=round(dev_s * 1e6 / iters, 2), fixed_iters=iters)

    out("done", ok=True)


if __name__ == "__main__":
    main()
