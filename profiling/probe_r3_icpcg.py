"""TPU probe (round 3): device time for the IC(0) triangular-solve path.

VERDICT r2 "What's missing" #3 / "Next round" #2: SURVEY called sparse
triangular solve "the hard TPU kernel"; the level-scheduled form pays one
gather+scatter per level (201 levels on case_10K's IC(0) factor) and has
no chip measurement.  The workload matched is the reference's sample8:
cusparse csric02 + csrsv2 IC(0)-PCG on case_10K
(/root/reference/src/sample/sample8.cu:112-118,216-236).

Measures, on the real chip (all f32):
  1. blocked-form IC-PCG correctness (MXU block inverses + scan,
     precond/blocked_tri.py) via the public solve();
  2. device time per solve: blocked IC-PCG vs level-scheduled IC-PCG vs
     plain CG — the decision data for the recommended TPU form;
  3. the weak-scaling single-chip hardware anchor (VERDICT #8): nnz/s of
     the per-device Laplacian workload, written into weak_scaling.json.

Emits JSON lines as it goes; writes profiling/probe_r3_icpcg.json.
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
from liblcg_tpu.utils import io

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_PATH = os.path.join(HERE, "probe_r3_icpcg.json")
WEAK_SCALING = os.path.join(os.path.dirname(HERE), "weak_scaling.json")
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
    if dev.platform == "cpu":
        out("abort", reason="CPU backend; this probe needs the chip")
        return

    s = io.read_system("/root/reference/data/case_10K_A")
    answer = io.read_answer("/root/reference/data/case_10K_B")
    n = s.n
    A = lcg.make_sparse_operator(n, n, s.rows, s.cols, s.vals,
                                 dtype=jnp.float32)
    b = jnp.asarray(s.b, jnp.float32)
    eps = 1e-11  # squared-norm metric: ||r||/||x|| ~ 3e-6 (f32-reachable)
    params = lcg.SolverParams(epsilon=eps)

    from liblcg_tpu.precond.incomplete import incomplete_cholesky_coo

    t0 = time.time()
    fac = incomplete_cholesky_coo(n, s.rows, s.cols, s.vals)
    out("ic0_factorize", host_s=round(time.time() - t0, 2))

    def err_vs_answer(x):
        return float(np.sqrt(np.sum((np.asarray(x, np.float64) - answer) ** 2))
                     / n)

    # ---- phase 1: blocked IC-PCG correctness on chip -----------------------
    Mb = fac.preconditioner(mode="blocked", dtype=jnp.float32)
    t0 = time.time()
    rb = lcg.solve(A, b, method="pcg", M=Mb, params=params)
    np.asarray(rb.x[:4])
    out("icpcg_blocked_correct", compile_s=round(time.time() - t0, 1),
        iters=int(rb.iterations), converged=bool(rb.converged),
        err=err_vs_answer(rb.x),
        n_blocks=int(Mb.lower.n_blocks), block=int(Mb.lower.m),
        bandwidth=int(Mb.lower.w))
    iters = max(int(rb.iterations), 1)

    # ---- phase 2: device-time slopes (fixed work = the measured iters) -----
    from liblcg_tpu.solvers import real as _real

    fixed = lcg.SolverParams(epsilon=1e-30, max_iterations=iters)

    def one_blocked(b):
        return _real.pcg(A, b, M=Mb, params=fixed)["x"]

    dev_s, wall = slope(one_blocked, b, K=8)
    out("icpcg_blocked_slope",
        device_us_per_iter=round(dev_s * 1e6 / iters, 1),
        device_ms_per_solve=round(dev_s * 1e3, 3),
        wall_ms=round(wall * 1e3, 2), fixed_iters=iters)

    # Plain CG f32, fixed 121 iterations (the reference parity count).
    fixed_cg = lcg.SolverParams(epsilon=1e-30, max_iterations=121)

    def one_cg(b):
        return _real.cg(A, b, params=fixed_cg)["x"]

    dev_s, wall = slope(one_cg, b, K=8)
    out("cg_f32_slope", device_us_per_iter=round(dev_s * 1e6 / 121, 1),
        device_ms_per_solve=round(dev_s * 1e3, 3),
        wall_ms=round(wall * 1e3, 2), fixed_iters=121)

    # ---- phase 3: weak-scaling single-chip hardware anchor -----------------
    nz, ny, nx = 8, 32, 32
    L = lcg.Laplacian3DOperator(nz, ny, nx, dtype=jnp.float32)
    bl = jnp.ones((nz * ny * nx,), jnp.float32)
    anchor_params = lcg.SolverParams(epsilon=1e-30, max_iterations=30)

    def one_lap(b):
        return _real.cg(L, b, params=anchor_params)["x"]

    dev_s, wall = slope(one_lap, bl, K=64)
    anchor = {
        "grid": [nz, ny, nx],
        "iters": 30,
        "nnz_per_s": L.nnz * 30 / dev_s if dev_s > 0 else None,
        "device_ms_per_solve": round(dev_s * 1e3, 4),
        "device_kind": str(dev),
        "note": "single real chip, same per-device workload as the "
                "virtual-mesh sweep (tests/test_weak_scaling.py)",
    }
    out("weak_scaling_anchor", **anchor)
    try:
        with open(WEAK_SCALING) as f:
            ws = json.load(f)
    except Exception:
        ws = {}
    ws["tpu_single_chip"] = anchor
    with open(WEAK_SCALING, "w") as f:
        json.dump(ws, f, indent=2)

    # ---- phase 4: level-scheduled IC-PCG (the gather form; may be slow) ----
    Ml = fac.preconditioner(mode="levels")
    # level_schedule stores f64 vals; rebuild in f32 for a fair comparison.
    from liblcg_tpu.precond.triangular import level_schedule, TriangularPreconditioner
    lo = level_schedule(n, fac.l_rows, fac.l_cols,
                        fac.l_vals.astype(np.float32), lower=True)
    up = level_schedule(n, fac.u_rows, fac.u_cols,
                        fac.u_vals.astype(np.float32), lower=False)
    Ml32 = TriangularPreconditioner(lo, up)
    t0 = time.time()
    rl = lcg.solve(A, b, method="pcg", M=Ml32, params=params)
    np.asarray(rl.x[:4])
    out("icpcg_levels_correct", compile_s=round(time.time() - t0, 1),
        iters=int(rl.iterations), converged=bool(rl.converged),
        err=err_vs_answer(rl.x), n_levels=int(lo.n_levels))

    def one_levels(b):
        return _real.pcg(A, b, M=Ml32, params=fixed)["x"]

    dev_s, wall = slope(one_levels, b, K=4)
    out("icpcg_levels_slope",
        device_us_per_iter=round(dev_s * 1e6 / iters, 1),
        device_ms_per_solve=round(dev_s * 1e3, 3),
        wall_ms=round(wall * 1e3, 2), fixed_iters=iters)

    out("done", ok=True)


if __name__ == "__main__":
    main()
