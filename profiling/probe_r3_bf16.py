"""TPU probe (round 3): bf16 storage economics in the HBM-bound regime.

The 256³ stencil CG streams HBM at ~310-420 GB/s mixed-stream
(PERFORMANCE.md) — the iteration is traffic-bound, so halving the bytes
(bf16 carry vectors instead of f32) should approach 2× per iteration IF
the VPU handles bf16 elementwise at rate and XLA doesn't insert f32
up/down-casts that re-inflate the traffic.

Phase 1: fixed-100-iteration device slope of the 256³ Laplacian CG in
  f32 vs bf16-storage + f32-accumulated dots (`reduce_dtype`).
Phase 2: end-to-end value check — mixed-precision refinement with bf16
  inner solves (f32 outer) vs plain f32 CG, both to the same f32-class
  tolerance: does the coarser inner precision's iteration overhead eat
  the bandwidth win?

Writes profiling/probe_r3_bf16.json.
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
from liblcg_tpu.solvers import real as _real
from liblcg_tpu.solvers import harness as H

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_r3_bf16.json")
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
            x = solve_one(b * (1.0 + acc * 1e-2))
            return acc + x[..., 0].sum().astype(jnp.float32) * 1e-30

        return lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

    t1 = best_of(lambda: run(b, jnp.int32(1)), lambda r: np.asarray(r), reps)
    tK = best_of(lambda: run(b, jnp.int32(K)), lambda r: np.asarray(r), reps)
    return (tK - t1) / (K - 1), t1


GRID = 256
ITERS = 100


def main():
    dev = jax.devices()[0]
    out("device", platform=dev.platform, kind=str(dev))
    if dev.platform == "cpu":
        out("abort", reason="CPU backend")
        return

    n = GRID ** 3
    fixed = lcg.SolverParams(epsilon=1e-30, max_iterations=ITERS)
    fixed_rd = lcg.SolverParams(epsilon=1e-30, max_iterations=ITERS,
                                reduce_dtype="float32")

    # ---- phase 1: per-iteration cost, f32 vs bf16 --------------------------
    A32 = lcg.Laplacian3DOperator(GRID, GRID, GRID, dtype=jnp.float32)
    b32 = jnp.ones((n,), jnp.float32)

    def one_f32(b):
        return _real.cg(A32, b, params=fixed)["x"]

    dev_s, _ = slope(one_f32, b32, K=4)
    f32_ms_iter = dev_s * 1e3 / ITERS
    out("lap256_f32", device_ms_per_iter=round(f32_ms_iter, 3))

    Abf = lcg.Laplacian3DOperator(GRID, GRID, GRID, dtype=jnp.bfloat16)
    bbf = jnp.ones((n,), jnp.bfloat16)

    def one_bf16(b):
        with H.reduction_dtype("float32"):
            return _real.cg(Abf, b, params=fixed_rd)["x"]

    dev_s, _ = slope(one_bf16, bbf, K=4)
    bf_ms_iter = dev_s * 1e3 / ITERS
    out("lap256_bf16", device_ms_per_iter=round(bf_ms_iter, 3),
        speedup_vs_f32=round(f32_ms_iter / max(bf_ms_iter, 1e-9), 2))

    # ---- phase 2: refinement value check (128^3 for convergence sanity) ----
    # f32-class target on the squared metric.
    g2 = 128
    n2 = g2 ** 3
    A2_32 = lcg.Laplacian3DOperator(g2, g2, g2, dtype=jnp.float32)
    b2 = jnp.ones((n2,), jnp.float32)
    eps = 1e-10
    r_f32 = lcg.solve(A2_32, b2, params=lcg.SolverParams(
        epsilon=eps, max_iterations=2000))
    np.asarray(r_f32.x[:4])
    r_ir = lcg.solve_refined(A2_32, b2, inner_dtype=jnp.bfloat16,
                             params=lcg.SolverParams(epsilon=eps),
                             max_refinements=24, trace_len=24)
    np.asarray(r_ir.x[:4])
    tr = np.asarray(r_ir.trace, np.float64)
    out("lap128_bf16_ir",
        f32_iters=int(r_f32.iterations),
        ir_inner_iters=int(r_ir.iterations),
        ir_refinements=int(np.count_nonzero(tr)),
        ir_converged=bool(r_ir.converged),
        ir_residual=float(r_ir.residual))

    def one_ir(b):
        return lcg.solve_refined(A2_32, b, inner_dtype=jnp.bfloat16,
                                 params=lcg.SolverParams(epsilon=eps),
                                 max_refinements=24).x

    def one_f32_conv(b):
        return lcg.solve(A2_32, b, params=lcg.SolverParams(
            epsilon=eps, max_iterations=2000)).x

    dev_ir, _ = slope(one_ir, b2, K=4)
    dev_f32c, _ = slope(one_f32_conv, b2, K=4)
    out("lap128_bf16_ir_slope",
        ir_device_ms=round(dev_ir * 1e3, 2),
        f32_device_ms=round(dev_f32c * 1e3, 2),
        speedup=round(dev_f32c / max(dev_ir, 1e-9), 2))


if __name__ == "__main__":
    main()
