"""TPU probe (round 3b): on-chip validation of the round-3 kernel
additions — the whole-solve BiCGSTAB kernel and the batched multi-RHS
CGS kernel — before their auto-routes ship as defaults (the
validate-then-default discipline from VERDICT r2 "What's weak" #1).

Phase 1: correctness vs the XLA engines on case_10K (f32).
Phase 2: device time per solve via the chained-dispatch slope
(bench.py:_slope — the only measurement that survives the ~32 ms tunnel
RTT).  Writes profiling/probe_r3b_kernels.json.
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
from liblcg_tpu.ops.pallas_cg import (
    pallas_bicgstab_dia,
    pallas_cgs_dia_batched,
)
from liblcg_tpu.utils import io

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_r3b_kernels.json")
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
        out("abort", reason="CPU backend; kernels need the chip")
        return

    s = io.read_system("/root/reference/data/case_10K_A")
    answer = io.read_answer("/root/reference/data/case_10K_B")
    A = lcg.make_sparse_operator(s.n, s.n, s.rows, s.cols, s.vals,
                                 dtype=jnp.float32)
    b = jnp.asarray(s.b, jnp.float32)
    n = s.n
    eps = 1e-9
    params = lcg.SolverParams(epsilon=eps)

    def err_vs_answer(x):
        return float(np.sqrt(np.sum((np.asarray(x, np.float64) - answer) ** 2))
                     / n)

    # ---- BiCGSTAB single-solve kernel --------------------------------------
    t0 = time.time()
    x, t, res = pallas_bicgstab_dia(A.offsets, A.diag_vals, b,
                                    jnp.zeros_like(b), n=n, eps=eps,
                                    max_iter=500)
    np.asarray(x)
    ref = lcg.solve(A, b, method="bicgstab", params=params, pallas="never")
    out("bicgstab_correct",
        compile_s=round(time.time() - t0, 1),
        kernel_iters=int(t), xla_iters=int(ref.iterations),
        kernel_err=err_vs_answer(x), xla_err=err_vs_answer(ref.x),
        residual=float(res))
    fixed_iters = max(int(t), 1)

    def one(b):
        x, _, _ = pallas_bicgstab_dia(A.offsets, A.diag_vals, b,
                                      jnp.zeros_like(b), n=n, eps=0.0,
                                      max_iter=fixed_iters)
        return x

    dev_s, wall = slope(one, b, K=128)
    out("bicgstab_slope", device_us=round(dev_s * 1e6, 1),
        wall_ms=round(wall * 1e3, 2), fixed_iters=fixed_iters)

    # ---- batched CGS kernel ------------------------------------------------
    nrhs = 32
    B = jnp.stack([b * (1.0 + 0.01 * i) for i in range(nrhs)])
    X0 = jnp.zeros_like(B)
    t0 = time.time()
    with jax.enable_x64(False):
        X, tb, resb = pallas_cgs_dia_batched(
            A.offsets, A.diag_vals, jnp.asarray(B, jnp.float32),
            jnp.asarray(X0, jnp.float32), n=n, nrhs=nrhs, eps=eps,
            max_iter=500)
    np.asarray(X)
    ref_b = lcg.solve_batched(A, B, method="cgs", params=params,
                              pallas="never")
    out("cgs_batched_correct",
        compile_s=round(time.time() - t0, 1),
        iters_sys0=int(tb[0]), iters_min=int(tb.min()),
        iters_max=int(tb.max()),
        xla_iters_sys0=int(np.asarray(ref_b.iterations)[0]),
        err_sys0=err_vs_answer(X[0]),
        max_residual=float(resb.max()))
    fixed_b = max(int(tb.max()), 1)

    with jax.enable_x64(False):
        B32 = jnp.asarray(B, jnp.float32)

        def one_b(B_):
            X, _, _ = pallas_cgs_dia_batched(
                A.offsets, A.diag_vals, B_, jnp.zeros_like(B_), n=n,
                nrhs=nrhs, eps=0.0, max_iter=fixed_b)
            return X[:, 0]

        dev_s, wall = slope(one_b, B32, K=32)
    out("cgs_batched_slope",
        device_us_per_solve=round(dev_s * 1e6 / nrhs, 1),
        wall_ms=round(wall * 1e3, 2), fixed_iters=fixed_b, nrhs=nrhs)


if __name__ == "__main__":
    main()
