"""TPU probe (round 3): on-chip validation of the full VMEM kernel family.

Round 2 shipped whole-solve Pallas kernels for PCG, CGS and batched
Jacobi-PCG with interpret-mode parity tests, but only the CG kernels had
recorded runs on the real chip (VERDICT r2 "What's missing" #2).  This
probe compiles and runs every kernel on the chip:

  1. correctness first (contention-insensitive): each kernel's answer and
     iteration count vs the XLA while-loop engine on case_10K (f32);
  2. then device time per solve via the chained-dispatch slope
     (bench.py:_slope — the only measurement that survives the ~32 ms
     tunnel RTT).

Emits JSON lines as it goes and writes profiling/probe_r3_kernels.json.
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
    pallas_cg_dia,
    pallas_cgs_dia,
    pallas_pcg_dia,
    pallas_cg_dia_batched,
    pallas_pcg_dia_batched,
)
from liblcg_tpu.utils import io

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_r3_kernels.json")
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
    """Per-solve device seconds: chain K data-dependent solves in one jit."""

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
    assert isinstance(A, lcg.BandedOperator)
    b = jnp.asarray(s.b, jnp.float32)
    n = s.n
    # f32-reachable tolerance: the metric is a squared-norm ratio
    # (lcg.cpp:208-209), so 1e-11 means ||r||/||x|| ~ 3e-6.
    eps = 1e-11
    Mj = lcg.JacobiPreconditioner(A)
    invd = jnp.asarray(Mj.inv_diag, jnp.float32)
    params = lcg.SolverParams(epsilon=eps)

    def err_vs_answer(x):
        return float(np.sqrt(np.sum((np.asarray(x, np.float64) - answer) ** 2))
                     / n)

    # ---- phase 1: correctness on chip --------------------------------------
    t0 = time.time()
    x, t, res = pallas_pcg_dia(A.offsets, A.diag_vals, invd, b,
                               jnp.zeros_like(b), n=n, eps=eps, max_iter=500)
    np.asarray(x)
    ref = lcg.solve(A, b, method="pcg", M=Mj, params=params, pallas="never")
    out("pcg_correct",
        compile_s=round(time.time() - t0, 1),
        kernel_iters=int(t), xla_iters=int(ref.iterations),
        kernel_err=err_vs_answer(x), xla_err=err_vs_answer(ref.x),
        residual=float(res))

    t0 = time.time()
    x, t, res = pallas_cgs_dia(A.offsets, A.diag_vals, b, jnp.zeros_like(b),
                               n=n, eps=eps, max_iter=500)
    np.asarray(x)
    ref = lcg.solve(A, b, method="cgs", params=params, pallas="never")
    out("cgs_correct",
        compile_s=round(time.time() - t0, 1),
        kernel_iters=int(t), xla_iters=int(ref.iterations),
        kernel_err=err_vs_answer(x), xla_err=err_vs_answer(ref.x),
        residual=float(res))

    nrhs = 32
    B = jnp.stack([b * (1.0 + 0.01 * i) for i in range(nrhs)])
    X0 = jnp.zeros_like(B)
    t0 = time.time()
    with jax.enable_x64(False):
        X, tb, resb = pallas_pcg_dia_batched(
            A.offsets, A.diag_vals, invd, B, X0, n=n, nrhs=nrhs,
            eps=eps, max_iter=500)
    np.asarray(X)
    # system 0 is the reference system scaled by 1.0 -> same answer
    out("pcg_batched_correct",
        compile_s=round(time.time() - t0, 1),
        iters_sys0=int(tb[0]), iters_min=int(tb.min()),
        iters_max=int(tb.max()),
        err_sys0=err_vs_answer(X[0]),
        max_residual=float(resb.max()))

    # ---- phase 2: device time (slopes) -------------------------------------
    def one_pcg(b):
        x, _, _ = pallas_pcg_dia(A.offsets, A.diag_vals, invd, b,
                                 jnp.zeros_like(b), n=n, eps=0.0, max_iter=37)
        return x

    dev_s, wall = slope(one_pcg, b, K=256)
    out("pcg_slope", device_us=round(dev_s * 1e6, 1),
        wall_ms=round(wall * 1e3, 2), fixed_iters=37)

    def one_cgs(b):
        x, _, _ = pallas_cgs_dia(A.offsets, A.diag_vals, b,
                                 jnp.zeros_like(b), n=n, eps=0.0, max_iter=68)
        return x

    dev_s, wall = slope(one_cgs, b, K=128)
    out("cgs_slope", device_us=round(dev_s * 1e6, 1),
        wall_ms=round(wall * 1e3, 2), fixed_iters=68)

    with jax.enable_x64(False):
        def one_pcg_b(B):
            X, _, _ = pallas_pcg_dia_batched(
                A.offsets, A.diag_vals, invd, B, X0, n=n, nrhs=nrhs,
                eps=0.0, max_iter=37)
            return X[:, 0]

        dev_s, wall = slope(one_pcg_b, B, K=32)
    out("pcg_batched_slope", device_us_per_solve=round(dev_s * 1e6 / nrhs, 1),
        wall_ms=round(wall * 1e3, 2), nrhs=nrhs, fixed_iters=37)

    # CG batched re-confirmation (already chip-validated round 2; cheap).
    with jax.enable_x64(False):
        def one_cg_b(B):
            X, _, _ = pallas_cg_dia_batched(
                A.offsets, A.diag_vals, B, X0, n=n, nrhs=nrhs,
                eps=0.0, max_iter=121)
            return X[:, 0]

        dev_s, wall = slope(one_cg_b, B, K=32)
    out("cg_batched_slope", device_us_per_solve=round(dev_s * 1e6 / nrhs, 1),
        wall_ms=round(wall * 1e3, 2), nrhs=nrhs, fixed_iters=121)

    out("done", ok=True)


if __name__ == "__main__":
    main()
