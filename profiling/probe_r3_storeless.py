"""Storeless two-sweep CA-CG chip probe: does eliminating the basis from
HBM (gram-only sweep + chain-rebuild recover sweep) beat classic fused
CG's 1.51 ms/iter at 256^3 f32 — the bound PERFORMANCE.md's traffic
arithmetic says only a multi-step scheme can break?

Per s-iteration block the basis-storing path streams ~23 vector lengths
(3.3 read + 2s-1 basis writes in the kernel; 2s+2 reads + 3 writes + 1
read in the XLA recovery); the storeless path streams ~10 (two sweeps of
3.3 reads, one of 3 writes) at the cost of recomputing the 2s-1 stencil
chains (VPU flops the bandwidth-bound regime has spare).

    PYTHONPATH=/root/repo:$PYTHONPATH timeout 590 python profiling/probe_r3_storeless.py
"""

import os
import time
import json

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax

jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from jax import lax

import liblcg_tpu as lcg
from liblcg_tpu.solvers import real as _real
from liblcg_tpu.solvers.sstep import ca_cg


def best(f, sync, reps=4):
    f()
    t = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f())
        t = min(t, time.perf_counter() - t0)
    return t


def slope(make_one, b, K, reps=3):
    @jax.jit
    def run(b, K):
        def body(i, acc):
            x = make_one(b * (1.0 + acc * 1e-30))
            return acc + x.ravel()[0] * 1e-30

        return lax.fori_loop(0, K, body, jnp.zeros((), b.dtype))

    s = lambda r: np.asarray(r)
    t1 = best(lambda: run(b, jnp.int32(1)), s, reps)
    tK = best(lambda: run(b, jnp.int32(K)), s, reps)
    return (tK - t1) / (K - 1) if tK > t1 else None


def main():
    out = {"device": str(jax.devices()[0])}

    # --- iteration counts with the storeless stepper, 128^3 ------------
    g = 128
    A = lcg.Laplacian3DOperator(g, g, g, dtype=jnp.float32)
    b = jnp.ones((g ** 3,), jnp.float32)
    pp = lcg.SolverParams(epsilon=1e-12, max_iterations=1200)
    for route in ("auto", "basis"):
        rs = ca_cg(A, b, s=4, basis="chebyshev", lmin=0.0, lmax=12.0,
                   params=pp, pallas=route, coeff="df64")
        np.asarray(rs["x"][:2])
        out[f"lap128_cacg_s4_{route}_iters"] = int(rs["t"])
        out[f"lap128_cacg_s4_{route}_res"] = float(rs["residual"])

    # --- fixed-iteration device time at 256^3 f32 ----------------------
    g = 256
    ITERS = 96
    A = lcg.Laplacian3DOperator(g, g, g, dtype=jnp.float32)
    b = jnp.ones((g ** 3,), jnp.float32)
    pfix = lcg.SolverParams(epsilon=1e-30, max_iterations=ITERS)

    d = slope(lambda v: _real.cg(A, v, params=pfix)["x"], b, K=3)
    if d is not None:
        out["lap256_cg_ms_per_iter"] = d * 1e3 / ITERS
    for s in (4, 6):
        for route in ("auto", "basis"):
            d = slope(
                lambda v, s=s, route=route: ca_cg(
                    A, v, s=s, basis="chebyshev", lmin=0.0, lmax=12.0,
                    params=pfix, pallas=route, coeff="df64")["x"],
                b, K=3)
            if d is not None:
                key = "storeless" if route == "auto" else "basis"
                out[f"lap256_cacg_s{s}_{key}_df64_ms_per_iter"] = (
                    d * 1e3 / ITERS
                )

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
