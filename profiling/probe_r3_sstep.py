"""s-step (CA) CG chip probes: kernel validation, convergence, timing.

Reproduces the round-3 bring-up measurements recorded in
``probe_r3_sstep.json``.  Run on the real chip (axon backend), quiet
host, PYTHONPATH including the repo root:

    PYTHONPATH=/root/repo:$PYTHONPATH timeout 590 python profiling/probe_r3_sstep.py

Three hard-won TPU facts were established by these probes (full story in
PERFORMANCE.md "s-step CG" and CLAUDE.md):

1. An f32 ``Precision.HIGHEST`` dot_general over (k, 16.8M) operands
   materializes the 3-way bf16 operand splits in HBM (observed
   bf16[8,m,n] temporaries ~3x the operand) — basis recovery must be an
   elementwise FMA chain, and the Gram must come from fused moment dots,
   never a large HIGHEST contraction.
2. A flat<->3-D reshape at a pallas custom-call boundary is a physical
   relayout copy of the whole buffer every call (pure-XLA consumers fuse
   reshapes; custom calls cannot): 2.9 -> 1.8 ms/iter at 256^3 from
   carrying the solve vectors in the operator's native 3-D shape.
3. Per-block unconditional residual replacement DESTROYS CG conjugacy
   (96^3 f32 stalled outright); the honest stopping criterion is the
   recovered residual VECTOR's norm — the same recurrence-residual
   semantics as the reference's classic CG.
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
from liblcg_tpu.solvers.sstep import basis_recurrence, ca_cg
from liblcg_tpu.ops import pallas_powers as PP


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

    # --- convergence at 128^3 f32, worst-case smooth b -----------------
    g = 128
    A = lcg.Laplacian3DOperator(g, g, g, dtype=jnp.float32)
    b = jnp.ones((g ** 3,), jnp.float32)
    pp = lcg.SolverParams(epsilon=1e-12, max_iterations=1200)
    r = lcg.solve(A, b, method="cg", params=pp, pallas="never")
    np.asarray(r.x[:2])
    out["lap128_cg_iters"] = int(r.iterations)
    for s in (2, 4):
        rs = lcg.solve(A, b, method="cacg", params=pp, s=s)
        np.asarray(rs.x[:2])
        out[f"lap128_cacg_s{s}_iters"] = int(rs.iterations)
        out[f"lap128_cacg_s{s}_converged"] = bool(rs.converged)

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
        abc = basis_recurrence(s, "chebyshev", 0.0, 12.0)
        fn = PP.make_basis_gram(A, s=s, abc=abc, basis="chebyshev")
        d = slope(
            lambda v, fn=fn, s=s: ca_cg(
                A, v, s=s, basis="chebyshev", lmin=0.0, lmax=12.0,
                params=pfix, basis_gram_fn=fn)["x"],
            b, K=3)
        if d is not None:
            out[f"lap256_cacg_kernel_s{s}_ms_per_iter"] = d * 1e3 / ITERS

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
