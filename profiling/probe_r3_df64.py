"""df64 coefficient-algebra chip probe: does double-float (hi, lo) f32
coefficient math remove the ~0.15 ms/iter emulated-f64 launch tax that
probe_r3_sstep.py attributed to the s-step coefficient recurrences?

Measures, on the real chip (axon), quiet host:

- 128^3 f32 iteration counts: classic CG vs cacg coeff=wide vs
  coeff=df64 (convergence-quality check: df64's ~48-bit mantissa must
  hold the wide path's counts — plain f32 coefficients cost +70%).
- 256^3 f32 fixed-96-iteration device ms/iter via chained-dispatch
  slope: classic CG vs cacg (fused Pallas powers kernel) with
  coeff=wide vs coeff=df64, s = 4 and 6.

    PYTHONPATH=/root/repo:$PYTHONPATH timeout 590 python profiling/probe_r3_df64.py
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
    for coeff in ("wide", "df64"):
        rs = ca_cg(A, b, s=4, basis="chebyshev", lmin=0.0, lmax=12.0,
                   params=pp, coeff=coeff)
        np.asarray(rs["x"][:2])
        out[f"lap128_cacg_s4_{coeff}_iters"] = int(rs["t"])

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
        for coeff in ("wide", "df64"):
            d = slope(
                lambda v, fn=fn, s=s, coeff=coeff: ca_cg(
                    A, v, s=s, basis="chebyshev", lmin=0.0, lmax=12.0,
                    params=pfix, basis_gram_fn=fn, coeff=coeff)["x"],
                b, K=3)
            if d is not None:
                out[f"lap256_cacg_kernel_s{s}_{coeff}_ms_per_iter"] = (
                    d * 1e3 / ITERS
                )

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
