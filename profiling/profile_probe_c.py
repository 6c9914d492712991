"""TPU probe C: CG variants in the HBM-streaming regime (256^3 f32).

Chained-slope device time for cg / cg_fused / cg_pipelined at 16.8M rows,
100 iterations — now that measurement excludes the dispatch RTT.
"""

import json
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax import lax

import liblcg_tpu as lcg
from liblcg_tpu.solvers import real as _real


def out(**kw):
    print(json.dumps(kw), flush=True)


def best_of(f, reps=3):
    f()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f()
        np.asarray(r).ravel()[:4]
        best = min(best, time.perf_counter() - t0)
    return best


G = 256
A = lcg.Laplacian3DOperator(G, G, G, dtype=jnp.float32)
b = jnp.ones((G ** 3,), jnp.float32)
params = lcg.SolverParams(epsilon=1e-30, max_iterations=100)

for name, eng in (("cg", _real.cg), ("cgf", _real.cg_fused),
                  ("cgp", _real.cg_pipelined)):

    def chain(b, K, eng=eng):
        @jax.jit
        def run(b, K):
            def body(i, acc):
                x = eng(A, b * (1.0 + acc * 1e-30), params=params)["x"]
                return acc + x[0] * 1e-30

            return lax.fori_loop(0, K, body, jnp.zeros((), b.dtype))

        return run

    run = chain(b, None)
    t1 = best_of(lambda: run(b, jnp.int32(1)))
    t4 = best_of(lambda: run(b, jnp.int32(4)))
    dev = (t4 - t1) / 3
    out(probe=f"lap256_{name}", t1_ms=round(t1 * 1e3, 1),
        dev_ms_per_solve=round(dev * 1e3, 1),
        us_per_iter=round(dev * 1e4, 1))

out(probe="done")
