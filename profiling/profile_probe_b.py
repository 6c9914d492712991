"""TPU probe B: true device cost via K-chained solves in ONE dispatch.

Per-call wall time through the axon tunnel is dominated by a ~32 ms
round-trip (probe A).  Chaining K data-dependent solves inside a single
jit and regressing over K separates dispatch RTT (intercept) from the
real per-solve device time (slope).
"""

import json
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax import lax

import liblcg_tpu as lcg
from liblcg_tpu.ops.pallas_cg import pallas_cg_dia
from liblcg_tpu.solvers import real as _real
from liblcg_tpu.utils import io


def out(**kw):
    print(json.dumps(kw), flush=True)


def best_of(f, reps=5):
    f()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f()
        np.asarray(r).ravel()[:4]
        best = min(best, time.perf_counter() - t0)
    return best


# 0. pure sync RTT on a precomputed tiny array
x_tiny = jnp.zeros((8,), jnp.float32) + 1.0
np.asarray(x_tiny)
best = float("inf")
for _ in range(7):
    t0 = time.perf_counter()
    np.asarray(x_tiny)
    best = min(best, time.perf_counter() - t0)
out(probe="pure_sync_ms", ms=round(best * 1e3, 3))

s = io.read_system("/root/reference/data/case_10K_A")
A32 = lcg.make_sparse_operator(s.n, s.n, s.rows, s.cols, s.vals, dtype=jnp.float32)
A64 = lcg.make_sparse_operator(s.n, s.n, s.rows, s.cols, s.vals)
b32 = jnp.asarray(s.b, jnp.float32)
b64 = jnp.asarray(s.b)
params12 = lcg.SolverParams(epsilon=1e-12)


def chain(fn_one, b, K):
    """K data-dependent runs of fn_one inside one jit."""

    @jax.jit
    def run(b):
        def body(i, acc):
            x = fn_one(b * (1.0 + acc * 1e-30))
            return acc + x[0] * 1e-30

        return lax.fori_loop(0, K, body, jnp.zeros((), b.dtype))

    return lambda: run(b)


# 1. pallas whole-solve CG f32 (121 iters)
def pallas_one(b):
    x, t, r = pallas_cg_dia(A32.offsets, A32.diag_vals, b,
                            jnp.zeros_like(b), n=s.n, eps=0.0, max_iter=121)
    return x


for K in (1, 8):
    t = best_of(chain(pallas_one, b32, K))
    out(probe="chain_pallas_cg121_f32", K=K, ms=round(t * 1e3, 3))


# 2. standard DIA CG f64 to 1e-12 (121 iters)
def cg_one_64(b):
    return _real.cg(A64, b, params=params12)["x"]


for K in (1, 8):
    t = best_of(chain(cg_one_64, b64, K))
    out(probe="chain_cg_case10k_f64", K=K, ms=round(t * 1e3, 3))

# 3. Laplacian 128^3, 100 iters, f32 and f64
lap_params = lcg.SolverParams(epsilon=1e-30, max_iterations=100)
for dt, name in ((jnp.float32, "f32"), (jnp.float64, "f64")):
    L = lcg.Laplacian3DOperator(128, 128, 128, dtype=dt)
    bl = jnp.ones((128 ** 3,), dt)

    def lap_one(b, L=L):
        return _real.cg(L, b, params=lap_params)["x"]

    for K in (1, 4):
        t = best_of(chain(lap_one, bl, K))
        out(probe=f"chain_lap128_cg100_{name}", K=K, ms=round(t * 1e3, 3))

out(probe="done")
