"""TPU probe D: fused-pass Pallas stencil CG vs XLA CG at 256^3 f32."""

import json
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax import lax

import liblcg_tpu as lcg
from liblcg_tpu.ops.pallas_stencil_cg import pallas_cg_stencil


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
n = G ** 3
b = jnp.ones((n,), jnp.float32)
x0 = jnp.zeros_like(b)

# Correctness first on a small grid vs the XLA engine (on-chip).
As = lcg.Laplacian3DOperator(16, 16, 128, dtype=jnp.float32)
bs = jnp.asarray(np.random.default_rng(0).normal(size=16 * 16 * 128), jnp.float32)
ps = lcg.SolverParams(epsilon=1e-10)
from liblcg_tpu.ops.pallas_stencil_cg import solve_cg_stencil
xs, ts, rs = solve_cg_stencil(As, bs, params=ps)
ref = lcg.solve(As, bs, params=ps, pallas="never")
err = float(np.max(np.abs(np.asarray(xs) - np.asarray(ref.x))))
out(probe="correctness_16x16x128", kernel_iters=int(ts),
    ref_iters=int(ref.iterations), max_diff=err)
assert abs(int(ts) - int(ref.iterations)) <= 2 and err < 1e-3


@jax.jit
def chain(b, K):
    def body(i, acc):
        x, t, r = pallas_cg_stencil(
            b * (1.0 + acc * 1e-30), x0, nz=G, ny=G, nx=G,
            eps=0.0, max_iter=100,
        )
        return acc + x[0] * 1e-30

    return lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))


with jax.enable_x64(False):
    t1 = best_of(lambda: chain(b, jnp.int32(1)))
    t4 = best_of(lambda: chain(b, jnp.int32(4)))
dev = (t4 - t1) / 3
out(probe="lap256_pallas_fused", t1_ms=round(t1 * 1e3, 1),
    dev_ms_per_solve=round(dev * 1e3, 1), us_per_iter=round(dev * 1e4, 1))
out(probe="done")
