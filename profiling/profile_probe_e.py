"""TPU probe E: sustained HBM bandwidth + K1/K2 split at 256^3 f32."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


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
v = jnp.ones((n,), jnp.float32)
w = jnp.full((n,), 0.5, jnp.float32)


# 1. chained saxpy: per trip reads 2 vectors, writes 1 (201 MB).
@jax.jit
def saxpy_chain(v, w, K):
    def body(i, acc):
        return acc * 0.999 + 0.001 * w

    return lax.fori_loop(0, K, body, v)


t1 = best_of(lambda: saxpy_chain(v, w, jnp.int32(1)))
tK = best_of(lambda: saxpy_chain(v, w, jnp.int32(101)))
per = (tK - t1) / 100
out(probe="saxpy_256cubed", us_per_trip=round(per * 1e6, 1),
    gbps=round(201.3e6 / per / 1e9, 1))


# 2. chained dot (reads 2 vectors, 134 MB)
@jax.jit
def dot_chain(v, w, K):
    def body(i, acc):
        return acc + jnp.vdot(v + acc * 1e-30, w) * 1e-30

    return lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))


t1 = best_of(lambda: dot_chain(v, w, jnp.int32(1)))
tK = best_of(lambda: dot_chain(v, w, jnp.int32(101)))
per = (tK - t1) / 100
out(probe="dot_256cubed", us_per_trip=round(per * 1e6, 1),
    gbps=round(134.2e6 * 2 / per / 1e9, 1))


# 3. stencil alone (XLA): read 1, write 1 + neighbors (~134 MB min)
from liblcg_tpu.parallel import Laplacian3DOperator

A = Laplacian3DOperator(G, G, G, dtype=jnp.float32)


@jax.jit
def sten_chain(v, K):
    def body(i, x):
        return A.mv(x) * 1e-3

    return lax.fori_loop(0, K, body, v)


t1 = best_of(lambda: sten_chain(v, jnp.int32(1)))
tK = best_of(lambda: sten_chain(v, jnp.int32(101)))
per = (tK - t1) / 100
out(probe="stencil_xla_256cubed", us_per_trip=round(per * 1e6, 1),
    gbps=round(134.2e6 / per / 1e9, 1))

# 4. fused kernel pair, per-iteration (10-iteration solves chained)
from liblcg_tpu.ops import pallas_stencil_cg as P

with jax.enable_x64(False):

    @jax.jit
    def iter_chain(b, K):
        def body(i, acc):
            x, t, r = P.pallas_cg_stencil(
                b * (1.0 + acc * 1e-30), jnp.zeros_like(b),
                nz=G, ny=G, nx=G, eps=0.0, max_iter=10,
            )
            return acc + x[0] * 1e-30

        return lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

    t1 = best_of(lambda: iter_chain(v, jnp.int32(1)))
    tK = best_of(lambda: iter_chain(v, jnp.int32(11)))
    per10 = (tK - t1) / 10
    out(probe="pallas_10iter_solve", us_per_iter=round(per10 * 1e5, 1))

out(probe="done")
