"""TPU probe F: K1 vs K2 in isolation at 256^3 f32 (chained)."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from liblcg_tpu.ops.pallas_stencil_cg import build_kernels


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
shape = (G, G, G)
d0 = jnp.ones(shape, jnp.float32)
g0 = jnp.full(shape, 0.5, jnp.float32)

with jax.enable_x64(False):
    k1, k2 = build_kernels(G, G, G)

    @jax.jit
    def k1_chain(d, g, K):
        def body(i, c):
            d, g = c
            dn, ad, s = k1(jnp.full((1,), 0.5, jnp.float32), d, g, d, g, d, g)
            return dn, ad

        return lax.fori_loop(0, K, body, (d, g))

    t1 = best_of(lambda: k1_chain(d0, g0, jnp.int32(1)))
    tK = best_of(lambda: k1_chain(d0, g0, jnp.int32(51)))
    out(probe="k1_alone", us_per_call=round((tK - t1) / 50 * 1e6, 1))

    @jax.jit
    def k2_chain(x, g, K):
        def body(i, c):
            x, g = c
            xn, gn, gg, xx = k2(jnp.full((1,), 1e-6, jnp.float32), x, g, x, g)
            return xn, gn

        return lax.fori_loop(0, K, body, (x, g))

    t1 = best_of(lambda: k2_chain(d0, g0, jnp.int32(1)))
    tK = best_of(lambda: k2_chain(d0, g0, jnp.int32(51)))
    out(probe="k2_alone", us_per_call=round((tK - t1) / 50 * 1e6, 1))

out(probe="done")
