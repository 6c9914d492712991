"""TPU probe A: decompose the per-iteration latency wall.

Measures, on the real chip (quiet host!):
  1. a trivial pallas kernel call          -> call/launch overhead
  2. pallas CG at max_iter 1/11/121        -> in-kernel per-iteration slope
  3. scalar XLA while_loop, dynamic trips  -> device loop dispatch cost
  4. 10K-vector XLA while_loop             -> loop + vector-op cost
Writes one JSON line per measurement to stdout.
"""

import functools
import json
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def best_of(f, reps=7):
    f()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f()
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:4]
        best = min(best, time.perf_counter() - t0)
    return best


def out(**kw):
    print(json.dumps(kw), flush=True)


n = 10_000

# --- 1. trivial pallas kernel ------------------------------------------------
def _copy_kernel(b_ref, x_out):
    x_out[...] = b_ref[...] * 2.0


@jax.jit
def trivial_pallas(b):
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(b)


b32 = jnp.ones((1, n), jnp.float32)
t = best_of(lambda: trivial_pallas(b32))
out(probe="trivial_pallas_call_ms", ms=round(t * 1e3, 3))

# --- 2. pallas CG slope ------------------------------------------------------
import liblcg_tpu as lcg
from liblcg_tpu.ops.pallas_cg import pallas_cg_dia
from liblcg_tpu.utils import io

s = io.read_system("/root/reference/data/case_10K_A")
A = lcg.make_sparse_operator(s.n, s.n, s.rows, s.cols, s.vals, dtype=jnp.float32)
bb = jnp.asarray(s.b, jnp.float32)
x0 = jnp.zeros_like(bb)
for mi in (1, 11, 121):
    f = lambda: pallas_cg_dia(
        A.offsets, A.diag_vals, bb, x0, n=s.n, eps=0.0, max_iter=mi
    )
    t = best_of(f)
    out(probe="pallas_cg_ms", max_iter=mi, ms=round(t * 1e3, 3))

# --- 3. scalar while_loop, dynamic trip count -------------------------------
@jax.jit
def scalar_loop(k):
    def body(c):
        i, v = c
        return i + 1, v * 1.0000001 + 1e-9

    def cond(c):
        return c[0] < k

    return lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(1.0)))


for k in (10, 100, 1000):
    t = best_of(lambda: scalar_loop(jnp.int32(k)))
    out(probe="scalar_while_ms", trips=k, ms=round(t * 1e3, 3))

# --- 4. vector while_loop (axpy on 10K) -------------------------------------
@jax.jit
def vec_loop(k, v):
    def body(c):
        i, x = c
        return i + 1, x * 0.999 + v

    def cond(c):
        return c[0] < k

    return lax.while_loop(cond, body, (jnp.int32(0), v))


v = jnp.ones((n,), jnp.float32)
for k in (10, 100, 1000):
    t = best_of(lambda: vec_loop(jnp.int32(k), v))
    out(probe="vec_while_ms", trips=k, ms=round(t * 1e3, 3))

# --- 5. fori_loop (static trips, unrollable?) -------------------------------
@jax.jit
def vec_fori(v):
    return lax.fori_loop(0, 100, lambda i, x: x * 0.999 + v, v)


t = best_of(lambda: vec_fori(v))
out(probe="vec_fori100_ms", ms=round(t * 1e3, 3))

out(probe="done")
