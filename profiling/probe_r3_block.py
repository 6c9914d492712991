"""Decompose the block-CG iteration cost on the real chip.

Questions: where do the 3.5 ms/iter go (NS inverse chain? gram matmuls?
f64 emulation?), and what does f32 block CG cost?  Run on the TPU:

    PYTHONPATH=/root/repo:$PYTHONPATH python profiling/probe_r3_block.py
"""
import json
import time

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from jax import lax

import liblcg_tpu as lcg
from liblcg_tpu.solve import _VmappedOperator
from liblcg_tpu.solvers import block as BL
from liblcg_tpu.utils import io


def best(f, reps=3):
    f()
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); r = f(); np.asarray(jax.tree.leaves(r)[0]).ravel()[:2]
        b = min(b, time.perf_counter() - t0)
    return b


def slope(one, x, K):
    @jax.jit
    def run(x, K):
        def body(i, acc):
            r = one(x * (1.0 + acc * 1e-30))
            return acc + jnp.sum(r.ravel()[:1]) * 1e-30
        return lax.fori_loop(0, K, body, jnp.zeros((), jnp.result_type(x)))
    t1 = best(lambda: run(x, jnp.int32(1)))
    tK = best(lambda: run(x, jnp.int32(K)))
    return (tK - t1) / (K - 1) if tK > t1 else None


out = {}
s_ = io.read_system("/root/reference/data/case_10K_A")
rng = np.random.default_rng(7)
Bstack = np.vstack([np.asarray(s_.b)] +
                   [rng.standard_normal(s_.n) for _ in range(31)])

# 1) NS inverse chain alone, f64 and f32, on representative SPD 32x32.
for dt, name in ((jnp.float64, "ns_f64_us"), (jnp.float32, "ns_f32_us")):
    M = rng.standard_normal((2, 32, 32))
    W = jnp.asarray(M @ np.swapaxes(M, -1, -2) + 32 * np.eye(32), dt)
    def one_ns(W):
        return BL._ns_inverse(W)
    d = slope(one_ns, W, K=256)
    out[name] = None if d is None else d * 1e6

# 2) ill-conditioned (jitter-bounded) NS: near-singular stack.
Msing = rng.standard_normal((2, 32, 4))
Wsing = jnp.asarray(Msing @ np.swapaxes(Msing, -1, -2), jnp.float64)
Wg = BL._mask_guard(Wsing[0], jnp.ones((32, 1), bool))
Wgs = jnp.stack([Wg, Wg])
d = slope(lambda W: BL._ns_inverse(W), Wgs, K=256)
out["ns_f64_singular_us"] = None if d is None else d * 1e6

# 3) block CG f64 and f32 full solves (device per stack).
for dt, name, eps in ((jnp.float64, "block_f64_ms", 1e-12),
                      (jnp.float32, "block_f32_ms", 1e-9)):
    A = lcg.make_sparse_operator(s_.n, s_.n, s_.rows, s_.cols, s_.vals,
                                 dtype=dt)
    B = jnp.asarray(Bstack, dt)
    p = lcg.SolverParams(epsilon=eps)
    def one_blk(B):
        return BL.block_cg(_VmappedOperator(A), B, params=p)["x"]
    d = slope(one_blk, B, K=8)
    r = lcg.solve_batched(A, B, method="block_cg", params=p)
    out[name] = None if d is None else d * 1e3
    out[name.replace("_ms", "_iters")] = int(np.max(r.iterations))
    out[name.replace("_ms", "_ok")] = bool(np.all(np.asarray(r.status_code) == 0))

print(json.dumps(out))
with open("/root/repo/profiling/probe_r3_block.json", "w") as f:
    json.dump(out, f, indent=1)

# 4) Where block CG should win: an expensive operator (128^3 matrix-free
#    stencil, HBM-regime state) x8 distinct RHS, f32 — per-iteration
#    overhead amortizes, the iteration reduction survives.
grid = 128
n = grid ** 3
A = lcg.Laplacian3DOperator(grid, grid, grid, dtype=jnp.float32)
rng2 = np.random.default_rng(3)
B8 = jnp.asarray(rng2.standard_normal((8, n)), jnp.float32)
p8 = lcg.SolverParams(epsilon=1e-9)
out2 = {}
rb = lcg.solve_batched(A, B8, method="block_cg", params=p8)
rc = lcg.solve_batched(A, B8, method="cg", params=p8, pallas="never")
out2["lap128x8_block_iters"] = int(np.max(rb.iterations))
out2["lap128x8_batched_iters"] = int(np.max(rc.iterations))
out2["lap128x8_block_ok"] = bool(np.all(np.asarray(rb.status_code) == 0))

from liblcg_tpu.solvers import harness as HN
from liblcg_tpu.solvers import real as _real

def one_blk8(B_):
    return BL.block_cg(_VmappedOperator(A), B_, params=p8)["x"]

def one_bat8(B_):
    with HN.batched():
        return _real.cg(_VmappedOperator(A), B_, params=p8)["x"]

d = slope(one_blk8, B8, K=4)
out2["lap128x8_block_ms"] = None if d is None else d * 1e3
d = slope(one_bat8, B8, K=4)
out2["lap128x8_batched_ms"] = None if d is None else d * 1e3
print(json.dumps(out2))
out.update(out2)
with open("/root/repo/profiling/probe_r3_block.json", "w") as f:
    json.dump(out, f, indent=1)

# 5) FLOP-bound regime: dense ill-conditioned SPD (normal equations),
#    n=3072 x16 RHS, f32.  Here the operator product is itself an MXU
#    matmul ((n, n) x (n, s)) that dwarfs the Gram overhead, so the
#    iteration reduction should survive as wall-clock win.
nD = 3072
G0 = rng.standard_normal((nD, nD))
AD = jnp.asarray(G0.T @ G0 + 0.1 * nD * np.eye(nD), jnp.float32)
BD = jnp.asarray(rng.standard_normal((16, nD)), jnp.float32)
pD = lcg.SolverParams(epsilon=1e-9, max_iterations=20000)
out3 = {}
rb = lcg.solve_batched(AD, BD, method="block_cg", params=pD)
rc = lcg.solve_batched(AD, BD, method="cg", params=pD)
out3["dense3072x16_block_iters"] = int(np.max(rb.iterations))
out3["dense3072x16_batched_iters"] = int(np.max(rc.iterations))
out3["dense3072x16_block_ok"] = bool(np.all(np.asarray(rb.status_code) == 0))

ADop = lcg.DenseOperator(AD)

def one_blkD(B_):
    return BL.block_cg(_VmappedOperator(ADop), B_, params=pD)["x"]

def one_batD(B_):
    with HN.batched():
        return _real.cg(_VmappedOperator(ADop), B_, params=pD)["x"]

d = slope(one_blkD, BD, K=8)
out3["dense3072x16_block_ms"] = None if d is None else d * 1e3
d = slope(one_batD, BD, K=8)
out3["dense3072x16_batched_ms"] = None if d is None else d * 1e3
print(json.dumps(out3))
out.update(out3)
with open("/root/repo/profiling/probe_r3_block.json", "w") as f:
    json.dump(out, f, indent=1)

# 6) Same dense regime, genuinely ill-conditioned (small shift): the
#    block's deflation of the lowest eigenvalues has a real cluster to
#    remove, and the operator stays MXU-FLOP-bound.
AD2 = jnp.asarray(G0.T @ G0 + 2e-3 * nD * np.eye(nD), jnp.float32)
pD2 = lcg.SolverParams(epsilon=1e-8, max_iterations=20000)
out4 = {}
rb = lcg.solve_batched(AD2, BD, method="block_cg", params=pD2)
rc = lcg.solve_batched(AD2, BD, method="cg", params=pD2)
out4["dense_ill_block_iters"] = int(np.max(rb.iterations))
out4["dense_ill_batched_iters"] = int(np.max(rc.iterations))
out4["dense_ill_block_ok"] = bool(np.all(np.asarray(rb.status_code) == 0))
out4["dense_ill_batched_ok"] = bool(np.all(np.asarray(rc.status_code) == 0))

AD2op = lcg.DenseOperator(AD2)

def one_blkD2(B_):
    return BL.block_cg(_VmappedOperator(AD2op), B_, params=pD2)["x"]

def one_batD2(B_):
    with HN.batched():
        return _real.cg(_VmappedOperator(AD2op), B_, params=pD2)["x"]

d = slope(one_blkD2, BD, K=8)
out4["dense_ill_block_ms"] = None if d is None else d * 1e3
d = slope(one_batD2, BD, K=8)
out4["dense_ill_batched_ms"] = None if d is None else d * 1e3
print(json.dumps(out4))
out.update(out4)
with open("/root/repo/profiling/probe_r3_block.json", "w") as f:
    json.dump(out, f, indent=1)
