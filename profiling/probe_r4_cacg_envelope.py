"""TPU probe (round 4): CA-CG envelope widening (VERDICT r3 #5).

Two candidate widenings were on the table; item 3's measurements picked
for us:

1. VARIABLE-COEFFICIENT stencils in the fused matrix-powers kernel —
   REFUTED by traffic accounting + measurement.  A variable 7-point
   stencil streams its 7 coefficient fields on EVERY product: classic
   fused CG pays 7 + ~2.5 state streams/iter; a storeless s-step sweep
   pays the same 7 fields TWICE per block (gram + recover) = 14/s + ~2.5
   state streams/iter — at s=4 that is ~6 vs ~9.5 streams, diluting the
   1.21x constant-coefficient win to a modeled ~1.05x before kernel
   overheads.  Measured floor check (192^3 kappa-contrast diffusion,
   48 fixed iters): classic fused CG 0.851 ms/iter; the XLA-basis cacg
   fallback 20.5 ms/iter — the (2s+2, n) HIGHEST-precision Gram
   contraction materializes 3-way bf16 operand splits in HBM at this
   size (the pinned CLAUDE.md pathology the Pallas moment dots exist to
   avoid).  Conclusion: variable-coefficient systems should use classic
   CG / IC-PCG (probe_r4_ic_regime), not s-step — now enforced in docs.

2. BATCHED ca_cg — BUILT (solve._solve_cacg_batched: jax.vmap over the
   single-system engine; per-system freezing comes from ca_cg's own
   alive/accept masks, so counts match one-at-a-time exactly —
   tests/test_round4_fixes.py).  This probe measures its amortization
   on chip: 128^3 f32 Laplacian, 8 RHS, fixed 48 iterations — batched
   per-solve device time vs single cacg and vs batched classic CG.

Writes profiling/probe_r4_cacg_envelope.json.
"""

import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax import lax

import liblcg_tpu as lcg
from liblcg_tpu.parallel.stencil import Stencil3DOperator
from liblcg_tpu.solvers import real as _real
from liblcg_tpu.solvers.sstep import ca_cg
from liblcg_tpu.types import SolverParams

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_r4_cacg_envelope.json")
RESULTS = {}


def out(name, **kw):
    RESULTS[name] = kw
    print(json.dumps({"probe": name, **kw}), flush=True)
    with open(OUT_PATH, "w") as f:
        json.dump(RESULTS, f, indent=2)


def best_of(f, reps=3):
    for _ in range(3):
        try:
            f()
            break
        except Exception as e:  # transient remote-compile connection drops
            print("retry:", type(e).__name__, flush=True)
            time.sleep(20)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f())
        best = min(best, time.perf_counter() - t0)
    return best


def slope(one, b, K):
    @jax.jit
    def run(b, K):
        def body(i, acc):
            x = one(b * (1.0 + acc * 1e-30))
            return acc + x.ravel()[0].astype(b.dtype) * 1e-30

        return lax.fori_loop(0, K, body, jnp.zeros((), b.dtype))

    t1 = best_of(lambda: run(b, jnp.int32(1)))
    tK = best_of(lambda: run(b, jnp.int32(K)))
    return (tK - t1) / (K - 1)


def main():
    dev = jax.devices()[0]
    out("device", platform=dev.platform, kind=str(dev))

    iters = 48
    pfix = SolverParams(epsilon=1e-30, max_iterations=iters)

    # ---- 1: variable-coefficient refutation (192^3 diffusion) ----------
    g = 192
    rng = np.random.default_rng(3)
    logk = (rng.normal(0, 1.0, (g, g, g))
            + 1.5 * np.sin(np.arange(g) / 17.0)[:, None, None])
    Av = Stencil3DOperator.diffusion(np.exp(logk).astype(np.float32),
                                     dtype=np.float32)
    bv = jnp.asarray(rng.standard_normal(g ** 3).astype(np.float32))

    def one_cg_var(x):
        return _real.cg_fused(Av, x, params=pfix)["x"]

    dev_s = slope(one_cg_var, bv, K=3)
    out("var192_classic_cg", ms_per_iter=round(dev_s * 1e3 / iters, 3))

    from liblcg_tpu.ops.spectra import gershgorin_bounds

    glo, ghi = gershgorin_bounds(Av)

    def one_cacg_var(x):
        return ca_cg(Av, x, s=4, basis="chebyshev", lmin=max(float(glo), 0.0),
                     lmax=float(ghi), params=pfix, pallas="never")["x"]

    dev_s = slope(one_cacg_var, bv, K=3)
    out("var192_cacg_xla_basis", ms_per_iter=round(dev_s * 1e3 / iters, 3),
        note="HIGHEST-precision Gram contraction materializes bf16 "
             "splits at this size; variable stencils should not use "
             "s-step (streams 7 coefficient fields either way)")

    # ---- 2: batched cacg amortization (128^3 Laplacian, 8 RHS) ---------
    g = 128
    A = lcg.Laplacian3DOperator(g, g, g, dtype=jnp.float32)
    n = g ** 3
    b1 = jnp.ones((n,), jnp.float32)
    nrhs = 8
    B = jnp.stack([b1 * (1.0 + 0.01 * i) for i in range(nrhs)])

    def one_cacg_single(x):
        return ca_cg(A, x, s=4, basis="chebyshev", lmin=0.0, lmax=12.0,
                     params=pfix, pallas="never")["x"]

    dev_s = slope(one_cacg_single, b1, K=4)
    single_ms = dev_s * 1e3 / iters
    out("lap128_cacg_single_xla", ms_per_iter=round(single_ms, 3))

    # Chained-slope measurement of the vmapped engine is NOT possible on
    # this backend: wrapping vmap(while(while)) in the measurement
    # fori_loop crashes the remote compiler (HTTP 500,
    # tpu_compile_helper exit 1 — reproduced 4x).  The plain
    # solve_batched graph compiles and runs; measure amortization from
    # fixed-iteration WALLS at nrhs=1 vs nrhs=8 instead (the marginal
    # cost of 7 extra systems is the quantity of interest; both walls
    # carry the same single ~32 ms dispatch RTT).
    A64 = lcg.Laplacian3DOperator(64, 64, 64, dtype=jnp.float32)
    b64 = jnp.ones((64 ** 3,), jnp.float32)

    def wall_batched(nrhs_):
        Bv = jnp.stack([b64 * (1.0 + 0.01 * i) for i in range(nrhs_)])
        return best_of(lambda: np.asarray(lcg.solve_batched(
            A64, Bv, method="cacg", s=4, lmin=0.0, lmax=12.0, params=pfix,
        ).x[..., :2]))

    w1 = wall_batched(1)
    w8 = wall_batched(8)
    out("lap128_cacg_batched_walls", wall_ms_nrhs1=round(w1 * 1e3, 1),
        wall_ms_nrhs8=round(w8 * 1e3, 1), fixed_iters=iters,
        marginal_ms_per_extra_solve=round((w8 - w1) * 1e3 / 7, 2),
        note="chained-slope form crashes the remote compiler "
             "(vmap(while(while)) inside fori_loop); walls share one "
             "dispatch RTT")

    out("done", ok=True)


if __name__ == "__main__":
    main()
