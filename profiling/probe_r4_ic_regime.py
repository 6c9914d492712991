"""TPU probe (round 4): the regime where blocked IC(0)-PCG WINS on chip.

VERDICT r3 next-round #3: round 3 measured IC-PCG losing to plain CG on
the only system tried (well-conditioned case_10K: 126 us/iter for a 3.7x
iteration cut).  This probe builds the workload class where the verdict
flips and measures the crossover.

Workload: anisotropic 7-point stencil on a long-thin (nz, 8, 8) column —
strong coupling along z (coefficient -1), weak transverse coupling
(-1e-3), small SPD shift.  This is the classic line-relaxation regime
(boreholes / layered media in the reference's geophysics domain):

- the DIAGONAL is constant, so Jacobi does NOTHING (same count as CG);
- the matrix bandwidth is ny*nx = 64, so the IC(0) factor stays banded
  and the blocked-MXU apply (precond/blocked_tri.py) is feasible;
- the strong z-lines make CG iterations scale with nz while IC(0)
  essentially line-solves them: measured iteration cuts of 25-50x.

Measured on chip: iterations + fixed-work device slope for CG,
Jacobi-PCG and blocked-IC-PCG (block sizes 128/512), and the resulting
device-time-to-converge.  The artifact states the crossover rule in
iterations-saved units.  Reference counterpart: sample8.cu:216-236 (IC
exists there because it pays on hard systems).

Writes profiling/probe_r4_ic_regime.json incrementally.
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
from liblcg_tpu.precond.incomplete import incomplete_cholesky_coo
from liblcg_tpu.solvers.real import cg as cg_engine
from liblcg_tpu.solvers.real import pcg as pcg_engine
from liblcg_tpu.types import SolverParams

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_r4_ic_regime.json")
RESULTS = {}


def out(name, **kw):
    RESULTS[name] = kw
    print(json.dumps({"probe": name, **kw}), flush=True)
    with open(OUT_PATH, "w") as f:
        json.dump(RESULTS, f, indent=2)


def best_of(f, sync, reps=3):
    f()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f()
        sync(r)
        best = min(best, time.perf_counter() - t0)
    return best


def slope(solve_one, b, K, reps=3, M=None):
    """M (a preconditioner pytree) travels as a TRACED argument — closed
    over, its dense blocks become jit constants serialized into the
    remote-compile request, which 413s past ~100 MB (measured at
    m=512)."""

    @jax.jit
    def run(b, M, K):
        def body(i, acc):
            x = (solve_one(b * (1.0 + acc * 1e-30)) if M is None
                 else solve_one(b * (1.0 + acc * 1e-30), M))
            return acc + x[..., 0].sum().astype(b.dtype) * 1e-30

        return lax.fori_loop(0, K, body, jnp.zeros((), b.dtype))

    t1 = best_of(lambda: run(b, M, jnp.int32(1)), lambda r: np.asarray(r),
                 reps)
    tK = best_of(lambda: run(b, M, jnp.int32(K)), lambda r: np.asarray(r),
                 reps)
    return (tK - t1) / (K - 1), t1


def build(nz, eps_w=1e-4, shift=5e-5, dtype=np.float32):
    # eps_w=1e-4 / shift=5e-5 (CPU-swept): CG needs 604 iterations, the
    # IC(0) line-solve factor needs 6 — a 101x cut against the measured
    # ~26x apply:matvec cost ratio.  The milder eps_w=1e-3 point (28x
    # cut) sits exactly AT crossover (1.07x) — both recorded.
    ny = nx = 8
    ones = np.ones((nz, ny, nx))
    czm = czp = -1.0 * ones
    cxm = cxp = cym = cyp = -eps_w * ones
    c0 = -(czm + czp + cxm + cxp + cym + cyp) + shift * ones
    return Stencil3DOperator(nz, ny, nx, c0, cxm, cxp, cym, cyp, czm, czp,
                             dtype=dtype)


def main():
    dev = jax.devices()[0]
    out("device", platform=dev.platform, kind=str(dev))

    nz = 2048
    A = build(nz)
    n = A.shape[0]
    rng = np.random.default_rng(11)
    x_true = rng.uniform(1.0, 2.0, n).astype(np.float32)
    b = jnp.asarray(np.asarray(A.mv(jnp.asarray(x_true))))

    # f32-reachable tolerance (squared-norm ratio).
    p = SolverParams(epsilon=1e-10, max_iterations=40000)

    # ---- iteration counts -------------------------------------------------
    r_cg = lcg.solve(A, b, method="cg", params=p, pallas="never")
    np.asarray(r_cg.x[:2])
    it_cg = int(r_cg.iterations)
    Mj = lcg.JacobiPreconditioner(A)
    r_j = lcg.solve(A, b, method="pcg", M=Mj, params=p, pallas="never")
    it_j = int(r_j.iterations)
    out("counts_cg_jacobi", n=n, cg=it_cg, jacobi_pcg=it_j,
        cg_status=int(r_cg.status_code),
        cg_err=float(np.max(np.abs(np.asarray(r_cg.x) - x_true))))

    rows, cols, vals = A.to_coo()
    t0 = time.time()
    fac = incomplete_cholesky_coo(n, rows, cols, vals)
    factor_s = time.time() - t0
    bandwidth = int((fac.l_rows - fac.l_cols).max())

    ic_results = {}
    for blk in (128,):   # m=512 measured WORSE (1098 vs 819 us/iter: the
                         # bigger batched-GEMV dinv einsum dominates)
        Mic = fac.preconditioner(mode="blocked", block=blk,
                                 dtype=jnp.float32)
        r_ic = lcg.solve(A, b, method="pcg", M=Mic, params=p,
                         pallas="never")
        it_ic = int(r_ic.iterations)
        err = float(np.max(np.abs(np.asarray(r_ic.x) - x_true)))
        ic_results[blk] = (Mic, it_ic)
        out(f"ic_converge_m{blk}", iterations=it_ic,
            status=int(r_ic.status_code), err=err,
            factor_s=round(factor_s, 2), bandwidth=bandwidth)

    # ---- device slopes (fixed iterations) ---------------------------------
    iters_fix = 64
    pf = SolverParams(epsilon=1e-30, max_iterations=iters_fix)

    def one_cg(bv):
        return cg_engine(A, bv, params=pf)["x"]

    dev_s, _ = slope(one_cg, b, K=16)
    cg_us = dev_s * 1e6 / iters_fix
    out("cg_slope", us_per_iter=round(cg_us, 2), fixed_iters=iters_fix)

    def one_j(bv):
        return pcg_engine(A, bv, M=Mj, params=pf)["x"]

    dev_s, _ = slope(one_j, b, K=16)
    j_us = dev_s * 1e6 / iters_fix
    out("jacobi_slope", us_per_iter=round(j_us, 2))

    summary = {"n": n, "cg_iters": it_cg, "jacobi_iters": it_j,
               "cg_us_per_iter": round(cg_us, 2),
               "cg_device_ms_to_eps": round(cg_us * it_cg / 1e3, 3)}
    iters_fix_ic = 16
    pfi = SolverParams(epsilon=1e-30, max_iterations=iters_fix_ic)

    def one_ic(bv, Mic):
        return pcg_engine(A, bv, M=Mic, params=pfi)["x"]

    from liblcg_tpu.precond.blocked_tri import blocked_triangular_solve

    def one_ic_seq(bv, Mic):
        def apply_seq(x):
            y = blocked_triangular_solve(Mic.lower, x, parallel=False)
            return blocked_triangular_solve(Mic.upper, y, parallel=False)

        return pcg_engine(A, bv, M=apply_seq, params=pfi)["x"]

    for blk, (Mic, it_ic) in ic_results.items():
        dev_s, _ = slope(one_ic, b, K=8, M=Mic)
        ic_us = dev_s * 1e6 / iters_fix_ic
        out(f"ic_slope_m{blk}", us_per_iter=round(ic_us, 2),
            fixed_iters=iters_fix_ic, apply="associative-scan")
        if blk == 128:
            dev_s, _ = slope(one_ic_seq, b, K=8, M=Mic)
            out(f"ic_slope_m{blk}_seq",
                us_per_iter=round(dev_s * 1e6 / iters_fix_ic, 2),
                apply="sequential-scan")
        summary[f"ic_m{blk}_iters"] = it_ic
        summary[f"ic_m{blk}_us_per_iter"] = round(ic_us, 2)
        summary[f"ic_m{blk}_device_ms_to_eps"] = round(ic_us * it_ic / 1e3, 3)
        summary[f"ic_m{blk}_speedup_vs_cg"] = round(
            (cg_us * it_cg) / (ic_us * it_ic), 2)
        summary[f"ic_m{blk}_cost_ratio"] = round(ic_us / cg_us, 2)

    # Crossover rule: blocked IC wins iff the iteration cut exceeds the
    # per-iteration cost ratio.
    out("summary", **summary)
    out("done", ok=True)


if __name__ == "__main__":
    main()
