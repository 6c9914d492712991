"""TPU performance paths: the accelerator counterpart of the reference's
CUDA samples 8-14 (sample8.cu CG/CGS/PCG on case_10K CSR; sample10-14
preconditioned complex solves on the GPU).

Demonstrates, on the shipped ``data/case_10K`` system and a synthetic
complex-symmetric banded system:

1. the whole-solve VMEM Pallas kernels, auto-routed by ``solve`` /
   ``solve_batched`` for f32 banded systems (``pallas="auto"``);
2. Jacobi-PCG through the same kernel (the reference's sample8/sample10
   preconditioned path);
3. batched multi-RHS solving — 32 systems in one kernel (the reference
   can only solve serially, lcg.h:61);
4. complex-on-TPU via the interleaved realified DIA form (the
   clcg_cuda.cu capability on a backend with no complex dtypes).

On a CPU backend the pallas routing falls back to the XLA engines
automatically — the script runs anywhere.
"""

import _bootstrap  # noqa: F401  (checkout-run import path; no-op when installed)

import sys
import time

import numpy as np
import jax

if "--cpu" in sys.argv:
    # Env-var platform selection can be preempted by a sitecustomize that
    # imports jax first; the config route always works.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import liblcg_tpu as lcg
from liblcg_tpu.utils import io

DATA = "/root/reference/data"


def main():
    jax.config.update("jax_enable_x64", True)
    on_tpu = jax.devices()[0].platform != "cpu"
    print(f"backend: {jax.devices()[0]} (pallas kernels "
          f"{'active' if on_tpu else 'fall back to XLA engines'})")

    # -- 1/2: case_10K through the VMEM kernels ---------------------------
    s = io.read_system(f"{DATA}/case_10K_A")
    answer = io.read_answer(f"{DATA}/case_10K_B")
    A = lcg.make_sparse_operator(s.n, s.n, s.rows, s.cols, s.vals,
                                 dtype=jnp.float32)
    b = jnp.asarray(s.b, jnp.float32)
    params = lcg.SolverParams(epsilon=1e-11)

    for label, kw in (("cg   (auto-pallas)", {}),
                      ("pcg  (auto-pallas, Jacobi)",
                       dict(method="pcg", M=lcg.JacobiPreconditioner(A)))):
        t0 = time.perf_counter()
        res = lcg.solve(A, b, params=params, **kw)
        np.asarray(res.x[:4])
        ms = (time.perf_counter() - t0) * 1e3
        err = np.sqrt(np.sum((np.asarray(res.x, np.float64) - answer) ** 2)) / s.n
        print(f"{label:28s} {res.status.name:12s} iters={int(res.iterations):4d} "
              f"avg_err={err:.2e}  wall={ms:7.1f} ms (incl. compile/dispatch)")

    # -- 3: batched multi-RHS --------------------------------------------
    nrhs = 32
    B = jnp.stack([b * (1.0 + 0.01 * i) for i in range(nrhs)])
    t0 = time.perf_counter()
    rb = lcg.solve_batched(A, B, params=params)
    np.asarray(rb.x[0, :4])
    ms = (time.perf_counter() - t0) * 1e3
    it = np.asarray(rb.iterations)
    print(f"batched x{nrhs:2d} (one kernel)      iters={it.min()}..{it.max()} "
          f"wall={ms:7.1f} ms total = {ms / nrhs:5.2f} ms/solve")

    # -- 3b: block CG — one SHARED block Krylov space for distinct RHS:
    #        fewer iterations (the block deflates the small eigenvalues),
    #        Gram reductions as MXU matmuls (solvers/block.py).
    Bd = jnp.asarray(np.vstack(
        [np.asarray(b)]
        + [np.random.default_rng(i).standard_normal(s.n)
           for i in range(nrhs - 1)]))
    rbat = lcg.solve_batched(A, Bd, method="cg", params=params,
                             pallas="never")
    t0 = time.perf_counter()
    rblk = lcg.solve_batched(A, Bd, method="block_cg", params=params)
    np.asarray(rblk.x[0, :4])
    ms = (time.perf_counter() - t0) * 1e3
    print(f"block CG x{nrhs:2d} (shared space) "
          f"iters={int(np.max(rblk.iterations))} vs batched "
          f"{int(np.max(rbat.iterations))}  wall={ms:7.1f} ms")

    # -- 4: complex-symmetric banded via interleaved realified DIA --------
    n = 50_000
    rng = np.random.default_rng(5)
    main_d = (4.0 + rng.uniform(0, 1, n)) + 1j * (0.5 + rng.uniform(0, 0.5, n))
    off = rng.uniform(-1, 1, n - 1) + 1j * rng.uniform(-0.3, 0.3, n - 1)
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([main_d, off, off])
    x_true = rng.uniform(1, 2, n) + 1j * rng.uniform(-1, 1, n)
    bc = np.zeros(n, dtype=complex)
    np.add.at(bc, rows, vals * x_true[cols])

    r2, c2, v2 = lcg.realify_coo(rows, cols, vals)
    A2 = lcg.make_sparse_operator(2 * n, 2 * n, r2, c2, v2)
    b2 = jnp.asarray(lcg.split_complex_interleaved(bc))
    t0 = time.perf_counter()
    res = lcg.solve(A2, b2, method="cgs",
                    params=lcg.SolverParams(epsilon=1e-24))
    np.asarray(res.x[:4])
    ms = (time.perf_counter() - t0) * 1e3
    x = lcg.merge_complex_interleaved(res.x)
    err = np.max(np.abs(x - x_true))
    print(f"complex {n} (realified DIA)  {res.status.name:12s} "
          f"iters={int(res.iterations):4d} max_err={err:.2e}  wall={ms:7.1f} ms")
    assert err < 1e-6

    # -- 5: s-step communication-avoiding CG (solvers/sstep.py) -----------
    # s iterations per Chebyshev-basis build, two reduction rounds per
    # block (vs classic CG's two per iteration); on stencil operators the
    # fused Pallas powers+Gram kernel builds basis AND Gram in one sweep.
    g = 32
    AL = lcg.Laplacian3DOperator(g, g, g, dtype=jnp.float32)
    bL = jnp.ones((g ** 3,), jnp.float32)
    t0 = time.perf_counter()
    res = lcg.solve(AL, bL, method="cacg", s=4,
                    params=lcg.SolverParams(epsilon=1e-10))
    np.asarray(res.x[:4])
    ms = (time.perf_counter() - t0) * 1e3
    ref = lcg.solve(AL, bL, method="cg", pallas="never",
                    params=lcg.SolverParams(epsilon=1e-10))
    print(f"cacg s=4 Laplacian {g}^3     {res.status.name:12s} "
          f"iters={int(res.iterations):4d} (classic cg: "
          f"{int(ref.iterations)})  wall={ms:7.1f} ms")
    assert res.converged

    # -- 6: Jacobi-preconditioned cacg on a shifted anisotropic stencil --
    # The reference's flagship accelerated path is Jacobi/IC PCG
    # (sample8.cu:216-236, sample10.cu:193); cacg composes with Jacobi
    # by symmetric diagonal scaling (solve.py:_solve_cacg_jacobi), and
    # constant-coefficient stencils route through the same storeless
    # Pallas stepper as the Laplacian (ops/pallas_powers.py).
    ones = np.ones(g ** 3, np.float32)
    AS = lcg.Stencil3DOperator(g, g, g, 8.5 * ones, -1.0 * ones,
                               -1.0 * ones, -0.5 * ones, -0.5 * ones,
                               -2.0 * ones, -2.0 * ones, dtype=np.float32)
    MS = lcg.JacobiPreconditioner(AS)
    t0 = time.perf_counter()
    res = lcg.solve(AS, bL, method="cacg", s=4, M=MS,
                    params=lcg.SolverParams(epsilon=1e-10))
    np.asarray(res.x[:4])
    ms = (time.perf_counter() - t0) * 1e3
    tr = float(jnp.linalg.norm(bL - AS.mv(res.x)) / jnp.linalg.norm(bL))
    print(f"cacg+Jacobi stencil {g}^3    {res.status.name:12s} "
          f"iters={int(res.iterations):4d} true_rel_res={tr:.2e}  "
          f"wall={ms:7.1f} ms")
    assert res.converged and tr < 1e-4
    print("SAMPLE8 OK")


if __name__ == "__main__":
    main()
