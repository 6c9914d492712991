"""Shared iteration harness: one compiled ``lax.while_loop`` per solve.

Every one of the reference's 17 engine functions repeats the same skeleton
(see e.g. ``src/lib/lcg.cpp:143-274``): merge params, form r0 = B - A x0,
then loop { progress callback -> epsilon test -> max-iteration test ->
recurrence update -> NaN scan }.  The reference runs that skeleton on the
host, syncing a device scalar back for every dot product in the CUDA backend
(lcg_cuda.cu:515-532) — its chief inefficiency.

Here the *entire* solve is a single XLA computation: the stopping tests,
status bookkeeping, optional monitor, residual trace and NaN guard all live
inside the ``while_loop`` carry, so no scalar ever crosses the host-device
boundary mid-solve.  Solvers plug in three pure functions:

    residual_fn(carry) -> float scalar      (reference lcg.cpp:208-209)
    step_fn(carry) -> carry                 (one recurrence update)
    x_of(carry) -> solution vector          (for the NaN scan / monitor)

Custom-loop solvers (BiCGSTAB2's mid-iteration check, TFQMR's half steps,
SPG's inner backtracking) build their own loops from the same helpers.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..types import SolverParams, Status

Carry = Dict[str, Any]


def real_residual(r_sq: jnp.ndarray, x_sq: jnp.ndarray, n: int, abs_diff: bool):
    """Real-domain stopping metric (lcg.cpp:186-209).

    relative: ||r||^2 / max(||x||^2, 1)   — NOTE: a ratio of *squared* norms.
    abs_diff: sqrt(||r||^2) / n
    """
    if abs_diff:
        return jnp.sqrt(r_sq) / n
    return r_sq / jnp.maximum(x_sq, 1.0)


def complex_residual(r_sq: jnp.ndarray, x_sq: jnp.ndarray, n: int, abs_diff: bool):
    """Complex-domain stopping metric (clcg.cpp:112-147).

    The reference squares the already-squared inner product:
    ``rk_square = |<r,r>|^2 = ||r||^4`` (clcg.cpp:120-121 via clcg_square),
    so the relative test compares ||r||^4 / max(||x||^4, 1) and the abs_diff
    test uses sqrt(||r||^4)/n = ||r||^2 / n.  ``r_sq``/``x_sq`` passed in are
    plain squared norms; the fourth powers are formed here so callers stay
    uniform across domains.
    """
    r4 = r_sq * r_sq
    x4 = x_sq * x_sq
    if abs_diff:
        return jnp.sqrt(r4) / n
    return r4 / jnp.maximum(x4, 1.0)


def sq_norm(v: jnp.ndarray) -> jnp.ndarray:
    """||v||^2 as a real scalar (complex-safe)."""
    if jnp.issubdtype(v.dtype, jnp.complexfloating):
        return jnp.sum(v.real * v.real + v.imag * v.imag)
    return jnp.sum(v * v)


def dot_u(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unconjugated dot  sum_i a_i b_i  (reference ``clcg_dot``,
    lcg_complex.cpp:143-154; for real vectors equals ``lcg_dot``)."""
    return jnp.sum(a * b)


def dot_c(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Conjugated inner product  sum_i conj(a_i) b_i  (reference
    ``clcg_inner``, lcg_complex.cpp:156-167)."""
    if jnp.issubdtype(a.dtype, jnp.complexfloating):
        return jnp.sum(jnp.conj(a) * b)
    return jnp.sum(a * b)


def has_nan(x: jnp.ndarray) -> jnp.ndarray:
    """Reference NaN scan ``m[i] != m[i]`` (lcg.cpp:247-253)."""
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return jnp.any(jnp.isnan(x.real) | jnp.isnan(x.imag))
    return jnp.any(jnp.isnan(x))


def init_trace(trace_len: int, dtype=jnp.float64):
    if trace_len <= 0:
        return None
    return jnp.zeros((trace_len,), dtype=dtype)


def record_trace(trace, t, value):
    if trace is None:
        return None
    L = trace.shape[0]
    return lax.cond(
        t < L,
        lambda tr: tr.at[t].set(value.astype(tr.dtype)),
        lambda tr: tr,
        trace,
    )


def run_loop(
    carry: Carry,
    *,
    residual_fn: Callable[[Carry], jnp.ndarray],
    step_fn: Callable[[Carry], Carry],
    x_of: Callable[[Carry], jnp.ndarray],
    params: SolverParams,
    monitor: Optional[Callable] = None,
    check_initial: bool = True,
) -> Carry:
    """Run the shared solve loop to completion.

    ``carry`` must contain integer ``t`` (iteration counter, starts at 0),
    int32 ``status`` (Status.RUNNING), float ``residual`` and optionally
    ``trace``.  Order of checks matches the reference loop exactly
    (lcg.cpp:206-264): monitor -> convergence -> max-iterations -> update ->
    NaN scan.  The initial ALREADY_OPTIMIZED test (lcg.cpp:186-203) is folded
    in: a solve that converges with t == 0 is relabelled by ``finalize``.
    """
    max_iter = params.effective_max_iterations()
    eps = params.epsilon

    def cond_fn(c):
        return (c["status"] == int(Status.RUNNING)) & (c["t"] <= max_iter)

    def body_fn(c):
        res = residual_fn(c)
        c = dict(c, residual=res)
        if "trace" in c and c["trace"] is not None:
            c["trace"] = record_trace(c["trace"], c["t"], res)

        stop = (
            monitor(x_of(c), res, c["t"])
            if monitor is not None
            else jnp.asarray(False)
        )
        converged = res <= eps
        hit_max = (params.max_iterations > 0) & (c["t"] + 1 > params.max_iterations)

        exit_status = jnp.where(
            stop,
            int(Status.STOP),
            jnp.where(
                converged,
                int(Status.CONVERGENCE),
                jnp.where(
                    hit_max,
                    int(Status.REACHED_MAX_ITERATIONS),
                    int(Status.RUNNING),
                ),
            ),
        ).astype(jnp.int32)

        def do_exit(c):
            return dict(c, status=exit_status)

        def do_step(c):
            c = dict(c, t=c["t"] + 1)
            c = step_fn(c)
            nan = has_nan(x_of(c))
            return dict(
                c,
                status=jnp.where(nan, int(Status.NAN_VALUE), c["status"]).astype(
                    jnp.int32
                ),
            )

        return lax.cond(exit_status == int(Status.RUNNING), do_step, do_exit, c)

    carry = lax.while_loop(cond_fn, body_fn, carry)

    # Loop fell out of the hard cap without a verdict -> REACHED_MAX_ITERATIONS.
    carry["status"] = jnp.where(
        carry["status"] == int(Status.RUNNING),
        int(Status.REACHED_MAX_ITERATIONS),
        carry["status"],
    ).astype(jnp.int32)
    return finalize(carry)


def finalize(carry: Carry) -> Carry:
    """Relabel convergence-at-t=0 as ALREADY_OPTIMIZED (lcg.cpp:186-203)."""
    carry["status"] = jnp.where(
        (carry["status"] == int(Status.CONVERGENCE)) & (carry["t"] == 0),
        int(Status.ALREADY_OPTIMIZED),
        carry["status"],
    ).astype(jnp.int32)
    return carry


def running_status() -> jnp.ndarray:
    return jnp.asarray(int(Status.RUNNING), dtype=jnp.int32)
