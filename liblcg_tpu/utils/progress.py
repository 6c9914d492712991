"""Live per-iteration progress printing from inside the compiled loop.

The reference's default Progress callback prints
``\\rIteration-times: k  convergence: v`` every ``inter_`` iterations
(solver.cpp:40-54).  Inside a jitted while-loop that requires a host
callback; :func:`make_printer` builds a monitor that emits the same line
via ``jax.debug.callback`` (ordered side effect, zero influence on the
solve) and never requests a stop.  Compose with a stopping predicate via
``make_printer(..., stop=lambda x, r, t: ...)``.

This is opt-in: the default solve path records a residual trace instead
(host callbacks serialize against the device and would throttle the loop).
"""

from __future__ import annotations

import sys
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_printer(
    interval: int = 1,
    *,
    stream=None,
    stop: Optional[Callable] = None,
    fmt: str = "\rIteration-times: {t}\tconvergence: {r:.6e}",
) -> Callable:
    """A monitor printing every ``interval`` iterations (set_report_interval
    semantics, solver.cpp:62).  Returns False (or ``stop(...)``'s result)."""

    def _emit(r, t):
        out = stream if stream is not None else sys.stderr
        print(fmt.format(t=int(t), r=float(r)), end="", file=out, flush=True)

    def monitor(x, residual, t):
        jax.lax.cond(
            (t % interval) == 0,
            lambda: jax.debug.callback(_emit, residual, t, ordered=False),
            lambda: None,
        )
        if stop is not None:
            return stop(x, residual, t)
        return jnp.asarray(False)

    return monitor
