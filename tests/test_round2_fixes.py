"""Regression tests for the round-2 review findings (ADVICE.md / VERDICT.md):
constructor side effects, OO-class compile caching, and the open-bound
``set2box`` projection (algebra.cpp:50-58)."""

import jax.numpy as jnp
import numpy as np
import pytest

import liblcg_tpu as lcg
from liblcg_tpu import set2box
from liblcg_tpu.parallel import Stencil3DOperator


def test_stencil_constructor_does_not_mutate_caller_arrays():
    nz, ny, nx = 3, 4, 5
    n = nz * ny * nx
    c0 = np.full(n, 6.0)
    cxm = np.full(n, -1.0)
    others = [np.full(n, -1.0) for _ in range(5)]
    cxm_before = cxm.copy()
    Stencil3DOperator(nz, ny, nx, c0, cxm, *others)
    # The operator zeroes out-of-domain faces internally; the caller's
    # array must be untouched.
    np.testing.assert_array_equal(cxm, cxm_before)


def test_progress_override_compiles_once(spd_small):
    """A subclass overriding Progress must hit the jit cache on repeated
    Minimize calls — the monitor wrapper is memoized per instance, so the
    traced Progress body runs only on the first compilation."""
    A, b, _ = spd_small
    traces = []

    class S(lcg.LCGSolver):
        def AxProduct(self, x):
            return jnp.asarray(A) @ x

        def Progress(self, x, r, t):
            traces.append(1)  # executes at trace time only
            return False

    s = S().silent()
    s.Minimize(b, method="cg")
    n_first = len(traces)
    assert n_first >= 1
    s.Minimize(b, method="cg")
    assert len(traces) == n_first  # second call: no retrace


def test_set2box_inclusive_matches_clip():
    a = jnp.asarray([-2.0, 0.5, 3.0, 1.0, 2.0])
    out = set2box(1.0, 2.0, a)
    np.testing.assert_allclose(np.asarray(out), np.clip(np.asarray(a), 1.0, 2.0))


def test_set2box_exclusive_bounds():
    # Bounds small enough that the reference's fixed 1e-16 shift is
    # representable (at |bound| >= ~1 the shift is sub-ULP in f64 and the
    # exclusive mode degenerates to the inclusive one — faithful parity).
    low, hig = 0.0, 0.25
    a = jnp.asarray([-1.0, 0.0, 0.1, 0.25, 5.0])
    out = np.asarray(set2box(low, hig, a, low_bound=False, hig_bound=False))
    assert out[0] > low                                # below low -> just inside
    assert out[1] > low                                # at low -> just inside
    assert out[2] == 0.1                               # interior unchanged
    assert out[3] < hig                                # at hig -> just inside
    assert out[4] < hig                                # above hig -> just inside
    # Exact reference arithmetic: low + 1e-16 / hig - 1e-16.
    np.testing.assert_allclose(out[1], low + 1e-16)
    np.testing.assert_allclose(out[3], hig - 1e-16)


def test_set2box_value_inside_shrunken_window_passes_through():
    # The reference's piecewise rule: a value in (hig - 1e-16, hig) is NOT
    # clamped (only a >= hig is), unlike clipping to the shrunken interval.
    hig = 1.0
    a = jnp.asarray([np.nextafter(hig, 0.0)])
    out = np.asarray(set2box(0.0, hig, a, hig_bound=False))
    np.testing.assert_array_equal(out, np.asarray(a))


@pytest.mark.parametrize("method", ["pg", "spg"])
def test_constrained_solve_with_exclusive_bounds(spd_small, method):
    A, b, x_true = spd_small
    n = len(b)
    params = lcg.SolverParams(epsilon=1e-10, max_iterations=5000, step=0.01)
    res = lcg.solve(A, b, method=method, lower=np.ones(n), upper=2 * np.ones(n),
                    params=params, lower_inclusive=False, upper_inclusive=False)
    x = np.asarray(res.x)
    # Strictly inside the box, and still converging to the true solution
    # (which lies in [1, 2]) up to the boundary epsilon.
    assert np.all(x > 1.0 - 1e-12) and np.all(x < 2.0 + 1e-12)
    np.testing.assert_allclose(x, x_true, atol=5e-2)
