"""Class-based API (reference sample2/sample4): subclass, override
AxProduct/MxProduct/Progress, call Minimize with progress reporting."""

import _bootstrap  # noqa: F401  (checkout-run import path; no-op when installed)


import numpy as np
import jax.numpy as jnp

import liblcg_tpu as lcg


class MySolver(lcg.LCGSolver):
    def __init__(self, A):
        super().__init__()
        self.A = jnp.asarray(A)

    def AxProduct(self, x):
        return self.A @ x

    def MxProduct(self, x):           # Jacobi
        return x / jnp.diagonal(self.A)

    def Progress(self, x, residual, t):
        return t >= 5000              # safety stop


def main():
    rng = np.random.default_rng(0)
    n = 800
    K = rng.uniform(-1, 1, (n, n))
    A = K.T @ K / n + np.eye(n)
    x_true = rng.uniform(1, 2, n)
    b = A @ x_true

    s = MySolver(A).set_report_interval(50)
    s.set_parameters(lcg.SolverParams(epsilon=1e-12))
    res = s.Minimize(b, method="cg")
    print("max_diff:", np.max(np.abs(np.asarray(res.x) - x_true)))
    res = s.MinimizePreconditioned(b)
    print("pcg max_diff:", np.max(np.abs(np.asarray(res.x) - x_true)))


if __name__ == "__main__":
    main()
