"""Linear time-invariant system model.

Not one of the five BASELINE.json configs, but the workhorse for rigorous
validation: for linear-Gaussian dynamics the joint MAP state path computed
by the collocation solver must coincide with the continuous-discrete
Kalman/RTS smoother (tests/test_kalman_parity.py), which checks the
defect/measurement weighting semantics end to end.  Also generally useful
for users with linear submodels.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from collocfem_tpu.model import Model


class LinearSystem(Model):
    """x' = A x + B u,  y = C x, with fixed (known) matrices.

    Set ``estimate_params=True`` to expose the entries of A as unknown
    parameters p (row-major), turning this into a linear system
    identification model.
    """

    def __init__(self, A, B=None, C=None, estimate_params: bool = False):
        A = np.asarray(A, dtype=np.float64)
        nx = A.shape[0]
        B = np.zeros((nx, 0)) if B is None else np.asarray(B, np.float64)
        C = np.eye(nx) if C is None else np.asarray(C, np.float64)
        self.A0, self.B0, self.C0 = jnp.asarray(A), jnp.asarray(B), jnp.asarray(C)
        self.estimate_params = bool(estimate_params)
        self.nx = nx
        self.nu = B.shape[1]
        self.nq = nx * nx if estimate_params else 0

    def _A(self, p):
        if self.estimate_params:
            return p.reshape(self.nx, self.nx)
        return self.A0

    def f(self, x, u, p, t):
        del t
        dx = self._A(p) @ x
        if self.nu:
            dx = dx + self.B0 @ u
        return dx

    def h(self, x, u, p, t):
        del u, p, t
        return self.C0 @ x
