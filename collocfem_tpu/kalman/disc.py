"""Exact discretization of LTI stochastic dynamics (Van Loan's method).

Given x' = A x + w with continuous process-noise density Qc, the sampled
process x_{k+1} = Ad x_k + w_k, Cov(w_k) = Qd is obtained from one matrix
exponential of the 2nx x 2nx block matrix

    M = [[A, Qc], [0, -A^T]] * dt,   expm(M) = [[Ad, X], [0, Ad^{-T}]],

whence Qd = X @ Ad^T (Van Loan 1978).  Differentiable (``jax.scipy``'s
expm is a Pade/squaring implementation with defined JVPs) and vmappable
over dt for irregular sample grids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import expm


def van_loan(A, Qc, dt):
    """Exact (Ad, Qd) for one interval ``dt``. A, Qc: (nx, nx)."""
    A = jnp.asarray(A)
    Qc = jnp.asarray(Qc)
    nx = A.shape[0]
    M = jnp.zeros((2 * nx, 2 * nx), dtype=A.dtype)
    M = M.at[:nx, :nx].set(A * dt)
    M = M.at[:nx, nx:].set(Qc * dt)
    M = M.at[nx:, nx:].set(-A.T * dt)
    EM = expm(M)
    Ad = EM[:nx, :nx]
    Qd = EM[:nx, nx:] @ Ad.T
    return Ad, 0.5 * (Qd + Qd.T)


def discretize_lti(A, Qc, dts):
    """Batched exact discretization: dts (T,) -> Ad (T, nx, nx), Qd (T, nx, nx).

    For the filtering convention (transition INTO step k), pass
    ``dts[0] = 0`` to get Ad[0] = I, Qd[0] = 0.
    """
    return jax.vmap(lambda dt: van_loan(A, Qc, dt))(jnp.asarray(dts))
