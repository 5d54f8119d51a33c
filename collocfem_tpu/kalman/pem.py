"""Prediction-error-method (ML) parameter estimation from filter innovations.

The filtering counterpart of the collocation estimators: the exact
(Gaussian) likelihood of the data is the product of innovation densities,
which every filter in this subpackage already accumulates (``loglik``).
Because the filters are pure ``lax.scan`` programs, the NLL is
differentiable end-to-end — reverse-mode AD through the scan replaces the
reference lineage's hand-derived likelihood gradients — and minimized
on-device with an L-BFGS ``while_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from collocfem_tpu.kalman.disc import discretize_lti
from collocfem_tpu.kalman.filtering import ekf_filter, kalman_filter, ukf_filter


def make_lti_nll(build, ts, ys, mask=None):
    """NLL for a parameterized linear-Gaussian model.

    ``build(p) -> (A, Qc, H, R, m0, P0)`` defines the model; sampling
    times ``ts`` may be irregular (exact Van Loan discretization per
    interval).  Returns a jittable ``nll(p)`` (scalar, differentiable).
    """
    ts = jnp.asarray(ts)
    ys = jnp.asarray(ys)
    dts = jnp.diff(ts, prepend=ts[:1])

    def nll(p):
        A, Qc, H, R, m0, P0 = build(p)
        Ad, Qd = discretize_lti(A, Qc, dts)
        res = kalman_filter(Ad, Qd, H, R, ys, m0, P0, mask=mask)
        return -res.loglik

    return nll


def make_ekf_nll(model, ts, ys, R, Qc, m0, P0, u=None, substeps: int = 4,
                 mask=None):
    """NLL(p) for a nonlinear Model via the continuous-discrete EKF."""

    def nll(p):
        res = ekf_filter(model, p, ts, ys, R, Qc, m0, P0, u=u,
                         substeps=substeps, mask=mask)
        return -res.loglik

    return nll


def make_ukf_nll(model, ts, ys, R, Qc, m0, P0, u=None, substeps: int = 4,
                 mask=None, alpha: float = 1.0, beta: float = 2.0,
                 kappa: float = 0.0):
    """NLL(p) via the continuous-discrete UKF (derivative-free moments).

    Same contract as :func:`make_ekf_nll`; prefer it when the dynamics are
    strongly nonlinear over a sampling interval (the unscented transform
    captures third-order odd-moment effects the EKF linearization drops).
    Differentiable: sigma-point propagation is smooth in ``p``.
    """

    def nll(p):
        res = ukf_filter(model, p, ts, ys, R, Qc, m0, P0, u=u,
                         substeps=substeps, mask=mask, alpha=alpha,
                         beta=beta, kappa=kappa)
        return -res.loglik

    return nll


def run_lbfgs(fun, x0, maxiter: int = 100, gtol: float = 1e-8):
    """Minimize a jittable scalar ``fun`` with optax L-BFGS, fully jitted.

    Returns (x, stats) with stats = (value, grad_norm, iterations).
    """
    import optax

    x0 = jnp.asarray(x0)
    opt = optax.lbfgs()
    vg = optax.value_and_grad_from_state(fun)

    def cond(carry):
        x, state, it, gnorm = carry
        return jnp.logical_and(it < maxiter, gnorm > gtol)

    def body(carry):
        x, state, it, _ = carry
        value, grad = vg(x, state=state)
        updates, state = opt.update(
            grad, state, x, value=value, grad=grad, value_fn=fun)
        x = optax.apply_updates(x, updates)
        return x, state, it + 1, jnp.linalg.norm(grad)

    state0 = opt.init(x0)
    x, state, it, gnorm = jax.lax.while_loop(
        cond, body, (x0, state0, jnp.asarray(0), jnp.asarray(jnp.inf,
                                                             x0.dtype)))
    return x, (fun(x), gnorm, it)
