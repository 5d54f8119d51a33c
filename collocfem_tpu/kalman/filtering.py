"""Kalman filters and fixed-interval smoothers as ``lax.scan`` recursions.

Linear KF (exact, for LTI + Van Loan discretization) and continuous-
discrete EKF/UKF for nonlinear :class:`collocfem_tpu.model.Model` dynamics
(mean/covariance integrated by fixed-substep RK4 between irregular sample
times — static shapes, no adaptive stepping, so the whole filter jits and
vmaps over experiments).

All filters return a :class:`FilterResult` whose ``crosscov[k]`` is the
cross-covariance Cov(x_{k-1}^f, x_k^p); the single backward pass
:func:`cd_smoother` turns any of them into a fixed-interval (RTS /
unscented RTS) smoother via the gain G_k = crosscov[k+1] @ cov_p[k+1]^{-1}.

Conventions: ``y`` is (T, ny) at strictly increasing times ``ts``; the
prior (m0, P0) is the *predicted* state at ts[0] (updated by y[0]).
Inputs ``u`` (T, nu) are zero-order-hold: u[k-1] acts on (ts[k-1], ts[k]].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve


class FilterResult(NamedTuple):
    """Forward-pass moments. Shapes: means (T, nx), covs (T, nx, nx)."""

    mean_f: jnp.ndarray   # posterior (filtered) means
    cov_f: jnp.ndarray
    mean_p: jnp.ndarray   # one-step predicted means
    cov_p: jnp.ndarray
    crosscov: jnp.ndarray  # Cov(x_{k-1}^f, x_k^p); [0] is zeros
    loglik: jnp.ndarray   # scalar: sum of innovation log densities


def _sym(P):
    return 0.5 * (P + jnp.swapaxes(P, -1, -2))


def _update(m_p, P_p, H, R, y, mask):
    """Measurement update + innovation log density (masked)."""
    e = y - H @ m_p
    S = H @ P_p @ H.T + R
    cf = cho_factor(S, lower=True)
    K = cho_solve(cf, H @ P_p).T            # P_p H^T S^{-1}
    m_f = m_p + mask * (K @ e)
    P_f = _sym(P_p - mask * (K @ S @ K.T))
    ny = y.shape[0]
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(cf[0])))
    ll = -0.5 * (e @ cho_solve(cf, e) + logdet
                 + ny * jnp.log(2.0 * jnp.pi))
    return m_f, P_f, mask * ll


def _bcast_time(M, T):
    M = jnp.asarray(M)
    return jnp.broadcast_to(M, (T,) + M.shape[-2:]) if M.ndim == 2 else M


def kalman_filter(Ad, Qd, H, R, y, m0, P0, mask=None) -> FilterResult:
    """Linear (discrete) Kalman filter.

    Ad, Qd: (T, nx, nx) transitions INTO step k (use Ad[0]=I, Qd[0]=0, e.g.
    from :func:`collocfem_tpu.kalman.disc.discretize_lti` with dts[0]=0).
    H, R may be (ny, nx)/(ny, ny) or time-varying with a leading T axis.
    ``mask`` (T,) in {0,1} skips the update (and its loglik term) where 0.
    """
    y = jnp.asarray(y)
    T = y.shape[0]
    H = _bcast_time(H, T)
    R = _bcast_time(R, T)
    mask = jnp.ones(T, y.dtype) if mask is None else jnp.asarray(mask, y.dtype)
    m0 = jnp.asarray(m0)
    P0 = jnp.asarray(P0)

    def step(carry, inp):
        m, P = carry
        A_k, Q_k, H_k, R_k, y_k, mk = inp
        m_p = A_k @ m
        P_p = _sym(A_k @ P @ A_k.T + Q_k)
        C_k = P @ A_k.T
        m_f, P_f, ll = _update(m_p, P_p, H_k, R_k, y_k, mk)
        return (m_f, P_f), (m_f, P_f, m_p, P_p, C_k, ll)

    # Step 0 consumes (Ad[0], Qd[0]) = (I, 0): m_p[0] = m0, P_p[0] = P0.
    (_, _), (m_f, P_f, m_p, P_p, C, ll) = jax.lax.scan(
        step, (m0, P0), (Ad, Qd, H, R, y, mask)
    )
    return FilterResult(m_f, P_f, m_p, P_p, C, jnp.sum(ll))


def rts_smoother(res: FilterResult):
    """Fixed-interval smoother for any FilterResult. Alias of cd_smoother."""
    return cd_smoother(res)


def cd_smoother(res: FilterResult):
    """Backward (RTS-form) pass: returns smoothed (means (T,nx), covs).

    Works for the linear KF, the CD-EKF and the CD-UKF alike because the
    forward pass records the filter's own cross-covariance — the smoother
    gain is G_k = crosscov[k+1] @ cov_p[k+1]^{-1} in every case (for the
    linear/EKF filters crosscov = P_f Phi^T, recovering classic RTS; for
    the UKF it is the sigma-point cross-covariance, giving the unscented
    RTS smoother).
    """

    def step(carry, inp):
        ms_next, Ps_next = carry
        m_f, P_f, m_p1, P_p1, C1 = inp
        cf = cho_factor(P_p1, lower=True)
        G = cho_solve(cf, C1.T).T           # C1 @ P_p1^{-1}
        ms = m_f + G @ (ms_next - m_p1)
        Ps = _sym(P_f + G @ (Ps_next - P_p1) @ G.T)
        return (ms, Ps), (ms, Ps)

    # inp[k] pairs step k's posterior with step k+1's prediction/crosscov.
    inps = (res.mean_f[:-1], res.cov_f[:-1], res.mean_p[1:],
            res.cov_p[1:], res.crosscov[1:])
    init = (res.mean_f[-1], res.cov_f[-1])
    _, (ms, Ps) = jax.lax.scan(step, init, inps, reverse=True)
    ms = jnp.concatenate([ms, res.mean_f[-1:]], axis=0)
    Ps = jnp.concatenate([Ps, res.cov_f[-1:]], axis=0)
    return ms, Ps


# ---------------------------------------------------------------------------
# Continuous-discrete EKF
# ---------------------------------------------------------------------------


def _prep_nonlinear(model, p, ts, ys, u, R, mask):
    ys = jnp.asarray(ys)
    T = ys.shape[0]
    ts = jnp.asarray(ts, ys.dtype)
    u = jnp.zeros((T, model.nu), ys.dtype) if u is None else jnp.asarray(u)
    R = _bcast_time(R, T)
    mask = (jnp.ones(T, ys.dtype) if mask is None
            else jnp.asarray(mask, ys.dtype))
    p = jnp.asarray(p)
    dts = jnp.diff(ts, prepend=ts[:1])      # dts[0] = 0
    # Zero-order hold: the input acting on (ts[k-1], ts[k]] is u[k-1].
    u_prev = jnp.roll(u, 1, axis=0)
    t_left = ts - dts
    return ys, T, ts, u, u_prev, t_left, dts, R, mask, p


def ekf_filter(model, p, ts, ys, R, Qc, m0, P0, u=None, substeps: int = 4,
               mask=None) -> FilterResult:
    """Continuous-discrete extended Kalman filter for a Model.

    Between samples, (m, P, Phi) follow the moment ODEs
    m' = f(m), P' = A P + P A^T + Qc, Phi' = A Phi with A = df/dx along
    the mean, integrated with ``substeps`` fixed RK4 steps (static shapes;
    jits; vmap over experiments).  Update linearizes h at the predicted
    mean.  Qc is the continuous process-noise density (nx, nx).
    """
    ys, T, ts, u, u_prev, t_left, dts, R, mask, p = _prep_nonlinear(
        model, p, ts, ys, u, R, mask)
    Qc = jnp.asarray(Qc)
    nx = model.nx
    eye = jnp.eye(nx, dtype=ys.dtype)
    fjac = jax.jacfwd(model.f, argnums=0)
    hjac = jax.jacfwd(lambda x, uu, tt: model.h(x, uu, p, tt), argnums=0)

    def moment_ode(state, uu, tt):
        m, P, Phi = state
        A = fjac(m, uu, p, tt)
        return (model.f(m, uu, p, tt),
                A @ P + P @ A.T + Qc,
                A @ Phi)

    def rk4(state, uu, t0, h):
        def add(s, k, c):
            return tuple(si + c * ki for si, ki in zip(s, k))

        k1 = moment_ode(state, uu, t0)
        k2 = moment_ode(add(state, k1, h / 2), uu, t0 + h / 2)
        k3 = moment_ode(add(state, k2, h / 2), uu, t0 + h / 2)
        k4 = moment_ode(add(state, k3, h), uu, t0 + h)
        return tuple(
            s + (h / 6) * (a + 2 * b + 2 * c + d)
            for s, a, b, c, d in zip(state, k1, k2, k3, k4)
        )

    def step(carry, inp):
        m, P = carry
        y_k, u_k, uprev_k, tl_k, t_k, dt_k, R_k, mk = inp
        h = dt_k / substeps

        def sub(i, st):
            return rk4(st, uprev_k, tl_k + i * h, h)

        m_p, P_p, Phi = jax.lax.fori_loop(
            0, substeps, sub, (m, P, eye))
        P_p = _sym(P_p)
        C_k = P @ Phi.T
        H_k = hjac(m_p, u_k, t_k)
        e_bias = model.h(m_p, u_k, p, t_k) - H_k @ m_p
        m_f, P_f, ll = _update(m_p, P_p, H_k, R_k, y_k - e_bias, mk)
        return (m_f, P_f), (m_f, P_f, m_p, P_p, C_k, ll)

    init = (jnp.asarray(m0), jnp.asarray(P0))
    _, (m_f, P_f, m_p, P_p, C, ll) = jax.lax.scan(
        step, init, (ys, u, u_prev, t_left, ts, dts, R, mask))
    return FilterResult(m_f, P_f, m_p, P_p, C, jnp.sum(ll))


# ---------------------------------------------------------------------------
# Continuous-discrete UKF
# ---------------------------------------------------------------------------


def _sigma_points(m, P, lam):
    """(2nx+1, nx) symmetric sigma set; scaled Cholesky of (nx+lam) P."""
    nx = m.shape[0]
    L = jnp.linalg.cholesky(_sym(P) + 1e-300 * jnp.eye(nx, dtype=P.dtype))
    S = jnp.sqrt(nx + lam) * L.T            # rows are scaled sqrt directions
    return jnp.concatenate([m[None, :], m + S, m - S], axis=0)


def _ut_weights(nx, alpha, beta, kappa, dtype):
    lam = alpha * alpha * (nx + kappa) - nx
    wm = jnp.full(2 * nx + 1, 1.0 / (2 * (nx + lam)), dtype)
    wm = wm.at[0].set(lam / (nx + lam))
    wc = wm.at[0].add(1.0 - alpha * alpha + beta)
    return lam, wm, wc


def ukf_filter(model, p, ts, ys, R, Qc, m0, P0, u=None, substeps: int = 4,
               mask=None, alpha: float = 1.0, beta: float = 2.0,
               kappa: float = 0.0) -> FilterResult:
    """Continuous-discrete unscented Kalman filter.

    One sigma set per interval is drawn at the posterior and RK4-integrated
    through the dynamics (vmapped); the additive process noise is
    integrated alongside via dQd/dt = A Qd + Qd A^T + Qc linearized at the
    sigma mean, so the noise contribution matches the EKF's to the same
    order while the deterministic flow is handled derivative-free to UT
    accuracy.  The recorded sigma cross-covariance makes
    :func:`cd_smoother` the unscented RTS smoother.
    """
    ys, T, ts, u, u_prev, t_left, dts, R, mask, p = _prep_nonlinear(
        model, p, ts, ys, u, R, mask)
    Qc = jnp.asarray(Qc)
    nx = model.nx
    lam, wm, wc = _ut_weights(nx, alpha, beta, kappa, ys.dtype)
    fjac = jax.jacfwd(model.f, argnums=0)
    fv = jax.vmap(model.f, in_axes=(0, None, None, None))

    def ode(state, uu, tt):
        X, Qd = state
        mbar = wm @ X
        A = fjac(mbar, uu, p, tt)
        return fv(X, uu, p, tt), A @ Qd + Qd @ A.T + Qc

    def rk4(state, uu, t0, h):
        k1 = ode(state, uu, t0)
        k2 = ode((state[0] + h / 2 * k1[0], state[1] + h / 2 * k1[1]),
                 uu, t0 + h / 2)
        k3 = ode((state[0] + h / 2 * k2[0], state[1] + h / 2 * k2[1]),
                 uu, t0 + h / 2)
        k4 = ode((state[0] + h * k3[0], state[1] + h * k3[1]), uu, t0 + h)
        return (state[0] + (h / 6) * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0]),
                state[1] + (h / 6) * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]))

    hv = jax.vmap(lambda x, uu, tt: model.h(x, uu, p, tt),
                  in_axes=(0, None, None))

    def step(carry, inp):
        m, P = carry
        y_k, u_k, uprev_k, tl_k, t_k, dt_k, R_k, mk = inp
        h = dt_k / substeps
        X0 = _sigma_points(m, P, lam)

        def sub(i, st):
            return rk4(st, uprev_k, tl_k + i * h, h)

        X1, Qd = jax.lax.fori_loop(
            0, substeps, sub, (X0, jnp.zeros_like(P)))
        m_p = wm @ X1
        dX1 = X1 - m_p
        P_p = _sym(jnp.einsum("i,ij,ik->jk", wc, dX1, dX1) + Qd)
        dX0 = X0 - m
        C_k = jnp.einsum("i,ij,ik->jk", wc, dX0, dX1)

        # Measurement UT on a fresh sigma set at the prediction.
        Xm = _sigma_points(m_p, P_p, lam)
        Y = hv(Xm, u_k, t_k)
        yhat = wm @ Y
        dY = Y - yhat
        dXm = Xm - m_p
        S = jnp.einsum("i,ij,ik->jk", wc, dY, dY) + R_k
        Pxy = jnp.einsum("i,ij,ik->jk", wc, dXm, dY)
        cf = cho_factor(S, lower=True)
        K = cho_solve(cf, Pxy.T).T
        e = y_k - yhat
        m_f = m_p + mk * (K @ e)
        P_f = _sym(P_p - mk * (K @ S @ K.T))
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(cf[0])))
        ll = mk * (-0.5) * (e @ cho_solve(cf, e) + logdet
                            + y_k.shape[0] * jnp.log(2.0 * jnp.pi))
        return (m_f, P_f), (m_f, P_f, m_p, P_p, C_k, ll)

    init = (jnp.asarray(m0), jnp.asarray(P0))
    _, (m_f, P_f, m_p, P_p, C, ll) = jax.lax.scan(
        step, init, (ys, u, u_prev, t_left, ts, dts, R, mask))
    return FilterResult(m_f, P_f, m_p, P_p, C, jnp.sum(ll))
