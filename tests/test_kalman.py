"""Kalman subpackage: filters/smoothers vs independent numpy recursions,
square-root vs covariance forms, PEM likelihood estimation, smoother warm
starts for the collocation estimator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from collocfem_tpu.kalman import (
    cd_smoother,
    discretize_lti,
    ekf_filter,
    kalman_filter,
    make_lti_nll,
    run_lbfgs,
    smoother_initial_guess,
    sqrt_kalman_filter,
    sqrt_rts_smoother,
    ukf_filter,
    van_loan,
)

A = np.array([[0.0, 1.0], [-4.0, -0.4]])
QC = np.array([[0.0, 0.0], [0.0, 0.15**2]])
H = np.array([[1.0, 0.0]])
R = np.array([[0.05**2]])


def _problem(rng, T=50, irregular=True):
    """Simulate the exactly-discretized damped oscillator; return
    (ts, y, Ad, Qd) ready for the filtering convention (Ad[0]=I)."""
    if irregular:
        ts = np.cumsum(0.05 + 0.1 * rng.random(T))
    else:
        ts = 0.1 * np.arange(1, T + 1)
    dts = np.diff(ts, prepend=ts[:1])
    Ad, Qd = jax.vmap(lambda dt: van_loan(A, QC, dt))(jnp.asarray(dts))
    Ad, Qd = np.asarray(Ad), np.asarray(Qd)
    x = np.array([1.0, 0.0])
    xs, ys = [], []
    for k in range(T):
        x = Ad[k] @ x + np.linalg.cholesky(
            Qd[k] + 1e-14 * np.eye(2)) @ rng.standard_normal(2)
        xs.append(x.copy())
        ys.append(H @ x + 0.05 * rng.standard_normal(1))
    return ts, np.asarray(ys), Ad, Qd, np.asarray(xs)


def _numpy_kf_rts(Ad, Qd, y, m0, P0):
    """Straightforward covariance-form KF + RTS loop (the oracle)."""
    T = y.shape[0]
    mf, Pf, mp, Pp = [], [], [], []
    m, P = m0.copy(), P0.copy()
    ll = 0.0
    for k in range(T):
        m = Ad[k] @ m
        P = Ad[k] @ P @ Ad[k].T + Qd[k]
        mp.append(m.copy()); Pp.append(P.copy())
        S = H @ P @ H.T + R
        e = y[k] - H @ m
        K = P @ H.T @ np.linalg.inv(S)
        ll += -0.5 * (e @ np.linalg.solve(S, e) + np.log(np.linalg.det(S))
                      + len(e) * np.log(2 * np.pi))
        m = m + K @ e
        P = P - K @ S @ K.T
        mf.append(m.copy()); Pf.append(P.copy())
    ms = [None] * T
    Ps = [None] * T
    ms[-1], Ps[-1] = mf[-1], Pf[-1]
    for k in range(T - 2, -1, -1):
        G = Pf[k] @ Ad[k + 1].T @ np.linalg.inv(Pp[k + 1])
        ms[k] = mf[k] + G @ (ms[k + 1] - mp[k + 1])
        Ps[k] = Pf[k] + G @ (Ps[k + 1] - Pp[k + 1]) @ G.T
    return (np.asarray(mf), np.asarray(Pf), np.asarray(ms), np.asarray(Ps),
            ll)


M0 = np.array([0.8, 0.2])
P0 = np.eye(2) * 4.0


def test_kf_rts_match_numpy_oracle():
    rng = np.random.default_rng(0)
    ts, y, Ad, Qd, _ = _problem(rng)
    res = kalman_filter(Ad, Qd, H, R, y, M0, P0)
    mf, Pf, ms, Ps, ll = _numpy_kf_rts(Ad, Qd, y, M0, P0)
    np.testing.assert_allclose(res.mean_f, mf, atol=1e-11)
    np.testing.assert_allclose(res.cov_f, Pf, atol=1e-11)
    np.testing.assert_allclose(float(res.loglik), ll, rtol=1e-10)
    sm, sP = cd_smoother(res)
    np.testing.assert_allclose(sm, ms, atol=1e-10)
    np.testing.assert_allclose(sP, Ps, atol=1e-10)


def test_mask_skips_updates():
    rng = np.random.default_rng(3)
    ts, y, Ad, Qd, _ = _problem(rng, T=30)
    mask = (np.arange(30) % 3 != 0).astype(float)
    res = kalman_filter(Ad, Qd, H, R, y, M0, P0, mask=mask)
    # Oracle: drop masked rows by fusing their transition into the next.
    m, P = M0.copy(), P0.copy()
    ll = 0.0
    for k in range(30):
        m = Ad[k] @ m
        P = Ad[k] @ P @ Ad[k].T + Qd[k]
        if mask[k]:
            S = H @ P @ H.T + R
            e = y[k] - H @ m
            K = P @ H.T @ np.linalg.inv(S)
            ll += -0.5 * (e @ np.linalg.solve(S, e)
                          + np.log(np.linalg.det(S)) + np.log(2 * np.pi))
            m, P = m + K @ e, P - K @ S @ K.T
    np.testing.assert_allclose(res.mean_f[-1], m, atol=1e-11)
    np.testing.assert_allclose(float(res.loglik), ll, rtol=1e-10)


def test_ekf_and_ukf_match_exact_kf_on_linear():
    from collocfem_tpu.models.lti import LinearSystem

    rng = np.random.default_rng(1)
    ts, y, Ad, Qd, _ = _problem(rng, T=40)
    exact = kalman_filter(Ad, Qd, H, R, y, M0, P0)
    model = LinearSystem(A, C=H)
    ekf = ekf_filter(model, np.zeros(0), ts, y, R, QC, M0, P0, substeps=8)
    # RK4 moment integration vs exact Van Loan: O(h^4) global error; the
    # largest irregular interval here is ~0.15 s (h ~ 0.019).
    np.testing.assert_allclose(ekf.mean_f, exact.mean_f, atol=2e-6)
    np.testing.assert_allclose(ekf.cov_f, exact.cov_f, atol=5e-6)
    np.testing.assert_allclose(float(ekf.loglik), float(exact.loglik),
                               rtol=1e-5)
    ukf = ukf_filter(model, np.zeros(0), ts, y, R, QC, M0, P0, substeps=8)
    # UT is exact for linear flows, but the UKF's sigma-point covariance
    # is the RK4 flow conjugation R P R^T while the EKF RK4-integrates the
    # Lyapunov ODE -- identical solutions, different O(h^5) discretizations.
    np.testing.assert_allclose(ukf.mean_f, ekf.mean_f, atol=2e-6)
    np.testing.assert_allclose(ukf.cov_f, ekf.cov_f, atol=2e-6)
    se, _ = cd_smoother(ekf)
    su, _ = cd_smoother(ukf)
    sx, _ = cd_smoother(exact)
    np.testing.assert_allclose(se, sx, atol=5e-6)
    np.testing.assert_allclose(su, se, atol=5e-6)


def test_sqrt_forms_match_covariance_forms():
    rng = np.random.default_rng(2)
    ts, y, Ad, Qd, _ = _problem(rng)
    res = kalman_filter(Ad, Qd, H, R, y, M0, P0)
    sq = sqrt_kalman_filter(Ad, Qd, H, R, y, M0, P0)
    np.testing.assert_allclose(sq.mean_f, res.mean_f, atol=1e-10)
    np.testing.assert_allclose(
        sq.S_f @ np.swapaxes(sq.S_f, 1, 2), res.cov_f, atol=1e-10)
    np.testing.assert_allclose(float(sq.loglik), float(res.loglik),
                               rtol=1e-10)
    sm, sP = cd_smoother(res)
    sms, Ss = sqrt_rts_smoother(sq, Ad, Qd)
    np.testing.assert_allclose(sms, sm, atol=1e-9)
    np.testing.assert_allclose(Ss @ np.swapaxes(Ss, 1, 2), sP, atol=1e-9)


def test_sqrt_filter_f32_robust():
    """f32 square-root filter stays PSD and tracks the f64 answer through a
    diffuse prior (cond(P0) regime where the covariance form loses PSD-ness
    first)."""
    rng = np.random.default_rng(4)
    ts, y, Ad, Qd, _ = _problem(rng, T=40)
    P0d = np.diag([1e8, 1e-4])
    ref = kalman_filter(Ad, Qd, H, R, y, M0, P0d)          # f64
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    sq = sqrt_kalman_filter(f32(Ad), f32(Qd), f32(H), f32(R), f32(y),
                            f32(M0), f32(P0d))
    assert bool(jnp.all(jnp.isfinite(sq.S_f)))
    P_f32 = np.asarray(sq.S_f[-1] @ sq.S_f[-1].T)
    assert np.all(np.linalg.eigvalsh(P_f32) >= 0)          # PSD by construction
    np.testing.assert_allclose(sq.mean_f[-1], ref.mean_f[-1], atol=1e-3)


def test_pem_recovers_oscillator_parameters():
    """ML (innovations likelihood) estimation of [k, c] in
    x'' = -k x - c x' + w, plus an AD-vs-FD gradient check."""
    rng = np.random.default_rng(5)
    ts, y, Ad, Qd, _ = _problem(rng, T=400, irregular=False)

    def build(p):
        Ap = jnp.array([[0.0, 1.0], [-p[0], -p[1]]])
        return (Ap, jnp.asarray(QC), jnp.asarray(H), jnp.asarray(R),
                jnp.asarray(M0), jnp.asarray(P0))

    nll = make_lti_nll(build, ts, y)
    p0 = jnp.array([3.0, 1.0])
    g = jax.grad(nll)(p0)
    for i in range(2):
        e = np.zeros(2)
        e[i] = 1e-6
        fd = (nll(p0 + e) - nll(p0 - e)) / 2e-6
        np.testing.assert_allclose(g[i], fd, rtol=1e-5)

    p_hat, (val, gnorm, it) = run_lbfgs(jax.jit(nll), p0, maxiter=200)
    assert float(nll(p_hat)) < float(nll(p0))
    # True [k, c] = [4.0, 0.4]; one 400-sample realization pins them to a
    # few-percent statistical error, and the ML optimum must beat the truth
    # on its own data.
    np.testing.assert_allclose(np.asarray(p_hat), [4.0, 0.4], atol=0.35)
    assert float(val) <= float(nll(jnp.array([4.0, 0.4]))) + 1e-6


def test_ukf_nll_matches_ekf_on_linear_and_differentiates():
    from collocfem_tpu.kalman import make_ekf_nll, make_ukf_nll
    from collocfem_tpu.models import VanDerPol
    from collocfem_tpu.models.lti import LinearSystem
    from collocfem_tpu.utils.simulate import rk4_trajectory

    rng = np.random.default_rng(9)
    ts, y, _, _, _ = _problem(rng, T=40)
    model = LinearSystem(A, C=H)
    p_empty = jnp.zeros(0)
    nll_e = make_ekf_nll(model, ts, y, R, QC, M0, P0, substeps=8)
    nll_u = make_ukf_nll(model, ts, y, R, QC, M0, P0, substeps=8)
    # UT is exact for linear flows: both NLLs agree to discretization error.
    np.testing.assert_allclose(float(nll_u(p_empty)), float(nll_e(p_empty)),
                               rtol=1e-5)

    # AD-vs-FD gradient on a parameterized nonlinear model.
    vdp = VanDerPol()
    tf = 6.0
    t_meas = np.linspace(0.1, tf, 50)
    ts_fine = np.linspace(0.0, tf, 1201)
    xs = np.asarray(rk4_trajectory(
        vdp.f, jnp.array([2.0, 0.0]), jnp.asarray(ts_fine),
        u_fn=lambda t: jnp.zeros((1,)), p=jnp.array([1.0, 1.0])))
    yv = np.interp(t_meas, ts_fine, xs[:, 0])[:, None]
    yv += 0.02 * rng.standard_normal(yv.shape)
    Rv = np.array([[0.02**2]])
    Qcv = np.diag([1e-6, 1e-2])
    nll = make_ukf_nll(vdp, t_meas, yv, Rv, Qcv,
                       np.array([2.0, 0.0]), np.eye(2) * 0.1, substeps=3)
    p0 = jnp.array([0.8, 0.9])
    g = jax.grad(nll)(p0)
    for i in range(2):
        e = np.zeros(2)
        e[i] = 1e-6
        fd = (nll(p0 + e) - nll(p0 - e)) / 2e-6
        np.testing.assert_allclose(g[i], fd, rtol=2e-5)
    # And a short L-BFGS run moves downhill toward the truth.
    p_hat, (val, _, _) = run_lbfgs(jax.jit(nll), p0, maxiter=40)
    assert float(val) < float(nll(p0))
    np.testing.assert_allclose(np.asarray(p_hat), [1.0, 1.0], atol=0.25)


def test_smoother_initial_guess_beats_data_interp():
    """EKF/RTS warm start gives a lower initial cost than measurement
    interpolation on VdP estimation (x2 unmeasured dynamics-consistent)."""
    from collocfem_tpu.models import VanDerPol
    from collocfem_tpu.ops.mesh import uniform_mesh
    from collocfem_tpu.problem import EstimationProblem
    from collocfem_tpu.utils.simulate import rk4_trajectory

    model = VanDerPol()
    rng = np.random.default_rng(6)
    tf = 10.0
    t_meas = np.linspace(0.2, tf - 0.1, 60)
    p_true = jnp.array([1.0, 1.0])
    x0 = jnp.array([2.0, 0.0])
    ts_fine = np.linspace(0.0, tf, 2001)
    xs = np.asarray(rk4_trajectory(
        model.f, x0, jnp.asarray(ts_fine),
        u_fn=lambda t: jnp.zeros((1,)), p=p_true))
    y = np.interp(t_meas, ts_fine, xs[:, 0])[:, None]
    y += 0.02 * rng.standard_normal(y.shape)

    mesh = uniform_mesh(0.0, tf, num_elements=40, degree=4)
    prob = EstimationProblem.build(model, mesh, t_meas, defect_weight=100.0)
    data = prob.pack_data(y, t_meas)
    p0 = [0.6, 0.6]
    z_interp = prob.initial_guess_from_data(t_meas, y, p0=p0)
    z_smooth = smoother_initial_guess(
        prob, t_meas, y, p0, R=np.array([[0.02**2]]),
        Qc=np.diag([1e-4, 1e-2]), substeps=6)
    c_interp = float(prob.cost(z_interp, data))
    c_smooth = float(prob.cost(z_smooth, data))
    assert c_smooth < c_interp
    # And the UKF path produces an equally usable start.
    z_ukf = smoother_initial_guess(
        prob, t_meas, y, p0, R=np.array([[0.02**2]]),
        Qc=np.diag([1e-4, 1e-2]), substeps=6, kind="ukf")
    assert float(prob.cost(z_ukf, data)) < c_interp
