"""Moving-horizon estimator vs Kalman-filter oracle + nonlinear tracking.

For a linear-Gaussian model, MHE with an exact (filtering) arrival cost is
algebraically identical to the Kalman filter at the newest sample; the only
slack is collocation/RK4 discretization error, so the parity tolerances here
are tight.  The nonlinear test checks Van der Pol tracking accuracy against
the simulated truth.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from collocfem_tpu.kalman.disc import van_loan
from collocfem_tpu.kalman.filtering import kalman_filter
from collocfem_tpu.mhe import MovingHorizonEstimator
from collocfem_tpu.models.lti import LinearSystem
from collocfem_tpu.models.vdp import VanDerPol
from collocfem_tpu.solve.newton import SolverOptions


def _sim_linear(A, Qd, C, R, m0, P0, T, rng):
    nx, ny = A.shape[0], C.shape[0]
    x = rng.multivariate_normal(m0, P0)
    xs, ys = [], []
    for _ in range(T):
        ys.append(C @ x + rng.multivariate_normal(np.zeros(ny), R))
        xs.append(x)
        x = A @ x + rng.multivariate_normal(np.zeros(nx), Qd)
    return np.asarray(xs), np.asarray(ys)


def test_mhe_matches_kalman_filter_linear():
    rng = np.random.default_rng(7)
    A = np.array([[0.0, 1.0], [-2.0, -0.4]])
    C = np.array([[1.0, 0.0]])
    dt, sig_w, sig_v = 0.1, 0.4, 0.05
    Qc = np.diag([sig_w**2, sig_w**2])
    Ad, Qd = van_loan(jnp.asarray(A), jnp.asarray(Qc), dt)
    Ad, Qd = np.asarray(Ad), np.asarray(Qd)
    R = np.array([[sig_v**2]])
    m0, P0 = np.array([0.3, -0.2]), 0.5 * np.eye(2)

    T = 24
    _, ys = _sim_linear(Ad, Qd, C, R, m0, P0, T, rng)

    # Oracle: discrete KF over all samples (Ad[0]=I, Qd[0]=0 convention).
    Ad_seq = np.concatenate([np.eye(2)[None], np.tile(Ad, (T - 1, 1, 1))])
    Qd_seq = np.concatenate([np.zeros((1, 2, 2)), np.tile(Qd, (T - 1, 1, 1))])
    res = kalman_filter(
        jnp.asarray(Ad_seq), jnp.asarray(Qd_seq), jnp.asarray(C),
        jnp.asarray(R), jnp.asarray(ys), jnp.asarray(m0), jnp.asarray(P0),
    )
    kf_means = np.asarray(res.mean_f)
    kf_covs = np.asarray(res.cov_f)

    H = 8
    mhe = MovingHorizonEstimator(
        LinearSystem(A, C=C), horizon=H, dt=dt, sig_w=sig_w, sig_v=sig_v,
        degree=4, substeps=8,
        options=SolverOptions(maxiter=30, gtol=1e-12, method="cr"),
    )
    state = mhe.init(ys[:H], m0=m0, P0=P0)
    np.testing.assert_allclose(
        np.asarray(mhe.estimate(state)), kf_means[H - 1], atol=2e-6
    )
    for k in range(H, T):
        state, est = mhe.step(state, ys[k])
        np.testing.assert_allclose(np.asarray(est), kf_means[k], atol=2e-6)

    # Posterior covariance at the newest sample tracks the KF filtered cov.
    cov = np.asarray(mhe.current_covariance(state))
    np.testing.assert_allclose(cov, kf_covs[T - 1], atol=2e-6)


@pytest.mark.slow  # second MHE solver build; the KF-parity test above
# is the fast anchor
def test_mhe_tracks_nonlinear_vdp():
    from collocfem_tpu.utils.simulate import rk4_trajectory

    dt, sig_v = 0.05, 0.01
    T, H = 40, 10
    mu_true = np.array([1.0, 1.0])
    ts = np.arange(T) * dt
    model = VanDerPol()
    xs = np.asarray(
        rk4_trajectory(
            lambda x, u, p, t: model.f(x, u, p, t),
            jnp.asarray([1.2, 0.0]), jnp.asarray(ts),
            u_fn=lambda t: jnp.zeros((1,)), p=jnp.asarray(mu_true),
        )
    )
    rng = np.random.default_rng(3)
    ys = xs[:, :1] + sig_v * rng.standard_normal((T, 1))

    mhe = MovingHorizonEstimator(
        model, horizon=H, dt=dt, sig_w=0.5, sig_v=sig_v, degree=3,
        p_fixed=mu_true,
        options=SolverOptions(maxiter=25, gtol=1e-10, method="cr"),
    )
    state = mhe.init(ys[:H], m0=np.array([1.0, 0.2]), P0=np.eye(2))
    errs = []
    for k in range(H, T):
        state, est = mhe.step(state, ys[k])
        errs.append(np.asarray(est) - xs[k])
    errs = np.asarray(errs)
    # Measured channel tracked to noise level; velocity reconstructed.
    assert np.sqrt((errs[:, 0] ** 2).mean()) < 3 * sig_v
    assert np.sqrt((errs[:, 1] ** 2).mean()) < 0.1


def test_mhe_rejects_bad_inputs():
    import pytest

    model = VanDerPol()
    with pytest.raises(ValueError):  # unknown params need p_fixed
        MovingHorizonEstimator(model, horizon=5, dt=0.1, sig_w=1.0, sig_v=1.0)
    with pytest.raises(ValueError):
        MovingHorizonEstimator(
            LinearSystem(np.eye(2)), horizon=1, dt=0.1, sig_w=1.0, sig_v=1.0
        )
    mhe = MovingHorizonEstimator(
        LinearSystem(np.eye(2)), horizon=4, dt=0.1, sig_w=1.0, sig_v=1.0
    )
    with pytest.raises(ValueError):  # wrong window shape
        mhe.init(np.zeros((3, 2)), m0=np.zeros(2), P0=np.eye(2))
