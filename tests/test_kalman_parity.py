"""Linear-Gaussian oracle: the collocation joint-MAP state path must match
the continuous-discrete Kalman/RTS fixed-interval smoother.

This is the sharpest end-to-end check of the estimation stack: it validates
the defect quadrature weighting (the continuous-time process-noise log
density), the measurement weighting, the KKT assembly and the solver all at
once against an independently-coded classical algorithm (numpy only).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

from collocfem_tpu.models.lti import LinearSystem
from collocfem_tpu.ops.mesh import interpolate_trajectory, uniform_mesh
from collocfem_tpu.problem import EstimationProblem
from collocfem_tpu.solve import SolverOptions, make_gn_solver

# Damped oscillator with process noise on the velocity.
A = np.array([[0.0, 1.0], [-4.0, -0.4]])
SIG_W = 0.15   # continuous process noise density on x2'
SIG_V = 0.05   # measurement noise on y = x1
TF = 6.0
NT = 60        # measurement samples


def _simulate_and_smooth(rng):
    """Euler-Maruyama truth + exact-discretization Kalman filter/RTS smoother."""
    t_meas = np.linspace(0.08, TF - 0.02, NT)
    # --- truth simulation (fine EM) ---
    dt = 1e-4
    ts = np.arange(0.0, TF + dt, dt)
    x = np.zeros((ts.size, 2))
    x[0] = [1.0, 0.0]
    for i in range(ts.size - 1):
        x[i + 1] = x[i] + dt * (A @ x[i])
        x[i + 1, 1] += SIG_W * np.sqrt(dt) * rng.standard_normal()
    y = np.interp(t_meas, ts, x[:, 0]) + SIG_V * rng.standard_normal(NT)

    # --- exact discretization between sample times (Van Loan) ---
    L = np.array([[0.0], [1.0]])
    Qc = L @ L.T * SIG_W**2

    def disc(dtk):
        M = np.zeros((4, 4))
        M[:2, :2] = A * dtk
        M[:2, 2:] = Qc * dtk
        M[2:, 2:] = -A.T * dtk
        EM = expm(M)
        Ad = EM[:2, :2]
        Qd = EM[:2, 2:] @ Ad.T
        return Ad, (Qd + Qd.T) / 2

    H = np.array([[1.0, 0.0]])
    R = np.array([[SIG_V**2]])
    # Diffuse prior at the first sample time.
    tk = np.concatenate([[t_meas[0]], t_meas])
    mk = np.zeros(2)
    Pk = np.eye(2) * 1e6
    ms_f, Ps_f, ms_p, Ps_p, Ads = [], [], [], [], []
    for i in range(NT):
        if i > 0:
            Ad, Qd = disc(t_meas[i] - t_meas[i - 1])
            mk = Ad @ mk
            Pk = Ad @ Pk @ Ad.T + Qd
        else:
            Ad = np.eye(2)
        ms_p.append(mk.copy()); Ps_p.append(Pk.copy()); Ads.append(Ad)
        S = H @ Pk @ H.T + R
        K = Pk @ H.T @ np.linalg.inv(S)
        mk = mk + (K @ (y[i] - H @ mk)).ravel()
        Pk = (np.eye(2) - K @ H) @ Pk
        ms_f.append(mk.copy()); Ps_f.append(Pk.copy())
    # RTS backward sweep.
    xs = [None] * NT
    xs[-1] = ms_f[-1]
    Ps = Ps_f[-1]
    for i in range(NT - 2, -1, -1):
        Ck = Ps_f[i] @ Ads[i + 1].T @ np.linalg.inv(Ps_p[i + 1])
        xs[i] = ms_f[i] + Ck @ (xs[i + 1] - ms_p[i + 1])
        Ps = Ps_f[i] + Ck @ (Ps - Ps_p[i + 1]) @ Ck.T
    return t_meas, y, np.asarray(xs)


@pytest.mark.slow  # the full-defect-rule test below asserts the
# STRONGER parity bound with one solver build; this one documents the
# interior rule's quadrature bias
def test_map_path_matches_rts_smoother():
    rng = np.random.default_rng(7)
    t_meas, y, x_smooth = _simulate_and_smooth(rng)

    model = LinearSystem(A, C=np.array([[1.0, 0.0]]))
    # The smoothed mean's x2-DERIVATIVE jumps at every measurement (the
    # costate kink feeds x2' through Qc), so element breakpoints must sit
    # at the measurement times for the piecewise polynomial to represent
    # the MAP path.
    from collocfem_tpu.ops.basis import make_basis
    from collocfem_tpu.ops.mesh import Mesh

    mesh = Mesh(make_basis(4), t_meas)
    # Process noise enters only x2' in the smoother model; the exact
    # x1' = x2 relation gets a large (soft-hard) weight.
    prob = EstimationProblem.build(
        model, mesh, t_meas, defect_weight=[1e2, 1.0 / SIG_W]
    )
    data = prob.pack_data(y[:, None], t_meas, meas_weight=1.0 / SIG_V)
    z0 = prob.initial_guess_from_data(t_meas, y[:, None], p0=np.zeros(0))
    z, stats = make_gn_solver(
        prob, SolverOptions(maxiter=30, gtol=1e-8, xtol=1e-12)
    )(z0, data)
    assert bool(stats.converged)

    x_map = np.asarray(interpolate_trajectory(mesh, z.V, t_meas))
    err = np.max(np.abs(x_map - x_smooth))
    scale = np.max(np.abs(x_smooth))
    # Observed ~0.010 worst-case on x2 (0.6% of scale): dominated by the
    # soft x1-defect weight and the single-counted shared-node quadrature
    # exactly at the costate kinks.
    assert err < 0.015, (err, scale)


def test_full_defect_rule_tightens_smoother_parity():
    """defect_rule='full' restores the dropped w0 quadrature weight; the
    MAP-vs-RTS gap must shrink by an order of magnitude (the residual error
    is then polynomial-approximation, not quadrature bias)."""
    rng = np.random.default_rng(7)
    t_meas, y, x_smooth = _simulate_and_smooth(rng)

    model = LinearSystem(A, C=np.array([[1.0, 0.0]]))
    from collocfem_tpu.ops.basis import make_basis
    from collocfem_tpu.ops.mesh import Mesh

    mesh = Mesh(make_basis(4), t_meas)
    # Stiffer soft weight on the exact x1' = x2 relation than the interior-
    # rule test: with the quadrature bias gone, the soft-constraint slack
    # becomes the dominant error term and must be pushed down to expose it.
    prob = EstimationProblem.build(
        model, mesh, t_meas, defect_weight=[1e3, 1.0 / SIG_W],
        defect_rule="full",
    )
    data = prob.pack_data(y[:, None], t_meas, meas_weight=1.0 / SIG_V)
    z0 = prob.initial_guess_from_data(t_meas, y[:, None], p0=np.zeros(0))
    z, stats = make_gn_solver(
        prob, SolverOptions(maxiter=30, gtol=1e-8, xtol=1e-12)
    )(z0, data)
    assert bool(stats.converged)

    x_map = np.asarray(interpolate_trajectory(mesh, z.V, t_meas))
    err = np.max(np.abs(x_map - x_smooth))
    assert err < 1.5e-3, err
