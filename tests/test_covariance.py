"""Parameter covariance: structured Schur computation vs dense inverse, and
statistical calibration on repeated noisy estimations (SURVEY.md §3.4
output-error standard errors)."""

import jax.numpy as jnp
import numpy as np
import pytest

from collocfem_tpu.models import VanDerPol
from collocfem_tpu.ops.assemble import assemble_gn, materialize_dense
from collocfem_tpu.ops.mesh import uniform_mesh
from collocfem_tpu.problem import EstimationProblem
from collocfem_tpu.solve import SolverOptions, make_gn_solver
from collocfem_tpu.solve.covariance import parameter_covariance, parameter_std
from collocfem_tpu.utils import rk4_trajectory

MU, B, TF = 1.0, 1.0, 8.0
NOISE = 0.05


@pytest.fixture(scope="module")
def setup():
    model = VanDerPol()
    mesh = uniform_mesh(0.0, TF, 20, 4)
    t_meas = np.linspace(0.05, TF - 0.05, 80)
    ts = np.linspace(0.0, TF, 8001)
    xs = rk4_trajectory(
        model.f, jnp.asarray([1.0, 0.0]), ts,
        u_fn=lambda t: jnp.stack([jnp.sin(0.9 * t)]),
        p=jnp.asarray([MU, B]),
    )
    y_clean = np.interp(t_meas, ts, np.asarray(xs[:, 0]))[:, None]
    prob = EstimationProblem.build(model, mesh, t_meas, defect_weight=1e3)
    u_nodes = np.sin(0.9 * mesh.elem_times)[..., None]
    return prob, t_meas, y_clean, u_nodes


def test_matches_dense_inverse(setup):
    prob, t_meas, y_clean, u_nodes = setup
    rng = np.random.default_rng(0)
    y = y_clean + NOISE * rng.standard_normal(y_clean.shape)
    data = prob.pack_data(y, t_meas, u_nodes=u_nodes, meas_weight=1 / NOISE)
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.8, 0.8])
    z, _ = make_gn_solver(prob, SolverOptions(maxiter=40, xtol=1e-12))(z0, data)

    cov = np.asarray(parameter_covariance(prob, z, data))
    # Dense oracle: invert the full GN matrix, take the p-block.
    sys = assemble_gn(prob, z, data)
    H, _ = materialize_dense(sys)
    n = H.shape[0]
    cov_dense = np.linalg.inv(np.asarray(H))[n - 2:, n - 2:]
    np.testing.assert_allclose(cov, cov_dense, rtol=1e-6, atol=1e-12)


def test_std_errors_calibrated(setup):
    # Repeat the estimation over independent noise draws: the empirical
    # spread of the estimates must match the reported standard errors
    # within Monte-Carlo tolerance.
    prob, t_meas, y_clean, u_nodes = setup
    rng = np.random.default_rng(1)
    solve = make_gn_solver(prob, SolverOptions(maxiter=40, xtol=1e-12))
    estimates, stds = [], None
    for trial in range(12):
        y = y_clean + NOISE * rng.standard_normal(y_clean.shape)
        data = prob.pack_data(
            y, t_meas, u_nodes=u_nodes, meas_weight=1 / NOISE
        )
        z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.8, 0.8])
        z, stats = solve(z0, data)
        estimates.append(np.asarray(z.p))
        if stds is None:
            stds = np.asarray(parameter_std(prob, z, data))
    emp = np.std(np.asarray(estimates), axis=0, ddof=1)
    # 12 samples -> loose factor-2.5 agreement is the honest bar.
    ratio = emp / stds
    assert np.all(ratio > 0.4) and np.all(ratio < 2.5), (emp, stds)
