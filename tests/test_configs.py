"""Integration tests for BASELINE.json configs 2 and 4 (configs 1, 3, 5 are
covered by test_gauss_newton, test_ocp, test_multi_experiment): small-size
versions of the Duffing joint MAP estimation and aircraft output-error ID
with known ground truth (SURVEY.md §4 "integration tests with known
answers").  Degree 2 with 2x the elements: identical per-config machinery
at a third of the solver-loop compile (the fast tier is compile-bound on
XLA:CPU; degree-4 fidelity is anchored by tests/test_gauss_newton.py and
the full-size examples/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from collocfem_tpu.models import AircraftLongitudinal, Duffing
from collocfem_tpu.ops.mesh import uniform_mesh
from collocfem_tpu.problem import EstimationProblem
from collocfem_tpu.solve import SolverOptions, make_gn_solver
from collocfem_tpu.utils import rk4_trajectory


def test_duffing_joint_map_estimation():
    # Truth simulated as an SDE (Euler-Maruyama); the defects act as the
    # process-noise prior and the state path is a MAP decision variable.
    alpha, beta, delta = 1.0, 5.0, 0.2
    gamma, omega = 8.0, 0.5
    tf, proc_sig, meas_sig = 10.0, 0.03, 0.01
    rng = np.random.default_rng(2)

    dt = 1e-3
    n = int(tf / dt)
    ts = np.linspace(0, tf, n + 1)
    x = np.zeros((n + 1, 2))
    x[0] = [1.0, 0.0]
    for i in range(n):
        x1, x2 = x[i]
        drift = np.array([
            x2,
            -delta * x2 - alpha * x1 - beta * x1**3
            + gamma * np.cos(omega * ts[i]),
        ])
        x[i + 1] = x[i] + dt * drift
        x[i + 1, 1] += proc_sig * np.sqrt(dt) * rng.standard_normal()

    t_meas = np.linspace(0.05, tf - 0.05, 300)
    y = np.interp(t_meas, ts, x[:, 0])[:, None]
    y += meas_sig * rng.standard_normal(y.shape)

    mesh = uniform_mesh(0.0, tf, 200, 2)
    model = Duffing(gamma=gamma, omega=omega)
    prob = EstimationProblem.build(
        model, mesh, t_meas, defect_weight=1.0 / proc_sig
    )
    data = prob.pack_data(
        y, t_meas, meas_weight=1.0 / meas_sig, p_weight=1e-3
    )
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.5, 1.0, 0.5])
    z, stats = make_gn_solver(
        prob, SolverOptions(maxiter=60, gtol=1e-5, xtol=1e-10)
    )(z0, data)

    p = np.asarray(z.p)
    assert bool(stats.converged)
    np.testing.assert_allclose(p, [alpha, beta, delta], rtol=0.15, atol=0.05)
    # The MAP state path tracks the noisy truth closely.
    x_path = np.asarray(z.V)[:, 0]
    x_true = np.interp(np.asarray(mesh.node_times), ts, x[:, 0])
    assert np.max(np.abs(x_path - x_true)) < 0.05


def test_aircraft_output_error():
    p_true = np.array([-1.2, -8.0, -2.5, -0.15, -12.0])
    Za, Ma, Mq, Zd, Md = p_true
    V_air, g0, tf = 60.0, 9.81, 6.0
    model = AircraftLongitudinal(V=V_air, g0=g0)

    def doublet(t):
        d = np.deg2rad(3.0)
        return np.where((t >= 0.5) & (t < 1.5), d,
                        np.where((t >= 1.5) & (t < 2.5), -d, 0.0))

    u_fn = lambda t: jnp.stack([
        jnp.where((t >= 0.5) & (t < 1.5), np.deg2rad(3.0),
                  jnp.where((t >= 1.5) & (t < 2.5), -np.deg2rad(3.0), 0.0))
    ])
    ts_fine = np.linspace(0.0, tf, 12001)
    xs = np.asarray(rk4_trajectory(
        model.f, jnp.zeros(2), ts_fine, u_fn=u_fn, p=jnp.asarray(p_true)
    ))
    t_meas = np.linspace(0.02, tf - 0.02, 240)
    alpha = np.interp(t_meas, ts_fine, xs[:, 0])
    q = np.interp(t_meas, ts_fine, xs[:, 1])
    az = V_air / g0 * (Za * alpha + Zd * doublet(t_meas))
    y = np.stack([alpha, q, az], 1)
    noise = np.array([0.001, 0.002, 0.02])
    rng = np.random.default_rng(3)
    y += noise * rng.standard_normal(y.shape)

    mesh = uniform_mesh(0.0, tf, 240, 2)
    prob = EstimationProblem.build(model, mesh, t_meas, defect_weight=1e4)
    u_nodes = doublet(mesh.elem_times)[..., None]
    data = prob.pack_data(y, t_meas, u_nodes=u_nodes, meas_weight=1.0 / noise)
    z0 = prob.initial_guess_from_data(
        t_meas, y[:, :2], p0=[-1.0, -5.0, -1.0, -0.1, -5.0]
    )
    z, stats = make_gn_solver(
        prob, SolverOptions(maxiter=60, gtol=1e-6, xtol=1e-12)
    )(z0, data)

    p = np.asarray(z.p)
    assert bool(stats.converged)
    # Dominant derivatives recovered tightly; Z_d is weakly identifiable at
    # this noise level (tiny control influence on alpha-dot).
    np.testing.assert_allclose(p[[0, 1, 2, 4]], p_true[[0, 1, 2, 4]],
                               rtol=0.05)
    assert abs(p[3] - p_true[3]) < 0.1
