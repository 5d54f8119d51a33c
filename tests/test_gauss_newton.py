"""End-to-end minimum slice (SURVEY.md §7 step 2): Van der Pol parameter
estimation on a collocation mesh, solved by the fully-jitted GN/LM driver,
with every KKT method (dense/scan/cyclic reduction) agreeing."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from collocfem_tpu.models import VanDerPol
from collocfem_tpu.ops.mesh import uniform_mesh
from collocfem_tpu.problem import EstimationProblem
from collocfem_tpu.solve import SolverOptions, gauss_newton

MU_TRUE, B_TRUE = 1.0, 0.7


def simulate_vdp(tf=10.0, x0=(2.0, 0.0)):
    def u_fn(t):
        return 0.5 * np.sin(1.1 * t)

    def rhs(t, x):
        return [x[1], MU_TRUE * (1 - x[0] ** 2) * x[1] - x[0] + B_TRUE * u_fn(t)]

    sol = solve_ivp(rhs, (0.0, tf), x0, rtol=1e-11, atol=1e-12, dense_output=True)
    return sol.sol, u_fn


@pytest.fixture(scope="module")
def vdp_setup():
    tf = 10.0
    traj, u_fn = simulate_vdp(tf)
    mesh = uniform_mesh(0.0, tf, num_elements=40, degree=4)
    t_meas = np.linspace(0.025, tf - 0.025, 200)
    y = traj(t_meas)[0][:, None]  # x1 only
    model = VanDerPol()
    prob = EstimationProblem.build(model, mesh, t_meas, defect_weight=30.0)
    u_nodes = u_fn(mesh.elem_times)[..., None]
    return prob, mesh, t_meas, y, u_nodes, traj


@pytest.fixture(scope="module")
def cr_solver(vdp_setup):
    """ONE compiled production-path solver for the whole module: the
    suite wall is solver-loop compiles, and ``data``/``z0`` are runtime
    arguments — noiseless, noisy, and divergence tests all reuse this
    single program (round-4 verdict item 3)."""
    from collocfem_tpu.solve.newton import make_gn_solver

    prob = vdp_setup[0]
    return make_gn_solver(prob, SolverOptions(maxiter=60, gtol=1e-9,
                                              method="cr"))


def solve_with(prob, mesh, t_meas, y, u_nodes, method, noise=0.0, seed=0,
               solver=None):
    rng = np.random.default_rng(seed)
    y_noisy = y + noise * rng.standard_normal(y.shape)
    data = prob.pack_data(
        y_noisy, t_meas, u_nodes=u_nodes, meas_weight=1.0,
        p_prior=[1.0, 1.0], p_weight=1e-3,
    )
    z0 = prob.initial_guess_from_data(t_meas, y_noisy, p0=[2.0, 0.3])
    if solver is not None:
        return solver(z0, data)
    opts = SolverOptions(maxiter=60, gtol=1e-9, method=method)
    z, stats = gauss_newton(prob, z0, data, opts)
    return z, stats


# Each method compiles its own 60-iteration solver (~1 min on CPU); the
# fast tier runs the production 'cr' path, the rest are slow-tier.
@pytest.mark.parametrize(
    "method",
    [
        pytest.param("dense_full", marks=pytest.mark.slow),
        pytest.param("scan", marks=pytest.mark.slow),
        "cr",
    ],
)
def test_vdp_estimation_noiseless(vdp_setup, cr_solver, method):
    prob, mesh, t_meas, y, u_nodes, traj = vdp_setup
    z, stats = solve_with(prob, mesh, t_meas, y, u_nodes, method,
                          solver=cr_solver if method == "cr" else None)
    assert bool(stats.converged)
    p = np.asarray(z.p)
    assert abs(p[0] - MU_TRUE) < 1e-4, p
    assert abs(p[1] - B_TRUE) < 1e-4, p
    # Recovered state path matches the true trajectory at the nodes.
    x_true = traj(mesh.node_times).T
    err = np.abs(np.asarray(z.V) - x_true).max()
    assert err < 2e-3, err  # discretization-level (soft defects, N=40, d=4)


def test_vdp_estimation_noisy(vdp_setup, cr_solver):
    prob, mesh, t_meas, y, u_nodes, traj = vdp_setup
    z, stats = solve_with(prob, mesh, t_meas, y, u_nodes, "cr", noise=0.02,
                          seed=1, solver=cr_solver)
    p = np.asarray(z.p)
    assert abs(p[0] - MU_TRUE) < 0.05
    assert abs(p[1] - B_TRUE) < 0.05
    assert float(stats.cost) < 1.0


@pytest.mark.slow
def test_methods_agree(vdp_setup):
    prob, mesh, t_meas, y, u_nodes, _ = vdp_setup
    z_a, _ = solve_with(prob, mesh, t_meas, y, u_nodes, "cr")
    z_b, _ = solve_with(prob, mesh, t_meas, y, u_nodes, "dense_full")
    np.testing.assert_allclose(np.asarray(z_a.p), np.asarray(z_b.p), atol=1e-7)


def test_divergence_is_graceful(vdp_setup, cr_solver):
    """Garbage guess: solver must not NaN out (damping absorbs bad
    steps).  Reuses the module's compiled solver — garbage data/state is
    a runtime input, not a new program."""
    prob, mesh, t_meas, y, u_nodes, _ = vdp_setup
    rng = np.random.default_rng(0)
    data = prob.pack_data(rng.standard_normal(y.shape), t_meas,
                          u_nodes=u_nodes,
                          p_prior=[1.0, 1.0], p_weight=1e-2)
    from collocfem_tpu.problem import Decision
    z0 = Decision(V=jnp.asarray(1e3 * rng.standard_normal((mesh.num_nodes, 2))),
                  p=jnp.asarray([50.0, -30.0]))
    z, stats = cr_solver(z0, data)
    assert np.isfinite(np.asarray(z.V)).all()
    assert np.isfinite(float(stats.cost))
