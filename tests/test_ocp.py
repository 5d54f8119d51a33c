"""Trajectory optimization (BASELINE.json config 3): double-integrator
minimum-effort transfer vs the analytic solution, and the pendulum swing-up
with torque path constraints — checked against first-order KKT conditions
computed externally with autodiff (SURVEY.md §4: integration tests with
known answers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collocfem_tpu.model import Model
from collocfem_tpu.models import Pendulum
from collocfem_tpu.ocp import OptimalControlProblem
from collocfem_tpu.ops.mesh import interpolate_trajectory, uniform_mesh
from collocfem_tpu.problem import Decision
from collocfem_tpu.solve.auglag import ALBarrierOptions, make_ocp_solver


class DoubleIntegrator(Model):
    """x1' = x2, x2' = u; min 0.5 int u^2 — analytic solution available."""

    nx = 2
    nu = 1
    nq = 0
    ng = 0

    def f(self, x, u, p, t):
        del p, t
        return jnp.stack([x[1], u[0]])

    def running_cost_residual(self, x, u, p, t):
        del x, p, t
        return u


@pytest.mark.slow  # its own ~100 s OCP solver-loop compile; the pendulum
# fixture below is the fast-tier OCP anchor (inequalities + KKT checks)
def test_double_integrator_matches_analytic():
    # x(0)=(0,0) -> x(1)=(1,0), min 0.5 int u^2: u*(t) = 6 - 12 t, J* = 6.
    model = DoubleIntegrator()
    mesh = uniform_mesh(0.0, 1.0, num_elements=8, degree=4)
    prob = OptimalControlProblem.build(model, mesh, x0=[0.0, 0.0], xf=[1.0, 0.0])
    solve = make_ocp_solver(prob, ALBarrierOptions(n_outer=10))
    z, stats = solve(prob.initial_guess())
    assert float(stats.cviol) < 1e-8
    assert abs(float(stats.objective) - 6.0) < 1e-6
    tt = np.linspace(0, 1, 101)
    vals = np.asarray(interpolate_trajectory(mesh, z.V, tt))
    np.testing.assert_allclose(vals[:, 0], 3 * tt**2 - 2 * tt**3, atol=1e-6)
    np.testing.assert_allclose(vals[:, 2], 6 - 12 * tt, atol=1e-5)


@pytest.fixture(scope="module")
def pendulum_solution():
    model = Pendulum(m=1.0, l=0.5, grav=9.81, u_max=2.0, effort_weight=1.0)
    mesh = uniform_mesh(0.0, 2.5, num_elements=25, degree=4)
    prob = OptimalControlProblem.build(
        model, mesh, x0=[0.0, 0.0], xf=[np.pi, 0.0]
    )
    solve = make_ocp_solver(prob, ALBarrierOptions())
    z, stats = solve(prob.initial_guess())
    return model, mesh, prob, z, stats


def test_pendulum_swingup_feasible(pendulum_solution):
    model, mesh, prob, z, stats = pendulum_solution
    x, u = prob.split(z.V)
    x, u = np.asarray(x), np.asarray(u)
    assert float(stats.cviol) < 1e-8
    # Terminal boundary conditions.
    np.testing.assert_allclose(x[-1], [np.pi, 0.0], atol=1e-8)
    np.testing.assert_allclose(x[0], [0.0, 0.0], atol=1e-8)
    # Path constraints strictly satisfied (within barrier slack).
    assert np.max(np.abs(u)) <= model.u_max + 1e-6
    # The torque bound is genuinely active somewhere (swing-up needs pumping).
    assert np.max(np.abs(u)) > model.u_max - 1e-2


def test_pendulum_dynamics_residual_dense(pendulum_solution):
    # The collocation polynomial satisfies the ODE between nodes to
    # truncation accuracy (the unstable dynamics forbid a naive
    # re-integration comparison; this is the honest dense check).
    model, mesh, prob, z, stats = pendulum_solution
    tt = np.linspace(0.0, 2.5, 400)
    vals, derivs = interpolate_trajectory(mesh, z.V, tt, derivative=True)
    vals, derivs = np.asarray(vals), np.asarray(derivs)
    x, u = vals[:, :2], vals[:, 2:]
    f = jax.vmap(model.f, in_axes=(0, 0, None, 0))(
        jnp.asarray(x), jnp.asarray(u), z.p, jnp.asarray(tt)
    )
    err = np.max(np.abs(derivs[:, :2] - np.asarray(f)))
    assert err < 5e-3, err


def test_pendulum_kkt_stationarity(pendulum_solution):
    # External first-order check: grad_z [ J(z) + lam.c(z) + nu.g(z) ] ~ 0
    # with nu_i = mu / (-g_i) (the barrier's implicit inequality multiplier).
    model, mesh, prob, z, stats = pendulum_solution
    mult, mu = stats.multipliers, stats.mu

    def lagrangian(V):
        zz = Decision(V=V, p=z.p)
        c = prob.constraints(zz)
        g = prob.path_constraints(zz)
        nu = mu / (-prob.path_constraints(z))  # frozen multiplier estimate
        return (
            prob.objective(zz)
            + jnp.sum(mult.defect * c.defect)
            + jnp.sum(mult.b0 * c.b0)
            + jnp.sum(mult.bf * c.bf)
            + jnp.sum(nu * g)
        )

    grad = np.asarray(jax.grad(lagrangian)(z.V))
    assert np.max(np.abs(grad)) < 1e-5, np.max(np.abs(grad))


class SplitActuatorIntegrator(Model):
    """Double integrator driven by two coupled actuators.

    x1' = x2, x2' = u1 + u2 with the equality path constraint u1 = 2 u2 and
    cost 0.5 int (u1^2 + u2^2).  Eliminating the constraint gives accel
    a = 3 u2 and cost 0.5 int (5/9) a^2 — the same minimum-effort transfer
    as the unconstrained double integrator (scaling the effort weight does
    not move the minimizer), so a*(t) = 6 - 12 t and J* = (5/9) * 6 = 10/3.
    """

    nx = 2
    nu = 2
    nq = 0
    ng = 0
    ne = 1

    def f(self, x, u, p, t):
        del p, t
        return jnp.stack([x[1], u[0] + u[1]])

    def g_eq(self, x, u, p, t):
        del x, p, t
        return jnp.stack([u[0] - 2.0 * u[1]])

    def running_cost_residual(self, x, u, p, t):
        del x, p, t
        return u


@pytest.fixture(scope="module")
def split_actuator_solution():
    model = SplitActuatorIntegrator()
    mesh = uniform_mesh(0.0, 1.0, num_elements=8, degree=4)
    prob = OptimalControlProblem.build(model, mesh, x0=[0.0, 0.0], xf=[1.0, 0.0])
    # 16 outer rounds: under the dimensionless-lam KKT damping the AL
    # schedule needs a couple more rho escalations to drive the equality
    # path constraint to ~1e-11 (12 rounds leave it at ~2e-7).
    solve = make_ocp_solver(prob, ALBarrierOptions(n_outer=16))
    z, stats = solve(prob.initial_guess())
    return model, mesh, prob, z, stats


@pytest.mark.slow
def test_equality_path_constraint_matches_analytic(split_actuator_solution):
    model, mesh, prob, z, stats = split_actuator_solution
    assert float(stats.cviol) < 1e-8  # includes max |u1 - 2 u2| over nodes
    assert abs(float(stats.objective) - 10.0 / 3.0) < 1e-5
    _, u = prob.split(z.V)
    u = np.asarray(u)
    np.testing.assert_allclose(u[:, 0], 2.0 * u[:, 1], atol=1e-8)
    tt = np.linspace(0, 1, 101)
    vals = np.asarray(interpolate_trajectory(mesh, z.V, tt))
    np.testing.assert_allclose(vals[:, 0], 3 * tt**2 - 2 * tt**3, atol=1e-6)
    np.testing.assert_allclose(vals[:, 2] + vals[:, 3], 6 - 12 * tt, atol=1e-4)


@pytest.mark.slow
def test_equality_path_kkt_stationarity(split_actuator_solution):
    # External first-order check including the per-node equality-path
    # multipliers: grad_V [ J + lam_def.c_def + lam_b.c_b + lam_eq.g_eq ] ~ 0.
    model, mesh, prob, z, stats = split_actuator_solution
    mult = stats.multipliers

    def lagrangian(V):
        zz = Decision(V=V, p=z.p)
        c = prob.constraints(zz)
        return (
            prob.objective(zz)
            + jnp.sum(mult.defect * c.defect)
            + jnp.sum(mult.b0 * c.b0)
            + jnp.sum(mult.bf * c.bf)
            + jnp.sum(mult.path_eq * c.path_eq)
        )

    grad = np.asarray(jax.grad(lagrangian)(z.V))
    assert np.max(np.abs(grad)) < 1e-5, np.max(np.abs(grad))
