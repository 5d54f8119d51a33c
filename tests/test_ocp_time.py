"""Free-final-time OCP (collocfem_tpu.ocp_time) against analytic optima.

The double integrator admits closed-form answers for both regimes:

* time-penalized minimum energy — min over (u, T) of
  ``T + 0.5 ∫ u² dt`` from rest at 0 to rest at d: the fixed-T inner
  problem has ∫u²dt = 12 d²/T³, so J(T) = T + 6 d²/T³ and
  T* = (18 d²)^{1/4};
* minimum time with |u| ≤ 1 (bang-bang): T* = 2 √d.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from collocfem_tpu import free_time_ocp
from collocfem_tpu.model import Model
from collocfem_tpu.ocp_time import FreeTimeModel
from collocfem_tpu.solve.auglag import ALBarrierOptions, solve_ocp


class DoubleIntegrator(Model):
    """x1' = x2, x2' = u; optional |u| <= u_max bound and u² effort cost."""

    nx = 2
    nu = 1
    nq = 0

    def __init__(self, u_max=None, effort_weight=0.0):
        self.u_max = u_max
        self.effort_weight = float(effort_weight)
        self.ng = 2 if u_max is not None else 0

    def f(self, x, u, p, t):
        del p, t
        return jnp.stack([x[1], u[0]])

    def g(self, x, u, p, t):
        del x, p, t
        if self.u_max is None:
            return jnp.zeros((0,))
        return jnp.stack([u[0] - self.u_max, -u[0] - self.u_max])

    def running_cost_residual(self, x, u, p, t):
        del x, p, t
        if self.effort_weight == 0.0:
            return jnp.zeros((0,))
        return jnp.sqrt(self.effort_weight) * u


def test_validation():
    m = DoubleIntegrator()
    with pytest.raises(ValueError):
        FreeTimeModel(m, tf_ref=-1.0, time_weight=1.0, tf_min=0.1, tf_max=10.0)
    with pytest.raises(ValueError):
        FreeTimeModel(m, tf_ref=1.0, time_weight=1.0, tf_min=2.0, tf_max=10.0)


def test_final_time_parameterization():
    prob, ftm = free_time_ocp(
        DoubleIntegrator(), num_elements=4, degree=3, x0=[0.0, 0.0],
        xf=[1.0, 0.0], tf_ref=3.0,
    )
    assert ftm.nq == 1 and ftm.ng == 2
    z0 = prob.initial_guess()
    assert z0.p.shape == (1,)
    np.testing.assert_allclose(float(ftm.final_time(z0.p)), 3.0, rtol=1e-12)
    np.testing.assert_allclose(
        float(ftm.final_time(jnp.array([np.log(2.0)]))), 6.0, rtol=1e-12
    )


def test_objective_is_time_plus_energy():
    """On a hand-built trajectory the transcribed objective equals
    time_weight·tf + 0.5·effort·∫u²dt (quadrature-exact for polynomial u)."""
    w_t, w_e = 0.7, 1.3
    prob, ftm = free_time_ocp(
        DoubleIntegrator(effort_weight=w_e), num_elements=5, degree=4,
        x0=[0.0, 0.0], xf=[1.0, 0.0], tf_ref=2.0, time_weight=w_t,
    )
    z = prob.initial_guess()
    tf = float(ftm.final_time(z.p))
    # Constant control u(t) = c on [0, tf]: ∫u²dt = c²·tf.
    c = 0.37
    V = z.V.at[:, 2].set(c)
    obj = float(prob.objective(z._replace(V=V)))
    expected = w_t * tf + 0.5 * w_e * c * c * tf
    np.testing.assert_allclose(obj, expected, rtol=1e-10)


def test_time_penalized_energy_matches_analytic():
    d = 1.0
    prob, ftm = free_time_ocp(
        DoubleIntegrator(effort_weight=1.0), num_elements=12, degree=4,
        x0=[0.0, 0.0], xf=[d, 0.0], tf_ref=3.0, time_weight=1.0,
    )
    z, stats = solve_ocp(prob, options=ALBarrierOptions(n_outer=14))
    t_star = (18.0 * d * d) ** 0.25
    tf = float(ftm.final_time(z.p))
    assert float(stats.cviol) < 1e-6
    np.testing.assert_allclose(tf, t_star, rtol=2e-3)
    # Optimal value J* = T* + 6 d²/T*³.
    j_star = t_star + 6.0 * d * d / t_star**3
    np.testing.assert_allclose(float(stats.objective), j_star, rtol=2e-3)
    # Endpoint states hit the boundary conditions.
    x_last = np.asarray(z.V[-1, :2])
    np.testing.assert_allclose(x_last, [d, 0.0], atol=1e-5)


@pytest.mark.slow
def test_minimum_time_bang_bang():
    d = 1.0
    prob, ftm = free_time_ocp(
        DoubleIntegrator(u_max=1.0), num_elements=16, degree=4,
        x0=[0.0, 0.0], xf=[d, 0.0], tf_ref=3.0, time_weight=1.0,
    )
    z, stats = solve_ocp(prob, options=ALBarrierOptions(n_outer=16))
    tf = float(ftm.final_time(z.p))
    assert float(stats.cviol) < 1e-6
    assert float(stats.gviol) <= 1e-10  # strictly feasible (barrier)
    # Bang-bang T* = 2√d; the barrier smooths the switch, biasing T up a bit.
    t_star = 2.0 * np.sqrt(d)
    assert t_star - 1e-3 < tf < t_star * 1.06
    # Control saturates near ±u_max away from the switch.
    u = np.asarray(z.V[:, 2])
    assert u.max() > 0.9 and u.min() < -0.9
