"""Pendulum swing-up — BASELINE.json config 3.

"Pendulum swing-up trajectory optimization with path constraints (exercises
inequality/active-set handling)" (BASELINE.json configs[2]; SURVEY.md §3.3).
The reference lineage hands inequality problems to IPOPT (SURVEY.md §2b);
here they are solved by the on-device augmented-Lagrangian / log-barrier
Gauss-Newton solver (collocfem_tpu.solve.auglag), which keeps the KKT system
block-tridiagonal + arrowhead.
"""

from __future__ import annotations

import jax.numpy as jnp

from collocfem_tpu.model import Model


class Pendulum(Model):
    """theta' = w;  w' = -(g/l) sin(theta) + u / (m l^2), torque-limited.

    State x = [theta, w]; control u (decision variable); no unknown
    parameters.  Path constraint |u| <= u_max  =>  g = [u - u_max, -u - u_max].
    Swing-up: theta: 0 -> pi with terminal boundary conditions, minimum
    integrated torque^2.
    """

    nx = 2
    nu = 1
    nq = 0
    ng = 2

    def __init__(self, m=1.0, l=0.5, grav=9.81, u_max=2.0, effort_weight=1.0):
        self.m, self.l, self.grav = float(m), float(l), float(grav)
        self.u_max = float(u_max)
        self.effort_weight = float(effort_weight)

    def f(self, x, u, p, t):
        del p, t
        theta, w = x
        acc = -(self.grav / self.l) * jnp.sin(theta) + u[0] / (self.m * self.l**2)
        return jnp.stack([w, acc])

    def g(self, x, u, p, t):
        del x, p, t
        return jnp.stack([u[0] - self.u_max, -u[0] - self.u_max])

    def running_cost_residual(self, x, u, p, t):
        del x, p, t
        return jnp.sqrt(self.effort_weight) * u
