"""Duffing oscillator — BASELINE.json config 2.

"Duffing oscillator joint state-path + parameter estimation, refined mesh
N=1k elements" (BASELINE.json configs[1]; SURVEY.md §3.2): the defects carry
a process-noise weight so the state path is itself a MAP decision variable
(joint state-path + parameter estimation, the Automatica-2017 line of work
per SURVEY.md §0 [R]).
"""

from __future__ import annotations

import jax.numpy as jnp

from collocfem_tpu.model import Model


class Duffing(Model):
    """x1' = x2;  x2' = -delta x2 - alpha x1 - beta x1^3 + gamma cos(omega t).

    Parameters p = [alpha, beta, delta]; forcing amplitude gamma and
    frequency omega are known constants.  Measured output: x1.
    """

    nx = 2
    nu = 0
    nq = 3

    def __init__(self, gamma: float = 0.3, omega: float = 1.2):
        self.gamma = float(gamma)
        self.omega = float(omega)

    def f(self, x, u, p, t):
        del u
        x1, x2 = x
        alpha, beta, delta = p
        force = self.gamma * jnp.cos(self.omega * t)
        return jnp.stack([x2, -delta * x2 - alpha * x1 - beta * x1**3 + force])

    def h(self, x, u, p, t):
        del u, p, t
        return x[:1]
