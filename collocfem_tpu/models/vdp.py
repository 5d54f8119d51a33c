"""Van der Pol oscillator — BASELINE.json config 1.

"Van der Pol oscillator parameter estimation, LGL collocation, N=100
elements" (BASELINE.json configs[0]; SURVEY.md §3.1).  Reference mount was
empty, so the model is the canonical VdP used throughout the dimasad
estimation lineage: unknown damping (and optionally stiffness/forcing gain).
"""

from __future__ import annotations

import jax.numpy as jnp

from collocfem_tpu.model import Model


class VanDerPol(Model):
    """x1' = x2;  x2' = mu (1 - x1^2) x2 - x1 + b u.

    Parameters p = [mu, b].  Measured output: x1 (position) by default.
    """

    nx = 2
    nu = 1
    nq = 2

    def __init__(self, measure_full_state: bool = False):
        self.measure_full_state = measure_full_state

    def f(self, x, u, p, t):
        del t
        x1, x2 = x
        mu, b = p
        return jnp.stack([x2, mu * (1.0 - x1**2) * x2 - x1 + b * u[0]])

    def h(self, x, u, p, t):
        del u, p, t
        return x if self.measure_full_state else x[:1]
