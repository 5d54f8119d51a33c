"""Aircraft longitudinal short-period model — BASELINE.json config 4.

"Aircraft longitudinal flight-dynamics output-error estimation from
flight-test data" (BASELINE.json configs[3]; SURVEY.md §3.4).  The classic
short-period output-error problem: two states (angle of attack alpha, pitch
rate q), elevator input, unknown dimensional stability/control derivatives.
Flight-test data for the example is synthesized with a fixed seed by
``examples/aircraft_oe.py`` (zero-egress environment: no real flight data
can be downloaded; SURVEY.md §0).
"""

from __future__ import annotations

import jax.numpy as jnp

from collocfem_tpu.model import Model


class AircraftLongitudinal(Model):
    """Short-period approximation with unknown dimensional derivatives.

    alpha' = Z_a * alpha + q + Z_d * de
    q'     = M_a * alpha + M_q * q + M_d * de

    p = [Z_a, M_a, M_q, Z_d, M_d].  Measured outputs: alpha, q, and the
    normal-acceleration proxy az = V/g0 * (alpha' - q) reconstructed from the
    model (standard output-error measurement set).
    """

    nx = 2
    nu = 1
    nq = 5

    def __init__(self, V: float = 60.0, g0: float = 9.81):
        self.V = float(V)
        self.g0 = float(g0)

    def f(self, x, u, p, t):
        del t
        alpha, q = x
        Za, Ma, Mq, Zd, Md = p
        de = u[0]
        return jnp.stack(
            [Za * alpha + q + Zd * de, Ma * alpha + Mq * q + Md * de]
        )

    def h(self, x, u, p, t):
        del t
        alpha, q = x
        Za, Ma, Mq, Zd, Md = p
        de = u[0]
        adot_minus_q = Za * alpha + Zd * de  # alpha' - q
        az = self.V / self.g0 * adot_minus_q
        return jnp.stack([alpha, q, az])
