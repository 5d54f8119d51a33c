"""On-device trajectory simulation for data synthesis and validation.

Replaces the reference's scipy.integrate usage in examples/tests with a
jitted fixed-step RK4 under ``lax.scan`` — batchable with vmap (used to
synthesize the 1024-experiment config on device) and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rk4_trajectory(f, x0, ts, u_fn=None, p=None):
    """Integrate dx/dt = f(x, u, p, t) over sample times ``ts`` with RK4.

    Args:
      f: dynamics ``f(x, u, p, t) -> (nx,)`` (a Model.f works directly).
      x0: (nx,) initial state.
      ts: (T,) strictly increasing sample times (possibly nonuniform; one
          RK4 step per interval — refine ``ts`` for accuracy).
      u_fn: optional ``u_fn(t) -> (nu,)``; defaults to zero input.
      p: (nq,) parameters (defaults to empty).
    Returns:
      (T, nx) states at ``ts`` (first row = x0).
    """
    ts = jnp.asarray(ts)
    x0 = jnp.asarray(x0)
    p = jnp.zeros((0,)) if p is None else jnp.asarray(p)
    if u_fn is None:
        u_fn = lambda t: jnp.zeros((0,))

    def step(x, t_pair):
        t0, t1 = t_pair
        h = t1 - t0
        k1 = f(x, u_fn(t0), p, t0)
        k2 = f(x + 0.5 * h * k1, u_fn(t0 + 0.5 * h), p, t0 + 0.5 * h)
        k3 = f(x + 0.5 * h * k2, u_fn(t0 + 0.5 * h), p, t0 + 0.5 * h)
        k4 = f(x + h * k3, u_fn(t1), p, t1)
        x1 = x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return x1, x1

    _, xs = jax.lax.scan(step, x0, (ts[:-1], ts[1:]))
    return jnp.concatenate([x0[None], xs], axis=0)
