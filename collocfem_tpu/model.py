"""Model layer (L3): ODE dynamics, output maps, costs, constraints.

Capability parity target: the reference's per-problem model definitions
(SURVEY.md §1 L3, §2a "Model codegen").  The reference lineage generates
f/h and their first/second derivatives via symbolic codegen (sympy ->
numpy); here every derivative comes from JAX AD (``jacfwd`` per element,
BASELINE.json north_star), so a model is just a set of **pure JAX
functions** — no codegen step, no sparsity tables to hand-maintain.

Conventions:
  x: (nx,) state          u: (nu,) input (may be empty)
  p: (nq,) parameters     t: scalar time
All functions must be traceable (jnp only, no Python branching on values).
Model instances are static pytree-free objects captured in jit closures;
they must be cheap to hash/compare by identity.
"""

from __future__ import annotations

import jax.numpy as jnp


class Model:
    """Base class for collocation models.

    Subclasses must set ``nx``, ``nu``, ``nq`` and implement ``f``.  The
    output map ``h`` defaults to full state observation.  ``g`` (inequality
    path constraints, g <= 0) and ``running_cost`` are optional and are used
    by the trajectory-optimization solver (SURVEY.md §3.3).
    """

    nx: int = 0  # number of states
    nu: int = 0  # number of exogenous/decision inputs
    nq: int = 0  # number of unknown parameters
    ng: int = 0  # number of inequality path constraints
    ne: int = 0  # number of equality path constraints

    def f(self, x, u, p, t):
        """State derivative dx/dt. Returns (nx,)."""
        raise NotImplementedError

    def h(self, x, u, p, t):
        """Measured output. Returns (ny,). Defaults to full state."""
        del u, p, t
        return x

    @property
    def ny(self) -> int:
        if not hasattr(self, "_ny"):
            import numpy as np

            zx = jnp.zeros(self.nx)
            zu = jnp.zeros(self.nu)
            zp = jnp.zeros(self.nq)
            object.__setattr__(self, "_ny", int(np.shape(self.h(zx, zu, zp, 0.0))[0]))
        return self._ny

    def g(self, x, u, p, t):
        """Inequality path constraints, enforced as g(...) <= 0. Returns (ng,)."""
        del x, u, p, t
        return jnp.zeros((0,))

    def g_eq(self, x, u, p, t):
        """Equality path constraints, enforced as g_eq(...) = 0. Returns (ne,).

        Enforced at every global collocation node by the augmented-Lagrangian
        OCP solver (solve.auglag), alongside the defect and boundary equality
        groups.  Control-affine constraints (e.g. actuator coupling) are
        well-posed; state-only equalities may conflict with the dynamics
        (DAE index issues) and are the caller's responsibility.
        """
        del x, u, p, t
        return jnp.zeros((0,))

    def running_cost(self, x, u, p, t):
        """Integrand of the running cost for trajectory optimization.

        Defaults to ``0.5 * ||running_cost_residual||^2`` so subclasses only
        define the residual form (which the Gauss-Newton OCP solver needs).
        """
        r = self.running_cost_residual(x, u, p, t)
        return 0.5 * jnp.sum(r * r)

    def running_cost_residual(self, x, u, p, t):
        """Running cost in least-squares form: cost = 0.5 ||r||^2.

        Returns (nl,).  The trajectory-optimization solver (solve.auglag)
        consumes this form so the running cost joins the Gauss-Newton system
        like any other residual group.
        """
        del x, u, p, t
        return jnp.zeros((0,))

    def terminal_cost_residual(self, x, p):
        """Terminal (Mayer) cost in least-squares form: 0.5 ||r||^2 at t_f."""
        del x, p
        return jnp.zeros((0,))
