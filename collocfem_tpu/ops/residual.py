"""Per-element collocation residual primitives (L4, SURVEY.md §2a
"Collocation defect residual" / "Measurement & cost terms").

All functions here are pure jnp and operate on a **single element**; the
problem layer vmaps them over all elements (BASELINE.json north_star:
"per-element residual and defect evaluation ... becomes a vmapped kernel
over all elements").  Derivatives come from jacfwd at the assembly layer —
nothing here hand-codes a Jacobian.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from collocfem_tpu.ops.einsum_hp import einsum_hp


def element_derivative(diff: jnp.ndarray, width, Xe: jnp.ndarray) -> jnp.ndarray:
    """Collocation-polynomial time derivative at all element nodes.

    Args:
      diff:  (d+1, d+1) reference-element differentiation matrix.
      width: scalar element width h_e.
      Xe:    (d+1, n) node values.
    Returns:
      (d+1, n) dX/dt at the nodes (chain rule: dtau/dt = 2/h).

    Numerics: D annihilates constants (its rows sum to zero), so the
    element-left value is subtracted first — mathematically identical, but
    it removes the O(|X|) cancellation in D @ X that left the derivative
    with only ~3 significant digits in float32 on fine meshes (h ~ 1e-3),
    which stalled convergence at N ~ 10^4 elements on TPU.
    """
    return (2.0 / width) * einsum_hp(
        "kj,jn->kn", diff, Xe - Xe[:1], preferred_element_type=Xe.dtype
    )


def defect_residual(model, diff, width, times, Xe, Ue, p, scale):
    """Weighted collocation defects at local nodes 1..d of one element.

    The defect at node k is  dx/dt(t_k) - f(x_k, u_k, p, t_k); it is skipped
    at local node 0 (enforced as node d of the previous element; node 0 of
    the first element carries the initial condition / prior instead).

    Args:
      model: Model instance.
      diff:  (d+1, d+1) differentiation matrix.
      width: scalar h_e.
      times: (d+1,) node times.
      Xe:    (d+1, nx) node states.
      Ue:    (d+1, nu) node inputs.
      p:     (nq,) parameters.
      scale: (d, nx) multiplicative sqrt-weights (quadrature x process noise).
    Returns:
      (d, nx) scaled defect residuals.
    """
    xdot = element_derivative(diff, width, Xe)
    fvals = jax.vmap(model.f, in_axes=(0, 0, None, 0))(Xe, Ue, p, times)
    return (xdot - fvals)[1:, :] * scale


def defect_residual_all(model, diff, width, times, Xe, Ue, p, scale):
    """Weighted defects at ALL d+1 nodes of one element.

    Used by the trajectory-optimization layer: enforcing the defect at every
    LGL node (standard pseudospectral practice) pins the degree-d defect
    polynomial at d+1 points, so it vanishes identically — collocating only
    at d nodes leaves one dynamics-violating control mode per element that an
    optimizer will exploit.  The resulting constraint set is mildly
    over-determined across shared nodes, which the augmented-Lagrangian
    least-squares treatment absorbs.

    Returns (d+1, nx) scaled defect residuals (``scale`` is (d+1, nx)).
    """
    xdot = element_derivative(diff, width, Xe)
    fvals = jax.vmap(model.f, in_axes=(0, 0, None, 0))(Xe, Ue, p, times)
    return (xdot - fvals) * scale


def measurement_residual(model, rows, Xe, Ue_meas, p, times, y, w, mask):
    """Weighted output residuals for the measurements landing in one element.

    Args:
      model:   Model instance.
      rows:    (S, d+1) Lagrange interpolation rows at the sample times.
      Xe:      (d+1, nx) node states.
      Ue_meas: (S, nu) input at the sample times.
      p:       (nq,) parameters.
      times:   (S,) sample times.
      y:       (S, ny) measured values (padded entries arbitrary).
      w:       (ny,) or (S, ny) sqrt measurement weights.
      mask:    (S,) 1.0 for real samples, 0.0 for padding.
    Returns:
      (S, ny) scaled residuals (zero on padding).
    """
    x_s = einsum_hp("sj,jn->sn", rows, Xe, preferred_element_type=Xe.dtype)
    h_s = jax.vmap(model.h, in_axes=(0, 0, None, 0))(x_s, Ue_meas, p, times)
    return (h_s - y) * w * mask[:, None]


def interpolate_states(rows, Xe):
    """(S, d+1) rows x (d+1, n) node values -> (S, n) interpolated values."""
    return einsum_hp("sj,jn->sn", rows, Xe, preferred_element_type=Xe.dtype)
