"""Smoother-based warm starts for collocation estimation.

The reference lineage's workflow (SURVEY.md §0 [R]): run an (unscented)
Kalman smoother at a nominal parameter value, then hand the smoothed state
path to the joint MAP collocation problem as its initial guess — far
closer to the basin of attraction than interpolating raw measurements
(``EstimationProblem.initial_guess_from_data``), especially for states
that are not directly measured.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from collocfem_tpu.kalman.filtering import cd_smoother, ekf_filter, ukf_filter
from collocfem_tpu.problem import Decision


def smoother_initial_guess(problem, t_meas, y, p0, R, Qc, m0=None, P0=None,
                           u_nodes=None, substeps: int = 4,
                           kind: str = "ekf") -> Decision:
    """Decision warm start from a CD-EKF/UKF fixed-interval smoother.

    The filter runs at ``p0`` over the measurement grid (inputs, if any,
    interpolated from the mesh nodes); the smoothed means are then
    interpolated to the collocation node times.  ``R`` (ny, ny) and ``Qc``
    (nx, nx) set measurement/process noise; defaults for the diffuse prior
    are m0 = measured channels at the first sample (zeros elsewhere) and
    P0 = 1e4 * max(1, max |y|)^2 * I.
    """
    model = problem.model
    t_meas = np.asarray(t_meas, dtype=np.float64)
    y = np.atleast_2d(np.asarray(y, dtype=np.float64))
    nx = model.nx

    u_meas = None
    if model.nu > 0:
        # u_nodes follows pack_data's convention: (num_elements, degree+1,
        # nu) sampled at mesh.elem_times.  Element-boundary nodes appear
        # twice in the flattened grid; np.interp handles the duplicates.
        tt = np.asarray(problem.mesh.elem_times).ravel()
        un = (np.zeros((tt.size, model.nu)) if u_nodes is None
              else np.asarray(u_nodes).reshape(-1, model.nu))
        u_meas = np.stack(
            [np.interp(t_meas, tt, un[:, j]) for j in range(model.nu)],
            axis=1)

    if m0 is None:
        m0 = np.zeros(nx)
        m0[: min(nx, y.shape[1])] = y[0, : min(nx, y.shape[1])]
    if P0 is None:
        # Moderate, data-scaled prior — deliberately NOT diffuse: UKF sigma
        # points at +-sqrt((nx+lam) P0) must stay inside the region where
        # fixed-substep RK4 of the dynamics is stable (a 1e4-scale diffuse
        # prior throws sigma points ~100 state-units out, which explodes
        # through stiff nonlinear dynamics like Van der Pol).  The first
        # update (dt0 = 0) anchors the measured channels before any
        # propagation happens, so a tight prior costs little.
        P0 = 4.0 * max(1.0, float(np.max(np.abs(y)))) ** 2 * np.eye(nx)

    filt = {"ekf": ekf_filter, "ukf": ukf_filter}[kind]
    res = filt(model, jnp.asarray(p0), t_meas, y, R, Qc, m0, P0,
               u=u_meas, substeps=substeps)
    ms, _ = cd_smoother(res)
    ms = np.asarray(ms)

    node_t = np.asarray(problem.mesh.node_times)
    V0 = np.stack(
        [np.interp(node_t, t_meas, ms[:, j]) for j in range(nx)], axis=1)
    return Decision(V=jnp.asarray(V0, problem.dtype),
                    p=jnp.asarray(p0, problem.dtype))
