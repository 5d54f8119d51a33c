"""Moving-horizon estimation: online sliding-window MAP state estimation.

Capability extension over the reference (SURVEY.md §2 lists no online
estimator; the lineage's estimation tools are batch): the same collocation
machinery, run as a **serving-style online estimator** — one jitted program
per incoming sample, static shapes throughout.

Design
------
* The window holds the most recent ``horizon`` samples at fixed spacing
  ``dt``.  The mesh (one degree-``degree`` element per sample interval) is
  built ONCE over the window's **local time** [0, (horizon−1)·dt]; sliding
  the window re-uses the identical compiled program because only the data
  pytree changes (models must be time-invariant — ``f``/``h`` receive local
  window time).
* Discarded information enters through a **filtering arrival cost**
  (Rao–Rawlings–Mayne): when the oldest sample y₀ leaves the window, the
  running prior (m, P) is EKF-updated with y₀ and propagated one sample
  interval by RK4 integration of the moment ODE (ṁ = f, Ṗ = AP + PAᵀ + Q_c).
  The prior lands in the window problem as a full-matrix sqrt-information
  x0 prior (``ProblemData.x0_w`` with L = chol(P)⁻¹), so correlated arrival
  uncertainty is carried exactly.
* Each ``step`` warm-starts from the previous window solution shifted by
  one element and solves the window MAP problem with the standard damped
  Gauss-Newton driver (block-tridiagonal KKT — no arrowhead: parameters are
  fixed online).

For linear-Gaussian models this scheme reproduces the Kalman filter at the
newest sample (up to collocation/RK4 discretization error) — enforced by
``tests/test_mhe.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from collocfem_tpu.model import Model
from collocfem_tpu.ops.mesh import uniform_mesh
from collocfem_tpu.problem import (
    Decision,
    EstimationProblem,
    ProblemData,
    group_measurements,
)
from collocfem_tpu.solve.newton import SolverOptions, make_gn_solver


class _FixedParamModel(Model):
    """Wrap a model with nq > 0, pinning its parameters to known values."""

    def __init__(self, base: Model, p_fixed):
        self.base = base
        self.p_fixed = jnp.asarray(p_fixed)
        if self.p_fixed.shape != (base.nq,):
            raise ValueError(
                f"p_fixed must have shape ({base.nq},), got "
                f"{self.p_fixed.shape}"
            )
        self.nx, self.nu, self.nq = base.nx, base.nu, 0

    def f(self, x, u, p, t):
        del p
        return self.base.f(x, u, self.p_fixed, t)

    def h(self, x, u, p, t):
        del p
        return self.base.h(x, u, self.p_fixed, t)


class MHEState(NamedTuple):
    """Carry pytree of the moving-horizon estimator (one per stream).

    Attributes:
      z: current window MAP solution (warm start for the next step).
      m: (nx,) arrival-prior mean at the window start — the filtered mean
         given every sample that has LEFT the window.
      P: (nx, nx) arrival-prior covariance at the window start.
      y: (H, ny) window measurements, oldest first.
      u: (H−1, nu) zero-order-hold inputs per sample interval.
      k: () int32 — samples consumed so far (init window counts as H).
    """

    z: Decision
    m: jnp.ndarray
    P: jnp.ndarray
    y: jnp.ndarray
    u: jnp.ndarray
    k: jnp.ndarray


class MovingHorizonEstimator:
    """Sliding-window MAP estimator over the last ``horizon`` samples.

    Args:
      model: time-invariant :class:`Model` (local window time is passed to
        ``f``/``h``).  Models with unknown parameters require ``p_fixed``.
      horizon: number of samples in the window (≥ 2).
      dt: sample spacing.
      sig_w: process-noise spectral density (scalar or (nx,) — √Q_c diag).
      sig_v: measurement noise std (scalar or (ny,)).
      degree: LGL element degree per sample interval.
      p_fixed: known parameter values when ``model.nq > 0``.
      substeps: RK4 substeps for the arrival-cost moment propagation.
      options: Gauss-Newton solver options for the window solve.

    Usage::

        mhe = MovingHorizonEstimator(model, horizon=10, dt=0.1,
                                     sig_w=0.3, sig_v=0.05)
        state = mhe.init(y_first_window, m0=m0, P0=P0)
        state, est = mhe.step(state, y_new, u_new)
    """

    def __init__(
        self,
        model: Model,
        horizon: int,
        dt: float,
        sig_w,
        sig_v,
        degree: int = 4,
        p_fixed=None,
        substeps: int = 4,
        options: SolverOptions | None = None,
        dtype=None,
    ):
        if horizon < 2:
            raise ValueError("horizon must be >= 2 samples")
        if model.nq > 0:
            if p_fixed is None:
                raise ValueError(
                    "model has unknown parameters; MHE estimates states only "
                    "— pass p_fixed with their known values"
                )
            model = _FixedParamModel(model, p_fixed)
        self.model = model
        self.horizon = int(horizon)
        self.dt = float(dt)
        self.degree = int(degree)
        self.substeps = int(substeps)
        nx, ny = model.nx, model.ny

        mesh = uniform_mesh(0.0, (horizon - 1) * dt, horizon - 1, degree)
        t_samples = np.arange(horizon, dtype=np.float64) * dt
        sw = np.broadcast_to(np.asarray(sig_w, np.float64), (nx,))
        sv = np.broadcast_to(np.asarray(sig_v, np.float64), (ny,))
        # Full-rule defect quadrature: the interior rule's dropped
        # left-endpoint weight biases the process-noise integral by
        # O(1/(d(d+1))) — visible against the Kalman-filter oracle.
        self.problem = EstimationProblem.build(
            model, mesh, t_samples, defect_weight=1.0 / sw, dtype=dtype,
            defect_rule="full",
        )
        self.dtype = self.problem.dtype
        self._t_samples = t_samples
        self._meas_w = np.asarray(1.0 / sv, self.dtype)
        self._Qc = np.diag(sw**2).astype(self.dtype)
        self._R = np.diag(sv**2).astype(self.dtype)

        # Static (element, slot) -> sample-index table: the window's grouped
        # measurement values are a pure gather of the (H, ny) ring buffer,
        # so the whole data pytree is built inside jit.
        idx = np.arange(horizon, dtype=np.float64)[:, None]
        ig, _, _, _ = group_measurements(
            mesh, t_samples, idx, pad_to=self.problem.mrows.shape[1]
        )
        self._slot_sample = ig[..., 0].astype(np.int32)  # (N, S)

        self._solver = make_gn_solver(
            self.problem, options or SolverOptions(maxiter=25)
        )
        self._jit_step = jax.jit(self._step_impl)

    # -- data plumbing ---------------------------------------------------------
    def _sqrt_info(self, P):
        """P = S Sᵀ (chol)  →  L = S⁻¹ with ‖L(x−m)‖² = (x−m)ᵀP⁻¹(x−m)."""
        S = jnp.linalg.cholesky(P)
        eye = jnp.eye(P.shape[0], dtype=P.dtype)
        return jax.scipy.linalg.solve_triangular(S, eye, lower=True)

    def _data(self, y_win, u_win, m, P) -> ProblemData:
        n, d = self.problem.mesh.num_elements, self.degree
        nu, nq = self.model.nu, self.model.nq
        yg = y_win[self._slot_sample]  # (N, S, ny); padded slots masked out
        u_nodes = jnp.broadcast_to(u_win[:, None, :], (n, d + 1, nu))
        return ProblemData(
            y=yg.astype(self.dtype),
            u=u_nodes.astype(self.dtype),
            meas_w=jnp.asarray(self._meas_w),
            p_prior=jnp.zeros((nq,), self.dtype),
            p_w=jnp.zeros((nq,), self.dtype),
            x0_prior=m,
            x0_w=self._sqrt_info(P),
        )

    # -- arrival-cost EKF pieces -------------------------------------------------
    def _ekf_update(self, m, P, y, u, t):
        hfun = lambda x: self.model.h(x, u, jnp.zeros((0,), m.dtype), t)
        H = jax.jacfwd(hfun)(m)
        S = H @ P @ H.T + self._R
        K = jnp.linalg.solve(S, H @ P).T
        m2 = m + K @ (y - hfun(m))
        ikh = jnp.eye(m.shape[0], dtype=m.dtype) - K @ H
        P2 = ikh @ P @ ikh.T + K @ self._R @ K.T  # Joseph form
        return m2, 0.5 * (P2 + P2.T)

    def _propagate(self, m, P, u, t0):
        """RK4 moment propagation over one sample interval under ZOH input."""
        zq = jnp.zeros((0,), m.dtype)
        ffun = lambda x, t: self.model.f(x, u, zq, t)

        def ode(state, t):
            m_, P_ = state
            A = jax.jacfwd(lambda xx: ffun(xx, t))(m_)
            return ffun(m_, t), A @ P_ + P_ @ A.T + self._Qc

        h = self.dt / self.substeps

        def rk4(state, i):
            t = t0 + i * h
            k1 = ode(state, t)
            add = lambda s, k, a: (s[0] + a * k[0], s[1] + a * k[1])
            k2 = ode(add(state, k1, 0.5 * h), t + 0.5 * h)
            k3 = ode(add(state, k2, 0.5 * h), t + 0.5 * h)
            k4 = ode(add(state, k3, h), t + h)
            m_ = state[0] + (h / 6) * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
            P_ = state[1] + (h / 6) * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
            return (m_, P_), None

        (m2, P2), _ = jax.lax.scan(
            rk4, (m, P), jnp.arange(self.substeps, dtype=m.dtype)
        )
        return m2, 0.5 * (P2 + P2.T)

    # -- public API --------------------------------------------------------------
    def init(self, y_window, m0, P0, u_window=None) -> MHEState:
        """Solve the first full window.  ``y_window``: (horizon, ny)."""
        h, nu = self.horizon, self.model.nu
        y = np.atleast_2d(np.asarray(y_window, np.float64))
        if y.shape != (h, self.model.ny):
            raise ValueError(
                f"y_window must be ({h}, {self.model.ny}), got {y.shape}"
            )
        u = (
            np.zeros((h - 1, nu))
            if u_window is None
            else np.asarray(u_window, np.float64).reshape(h - 1, nu)
        )
        m0 = jnp.asarray(np.asarray(m0, np.float64), self.dtype)
        P0 = jnp.asarray(np.asarray(P0, np.float64), self.dtype)
        z0 = self.problem.initial_guess_from_data(
            self._t_samples, y, np.zeros((0,))
        )
        data = self._data(
            jnp.asarray(y, self.dtype), jnp.asarray(u, self.dtype), m0, P0
        )
        z, _ = self._solver(z0, data)
        return MHEState(
            z=z, m=m0, P=P0,
            y=jnp.asarray(y, self.dtype), u=jnp.asarray(u, self.dtype),
            k=jnp.asarray(self.horizon, jnp.int32),
        )

    def _step_impl(self, state: MHEState, y_new, u_new):
        d, nx = self.degree, self.model.nx
        # 1. Fold the departing oldest sample into the arrival prior.
        m, P = self._ekf_update(state.m, state.P, state.y[0], state.u[0], 0.0)
        m, P = self._propagate(m, P, state.u[0], 0.0)
        # 2. Slide the window.
        y_win = jnp.concatenate([state.y[1:], y_new[None, :]])
        u_win = jnp.concatenate([state.u[1:], u_new[None, :]])
        # 3. Warm start: shift the previous solution one element left and
        #    hold the newest state over the fresh interval.
        v_tail = jnp.broadcast_to(state.z.V[-1], (d, nx))
        v_warm = jnp.concatenate([state.z.V[d:], v_tail])
        z0 = Decision(V=v_warm, p=jnp.zeros((0,), self.dtype))
        # 4. Window MAP solve with the full-matrix arrival prior.
        data = self._data(y_win, u_win, m, P)
        z, _ = self._solver(z0, data)
        new_state = MHEState(z=z, m=m, P=P, y=y_win, u=u_win, k=state.k + 1)
        return new_state, z.V[-1]

    def step(self, state: MHEState, y_new, u_new=None):
        """Consume one sample; returns (new_state, (nx,) newest-state MAP)."""
        y_new = jnp.asarray(y_new, self.dtype).reshape(self.model.ny)
        u_new = (
            jnp.zeros((self.model.nu,), self.dtype)
            if u_new is None
            else jnp.asarray(u_new, self.dtype).reshape(self.model.nu)
        )
        return self._jit_step(state, y_new, u_new)

    def estimate(self, state: MHEState) -> jnp.ndarray:
        """(nx,) MAP state at the newest sample of the window."""
        return state.z.V[-1]

    def current_covariance(self, state: MHEState) -> jnp.ndarray:
        """(nx, nx) posterior covariance at the newest sample.

        The last node's marginal from the Takahashi selected inverse of the
        window KKT (solve.covariance) — for linear-Gaussian models this is
        the Kalman filtered covariance.
        """
        from collocfem_tpu.solve.covariance import state_covariance_nodes

        data = self._data(state.y, state.u, state.m, state.P)
        return state_covariance_nodes(self.problem, state.z, data)[-1]
