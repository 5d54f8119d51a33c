"""Kalman filtering / smoothing subpackage.

Capability parity target: the reference lineage's ``kalman`` module
(SURVEY.md §0 [R]: the ceacoest research line uses Kalman/unscented
filtering both as an estimator in its own right and to produce initial
guesses for the joint MAP collocation estimation).  Reimplemented
TPU-first: every filter/smoother is a ``lax.scan`` over time with static
shapes (vmap over experiments for free), the float32-safe path is a
QR-based square-root form (QR runs on the MXU), and the innovations
negative log-likelihood (prediction-error method) is differentiable
end-to-end for ML parameter estimation.

Public API:
  van_loan, discretize_lti           — exact LTI discretization (disc)
  kalman_filter, rts_smoother        — linear KF / RTS      (filtering)
  ekf_filter, ukf_filter, cd_smoother— continuous-discrete EKF/UKF + RTS
  sqrt_kalman_filter, sqrt_rts_smoother — square-root forms  (sqrt)
  make_ekf_nll, make_ukf_nll, run_lbfgs — PEM / ML estimation (pem)
  smoother_initial_guess             — warm start for EstimationProblem
"""

from collocfem_tpu.kalman.disc import discretize_lti, van_loan
from collocfem_tpu.kalman.filtering import (
    FilterResult,
    cd_smoother,
    ekf_filter,
    kalman_filter,
    rts_smoother,
    ukf_filter,
)
from collocfem_tpu.kalman.initialize import smoother_initial_guess
from collocfem_tpu.kalman.pem import (
    make_ekf_nll,
    make_lti_nll,
    make_ukf_nll,
    run_lbfgs,
)
from collocfem_tpu.kalman.sqrt import sqrt_kalman_filter, sqrt_rts_smoother

__all__ = [
    "van_loan",
    "discretize_lti",
    "FilterResult",
    "kalman_filter",
    "rts_smoother",
    "ekf_filter",
    "ukf_filter",
    "cd_smoother",
    "sqrt_kalman_filter",
    "sqrt_rts_smoother",
    "make_ekf_nll",
    "make_ukf_nll",
    "make_lti_nll",
    "run_lbfgs",
    "smoother_initial_guess",
]
