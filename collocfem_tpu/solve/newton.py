"""Fully on-device Gauss-Newton / Levenberg-Marquardt driver.

Capability parity target: the reference's Newton/GN/IRLS outer loop with
line search / damping (SURVEY.md §2a "Newton/GN/IRLS driver", §3.1;
BASELINE.json north_star: "line-search/damping logic runs jit-compiled with
lax.while_loop so the full estimation loop stays on-device").

The whole solve — assemble, factorize, step, accept/reject, convergence —
is a single ``lax.while_loop`` under jit: zero host round-trips per
iteration.  Per-iteration diagnostics are written into a fixed-size history
array (SURVEY.md §5 "Metrics / logging": a returned per-iteration table,
masked by iteration count, plus optional jax.debug.print tracing).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from collocfem_tpu.ops.assemble import (
    assemble_gn,
    assemble_gn_soa,
    assemble_newton,
    blocks_to_nodes,
    blocks_to_nodes_soa,
    soa_from_blocks,
)
from collocfem_tpu.ops import doubleword
from collocfem_tpu.problem import Decision
from collocfem_tpu.solve.kkt import solve_kkt, solve_kkt_soa

HISTORY_COLS = ("cost", "grad_norm", "lam", "step_norm", "accepted")


@dataclasses.dataclass(frozen=True)
class SolverOptions:
    """Static solver configuration (plain dataclass per SURVEY.md §5
    "Config / flag system": no gin/hydra)."""

    maxiter: int = 50
    gtol: float = 1e-10
    ftol: float = 0.0
    xtol: float = 0.0
    # lam is DIMENSIONLESS: the damping added is lam * max(diag(H)) * I
    # (solve.kkt._equilibrate).  1e-9 starts effectively undamped — the
    # right regime for well-initialized collocation problems — and the LM
    # loop inflates it on rejections.
    lam0: float = 1e-9
    lam_up: float = 5.0
    lam_down: float = 0.2
    lam_min: float = 1e-14
    lam_max: float = 1e12
    # 'auto' resolves at solver-build time: the single-kernel SPIKE chain
    # solve on TPU (launch-count-bound regime), per-level CR elsewhere.
    method: str = "auto"     # 'auto'|'spike'|'cr'|'cr_dw'|'scan'|'dense'|...
    kkt_refine: int = 0      # iterative-refinement passes per KKT solve
    verbose: bool = False
    irls_delta: float = 0.0  # >0 enables Huber IRLS reweighting
    # 'gn' drops the curvature term sum_i r_i * hess(r_i) (Gauss-Newton);
    # 'newton' assembles the exact per-element Hessian (ops.assemble.
    # assemble_newton) for quadratic local convergence on large-residual
    # fits.  The LM damping/rejection logic absorbs indefiniteness.
    hessian: str = "gn"      # 'gn' | 'newton'


class SolveStats(NamedTuple):
    iterations: jnp.ndarray  # () int
    converged: jnp.ndarray   # () bool
    cost: jnp.ndarray        # () final cost
    grad_norm: jnp.ndarray   # () final gradient inf-norm
    lam: jnp.ndarray         # () final damping
    history: jnp.ndarray     # (maxiter, 5) per-iteration table


class _LoopState(NamedTuple):
    z: Decision
    cost: jnp.ndarray      # high word of the current cost
    cost_lo: jnp.ndarray   # low word (DW accumulation; 0 in f64 runs)
    lam: jnp.ndarray
    nu: jnp.ndarray        # Nielsen reject-escalation factor
    it: jnp.ndarray
    done: jnp.ndarray
    gnorm: jnp.ndarray
    history: jnp.ndarray


def make_gn_solver(problem, options: SolverOptions = SolverOptions()):
    """Build a jitted ``solve(z0, data) -> (z, SolveStats)`` for ``problem``.

    The returned function is traced once per (shapes, options) and can be
    vmapped over a batch axis of (z0, data) for multi-experiment estimation
    (BASELINE.json config 5).
    """
    opt = options
    if opt.method == "auto":
        method = "spike" if jax.default_backend() == "tpu" else "cr"
        opt = dataclasses.replace(opt, method=method)
    nv = problem.nv
    num_nodes = problem.num_nodes
    soa = opt.method in ("cr", "cr_dw", "spike")

    @jax.jit
    def solve(z0: Decision, data):
        def body(st: _LoopState) -> _LoopState:
            # Default hot path runs entirely in the SoA (chain-on-lanes)
            # layout: block-major (K, b, b) arrays tile-pad 16x on TPU and
            # their layout shuffles dominated the iteration (see
            # solve.kkt).  Alternative methods keep the block-major path.
            if opt.hessian == "newton":
                sys = assemble_newton(problem, st.z, data)
                if soa:
                    sys = soa_from_blocks(sys)
            elif soa:
                sys = assemble_gn_soa(problem, st.z, data)
            else:
                sys = assemble_gn(problem, st.z, data)
            gnorm = jnp.maximum(
                jnp.max(jnp.abs(sys.gx)), jnp.max(jnp.abs(sys.gp), initial=0.0)
            )
            if soa:
                dx, dp = solve_kkt_soa(
                    sys, st.lam, opt.kkt_refine,
                    dw=opt.method == "cr_dw",
                    spike=opt.method == "spike",
                )
                dV = blocks_to_nodes_soa(dx, num_nodes, nv)
                diag_for_lam = jnp.stack(
                    [sys.D[i, i] for i in range(sys.D.shape[0])]
                )
            else:
                dx, dp = solve_kkt(sys, st.lam, opt.method, opt.kkt_refine)
                dV = blocks_to_nodes(dx, num_nodes, nv)
                diag_for_lam = jnp.einsum("kii->ki", sys.D)
            if sys.C.shape[0]:
                diag_for_lam = jnp.concatenate(
                    [diag_for_lam.ravel(), jnp.diag(sys.C)]
                )
            gx_flat = sys.gx.ravel()
            dx_flat = dx.ravel()
            z_try = Decision(V=st.z.V + dV, p=st.z.p + dp)
            # DW cost: the accept test must resolve improvements below
            # f32's ~cost*6e-8 resolution or LM freezes on large meshes
            # (see EstimationProblem.cost_dw).
            ct = problem.cost_dw(z_try, data)
            step_norm = jnp.sqrt(jnp.sum(dV * dV) + jnp.sum(dp * dp))
            c_cur = doubleword.DW(st.cost, st.cost_lo)
            actual = doubleword.to_single(doubleword.sub(c_cur, ct))

            # Gain-ratio acceptance (standard LM): predicted decrease of
            # the quadratic model when (H + lam_abs I)step = -g is
            #   pred = 0.5 * (lam_abs * ||step||^2 - g . step) > 0.
            # A junk step from a noise-indefinite f32 factorization has
            # enormous ||step|| (huge pred) but near-zero actual decrease
            # -> rho ~ 0 -> rejected, even when it shaves 1e-10 off the
            # cost.  A fine-resolution (DW) plain decrease test would
            # ACCEPT such steps and wander the soft modes — measured on
            # the N=10k multilevel run as a mu drift from 1.00 to 1.5.
            dmax = jnp.max(diag_for_lam)
            # One fused DW reduction tree for both quadratic forms: row 0
            # sums g.s, row 1 sums s.s (4 separate dot trees cost ~4x the
            # kernel launches for the same arithmetic).
            s_cat = jnp.concatenate([dx_flat, dp])
            lhs = jnp.stack([jnp.concatenate([gx_flat, sys.gp]), s_cat])
            sums = doubleword.pairwise_sum(
                doubleword.DW(*doubleword.two_prod(lhs, s_cat[None, :])),
                axis=1,
            )
            gdot = doubleword.to_single(doubleword.DW(sums.hi[0], sums.lo[0]))
            snorm2 = doubleword.to_single(doubleword.DW(sums.hi[1], sums.lo[1]))
            pred = 0.5 * ((st.lam * dmax) * snorm2 - gdot)
            rho = actual / jnp.maximum(pred, jnp.finfo(actual.dtype).tiny)
            accept = (
                jnp.isfinite(ct.hi)
                & doubleword.less(ct, c_cur)
                & (pred > 0.0)
                & (rho > 1e-4)
            )

            z_new = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), z_try, st.z
            )
            cost_new = jnp.where(accept, ct.hi, st.cost)
            cost_lo_new = jnp.where(accept, ct.lo, st.cost_lo)
            # Nielsen's adaptive schedule (Madsen-Nielsen-Tingleff): the
            # lam factor tracks the gain ratio instead of a fixed up/down
            # ladder — a rigid x0.2/x5 ladder was measured oscillating
            # period-2 around the viable lam (reject, accept, reject, ...)
            # and wasting half the iterations.
            two_rho = 2.0 * rho - 1.0
            down = jnp.maximum(
                jnp.asarray(1.0 / 3.0, st.lam.dtype),
                1.0 - two_rho * two_rho * two_rho,
            )
            lam_new = jnp.where(
                accept,
                jnp.maximum(st.lam * down, opt.lam_min),
                jnp.minimum(st.lam * st.nu, opt.lam_max),
            )
            nu_new = jnp.where(
                accept,
                jnp.asarray(2.0, st.nu.dtype),
                jnp.minimum(st.nu * 2.0, 64.0),
            )
            rel_drop = actual / jnp.maximum(st.cost, 1e-300)
            done = (
                (gnorm < opt.gtol)
                | (accept & (opt.ftol > 0.0) & (rel_drop < opt.ftol))
                | ((opt.xtol > 0.0) & accept & (step_norm < opt.xtol))
                # lam railed at lam_max: every damping level up to the cap
                # was rejected — no further progress is possible at the
                # working precision (observed post-convergence: the f32
                # gradient-noise floor keeps gnorm above any tight gtol
                # while the cost sits at its floor).
                | (~accept & (lam_new >= opt.lam_max))
            )
            hist = st.history.at[st.it].set(
                jnp.stack(
                    [
                        st.cost,
                        gnorm,
                        st.lam,
                        step_norm,
                        accept.astype(st.cost.dtype),
                    ]
                )
            )
            if opt.verbose:
                jax.debug.print(
                    "it={it}  cost={c:.6e}  |g|={g:.3e}  lam={l:.3e}  "
                    "step={s:.3e}  accept={a}",
                    it=st.it, c=st.cost, g=gnorm, l=st.lam, s=step_norm,
                    a=accept,
                )
            return _LoopState(
                z=z_new, cost=cost_new, cost_lo=cost_lo_new, lam=lam_new,
                nu=nu_new, it=st.it + 1, done=done, gnorm=gnorm,
                history=hist,
            )

        dtype = z0.V.dtype
        c0 = problem.cost_dw(z0, data)
        st0 = _LoopState(
            z=z0,
            cost=c0.hi,
            cost_lo=c0.lo,
            lam=jnp.maximum(
                jnp.asarray(opt.lam0, dtype), jnp.finfo(dtype).eps
            ),
            nu=jnp.asarray(2.0, dtype),
            it=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
            gnorm=jnp.asarray(jnp.inf, dtype),
            history=jnp.zeros((opt.maxiter, len(HISTORY_COLS)), dtype),
        )
        st = jax.lax.while_loop(
            lambda s: (~s.done) & (s.it < opt.maxiter), body, st0
        )
        stats = SolveStats(
            iterations=st.it,
            converged=st.done,
            cost=st.cost,
            grad_norm=st.gnorm,
            lam=st.lam,
            history=st.history,
        )
        return st.z, stats

    return solve


def gauss_newton(problem, z0, data, options: SolverOptions = SolverOptions()):
    """One-shot convenience wrapper around :func:`make_gn_solver`."""
    return make_gn_solver(problem, options)(z0, data)


def make_irls_solver(
    problem, options: SolverOptions = SolverOptions(), n_rounds: int = 4
):
    """Huber-robust estimation: iteratively reweighted Gauss-Newton.

    The reference's IRLS capability (SURVEY.md §2a "Newton/GN/IRLS driver",
    §3.4 "possibly IRLS reweighting").  Each round solves the weighted
    least-squares problem with :func:`make_gn_solver`, then recomputes
    per-sample Huber weights w = min(1, delta/|r|) from the *base-weighted*
    measurement residuals, damping outliers.  ``options.irls_delta`` is the
    Huber threshold in units of weighted residual (i.e. sigmas when
    ``meas_weight`` is 1/sigma).

    Returns ``solve(z0, data) -> (z, stats, data_weighted)``; the returned
    ``data_weighted`` carries the final per-sample weights.
    """
    if options.irls_delta <= 0:
        raise ValueError("set options.irls_delta > 0 for IRLS")
    delta = options.irls_delta
    inner = make_gn_solver(problem, options)

    @jax.jit
    def reweight(z, data, base_w):
        data_base = data._replace(meas_w=base_w)
        r = problem.measurement_residuals(z, data_base)  # (N, S, ny)
        w = jnp.minimum(1.0, delta / jnp.maximum(jnp.abs(r), 1e-30))
        return data._replace(meas_w=base_w * jnp.sqrt(w))

    def solve(z0, data):
        base_w = jnp.broadcast_to(
            data.meas_w, problem.mmask.shape + (problem.model.ny,)
        )
        z, stats = inner(z0, data)
        for _ in range(n_rounds):
            data = reweight(z, data, base_w)
            z, stats = inner(z, data)
        return z, stats, data

    return solve
