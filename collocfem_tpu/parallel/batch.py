"""Multi-experiment estimation: data parallelism with shared parameters.

BASELINE.json config 5 ("Batched multi-experiment estimation: 1024 vmapped
trajectories, ~10k total elements").  The reference loops over experiments in
one Python process (SURVEY.md §3.5); here the per-experiment Gauss-Newton
systems are assembled and solved *batched* (vmap in-shard) and, when a device
mesh is given, sharded over the "dp" axis.  The experiments share the
parameter vector p, which couples them only through the tiny (nq, nq)
parameter Schur complement — the single cross-device reduction per iteration
is a ``psum`` of that Schur block and its gradient (SURVEY.md §2c DP row).

Structure per iteration (all on device):
  per experiment e:  A_e dx_e + B_e dp = -gx_e   (block-tridiagonal A_e)
  shared:            sum_e B_e^T dx_e + (C_e) dp = -sum_e gp_e
  =>  S = sum_e (C_e - B_e^T A_e^{-1} B_e) + prior,
      r = sum_e (gp_e - B_e^T A_e^{-1} gx_e) + prior,
      dp = -S^{-1} r;   dx_e = -A_e^{-1}(gx_e + B_e dp).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from collocfem_tpu.ops.einsum_hp import einsum_hp
from collocfem_tpu.ops.smallblocks import spd_solve

from collocfem_tpu.ops.assemble import assemble_gn, blocks_to_nodes
from collocfem_tpu.problem import Decision
from collocfem_tpu.solve.blocktri import SOLVERS
from collocfem_tpu.solve.newton import HISTORY_COLS, SolveStats, SolverOptions


class BatchDecision(NamedTuple):
    """V: (n_exp, M, nv) per-experiment state paths; p: (nq,) shared."""

    V: jnp.ndarray
    p: jnp.ndarray


def _psum_maybe(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _local_cost(problem, z: BatchDecision, data_batch):
    """Sum of per-experiment costs over the local batch (no shared prior)."""
    per_exp = jax.vmap(
        lambda V, d: problem.cost(Decision(V=V, p=z.p), d), in_axes=(0, 0)
    )(z.V, data_batch)
    return jnp.sum(per_exp)


def batch_cost(problem, z: BatchDecision, data_batch, p_prior, p_w):
    """Total cost over the experiment batch + global parameter prior.

    Per-experiment ``data_batch.p_w`` must be zero — the shared prior enters
    exactly once, here.
    """
    rp = p_w * (z.p - p_prior)
    return _local_cost(problem, z, data_batch) + 0.5 * jnp.sum(rp * rp)


def shared_gn_step(
    problem,
    z: BatchDecision,
    data_batch,
    lam,
    p_prior,
    p_w,
    *,
    chain_solver=None,
    dp_axis: str | None = None,
):
    """One damped shared-parameter GN step over the local experiment batch.

    Args:
      chain_solver: ``solve(D, E, G) -> X`` for one block-tridiagonal system
        (default: cyclic reduction).  Pass a vmap-compatible SPIKE closure to
        additionally shard each chain over "sp", or a *batched* solver
        (operating on a leading experiment axis, e.g. the fused Pallas
        Thomas kernel in ops.blocktri_pallas) marked with
        ``chain_solver.batched = True``.
      dp_axis: mesh axis name for the parameter psum (None = single shard).
    Returns:
      (dV (n_exp, M, nv), dp (nq,), gnorm).
    """
    chain_solver = chain_solver or SOLVERS["cr"]
    nq = problem.model.nq

    sys_b = jax.vmap(
        lambda V, d: assemble_gn(problem, Decision(V=V, p=z.p), d),
        in_axes=(0, 0),
    )(z.V, data_batch)

    # Dimensionless isotropic damping — lam scales the per-experiment max
    # diagonal, matching solve.kkt._equilibrate's scale-free convention.
    bd = sys_b.D.shape[-1]
    eye_b = jnp.eye(bd, dtype=sys_b.D.dtype)
    dg = einsum_hp("ekii->eki", sys_b.D)
    dmax = jnp.maximum(jnp.max(dg, axis=(1, 2)),
                       jnp.finfo(sys_b.D.dtype).tiny)      # (n_exp,)
    d_damped = sys_b.D + (lam * dmax)[:, None, None, None] * eye_b

    rhs = jnp.concatenate([sys_b.gx[..., None], sys_b.B], axis=-1)
    if getattr(chain_solver, "batched", False):
        x = chain_solver(d_damped, sys_b.E, rhs)         # fused over batch
    else:
        x = jax.vmap(chain_solver)(d_damped, sys_b.E, rhs)
    # x: (n_exp, K, bd, 1+nq)
    a_g, a_b = x[..., 0], x[..., 1:]

    s_loc = jnp.sum(sys_b.C, 0) - einsum_hp("ekbq,ekbr->qr", sys_b.B, a_b)
    r_loc = jnp.sum(sys_b.gp, 0) - einsum_hp("ekbq,ekb->q", sys_b.B, a_g)
    gnorm_loc = jnp.maximum(
        jnp.max(jnp.abs(sys_b.gx)), jnp.max(jnp.abs(sys_b.gp), initial=0.0)
    )

    s_tot = _psum_maybe(s_loc, dp_axis)
    r_tot = _psum_maybe(r_loc, dp_axis)
    gnorm = (
        jax.lax.pmax(gnorm_loc, dp_axis) if dp_axis is not None else gnorm_loc
    )

    pw2 = p_w**2
    s_tot = s_tot + jnp.diag(pw2)
    smax = jnp.maximum(jnp.max(jnp.diag(s_tot)),
                       jnp.finfo(s_tot.dtype).tiny)
    s_tot = s_tot + (lam * smax) * jnp.eye(nq, dtype=s_tot.dtype)
    r_tot = r_tot + pw2 * (z.p - p_prior)
    # Unrolled SPD solve: XLA:TPU's LU expander is f32-only (no f64).
    dp = -spd_solve(s_tot, r_tot[:, None])[:, 0]
    dx = -(a_g + einsum_hp("ekbq,q->ekb", a_b, dp))
    dV = jax.vmap(lambda d: blocks_to_nodes(d, problem.num_nodes, problem.nv))(dx)
    return dV, dp, gnorm


def make_multi_experiment_solver(
    problem, options: SolverOptions = SolverOptions(), *, dp_axis=None,
    chain_solver=None,
):
    """Jitted shared-parameter LM solver over a batch of experiments.

    Returns ``solve(z0: BatchDecision, data_batch, p_prior, p_w) ->
    (BatchDecision, SolveStats)``.  ``data_batch`` is a ProblemData pytree
    with a leading experiment axis on every leaf and ``p_w == 0`` (the shared
    prior is passed explicitly).  With ``dp_axis`` set, call inside
    shard_map with experiments sharded over that axis.
    """
    opt = options

    def total_cost(z, data_batch, p_prior, p_w):
        c_loc = _local_cost(problem, z, data_batch)
        c_loc = _psum_maybe(c_loc, dp_axis)
        rp = p_w * (z.p - p_prior)
        return c_loc + 0.5 * jnp.sum(rp * rp)

    def solve(z0: BatchDecision, data_batch, p_prior, p_w):
        def body(st):
            z, cost, lam, it, done, gnorm0, hist = st
            dV, dp, gnorm = shared_gn_step(
                problem, z, data_batch, lam, p_prior, p_w,
                chain_solver=chain_solver, dp_axis=dp_axis,
            )
            z_try = BatchDecision(V=z.V + dV, p=z.p + dp)
            c_try = total_cost(z_try, data_batch, p_prior, p_w)
            step_norm = jnp.sqrt(
                _psum_maybe(jnp.sum(dV * dV), dp_axis) + jnp.sum(dp * dp)
            )
            accept = jnp.isfinite(c_try) & (c_try < cost)
            z_new = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), z_try, z
            )
            cost_new = jnp.where(accept, c_try, cost)
            lam_new = jnp.where(
                accept,
                jnp.maximum(lam * opt.lam_down, opt.lam_min),
                jnp.minimum(lam * opt.lam_up, opt.lam_max),
            )
            # Same termination portfolio as solve.newton: gradient norm,
            # relative cost drop, or accepted-step size.
            rel_drop = (cost - c_try) / jnp.maximum(cost, 1e-300)
            new_done = (
                (gnorm < opt.gtol)
                | (accept & (opt.ftol > 0.0) & (rel_drop < opt.ftol))
                | ((opt.xtol > 0.0) & accept & (step_norm < opt.xtol))
            )
            hist = hist.at[it].set(
                jnp.stack([cost, gnorm, lam, step_norm,
                           accept.astype(cost.dtype)])
            )
            return (z_new, cost_new, lam_new, it + 1, new_done, gnorm, hist)

        dtype = z0.V.dtype
        c0 = total_cost(z0, data_batch, p_prior, p_w)
        st0 = (
            z0, c0, jnp.asarray(opt.lam0, dtype), jnp.asarray(0, jnp.int32),
            jnp.asarray(False), jnp.asarray(jnp.inf, dtype),
            jnp.zeros((opt.maxiter, len(HISTORY_COLS)), dtype),
        )
        st = jax.lax.while_loop(
            lambda s: (~s[4]) & (s[3] < opt.maxiter), body, st0
        )
        z, cost, lam, it, done, gnorm, hist = st
        stats = SolveStats(iterations=it, converged=done, cost=cost,
                           grad_norm=gnorm, lam=lam, history=hist)
        return z, stats

    if dp_axis is None:
        return jax.jit(solve)
    return solve
