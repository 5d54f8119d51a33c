"""Element-chain (time-mesh) sharded Gauss-Newton: assembly + solve over "sp".

The full sequence-parallel path (SURVEY.md §2c SP/CP row, §5 "long-context"):
the collocation elements are split into contiguous slices, one per device on
the "sp" mesh axis.  Each device

  1. evaluates residuals + jacfwd blocks ONLY for its local elements (the
     embarrassingly parallel part — vmap inside the shard),
  2. scatters them into its local slice of the block chain; an element on
     the right shard edge touches the first block of the next shard, so one
     boundary block per (D, B, gx) is shipped with a single ``ppermute`` —
     a halo exchange, the same communication shape as ring attention /
     context parallelism,
  3. solves the damped, Jacobi-equilibrated system with SPIKE
     substructuring (collocfem_tpu.parallel.spike) — one interface
     all-gather per solve,
  4. psum's the (nq, nq) parameter Schur pieces and the scalars (cost,
     gradient norm, double-word accept quantities) that drive the LM loop.

The accept/damping logic is the SHARED gain-ratio + Nielsen + double-word
loop (solve.lm_core) — the same body as the single-device headline solver,
so the sharded path inherits the f32-resolution and λ-oscillation fixes it
exists for at K ~ 10³–10⁴ scale.  All accept inputs are globally reduced
(psum/pmax/psum_dw), so every device steps the SAME lax.while_loop with no
extra communication.

Sizing rule: K = N+1 blocks must divide by the sp axis size with >= 2
blocks per shard.  The (single) pad block and the one dummy element that
squares the element count live on the last shard and are masked out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from collocfem_tpu.ops import doubleword as dw
from collocfem_tpu.ops.einsum_hp import einsum_hp
from collocfem_tpu.ops.smallblocks import spd_solve
from jax.sharding import PartitionSpec as P

from collocfem_tpu.ops.assemble import scatter_gn_blocks
from collocfem_tpu.parallel.meshes import SP_AXIS
from collocfem_tpu.parallel.spike import blocktri_solve_spike
from collocfem_tpu.problem import Decision, ProblemData
from collocfem_tpu.solve.lm_core import LMAux, lm_loop, psum_dw
from collocfem_tpu.solve.newton import SolverOptions, stats_from_lm


def _halo_from_right(x, axis_name, sp):
    """Fetch the right neighbour's value (last shard receives zeros)."""
    return jax.lax.ppermute(
        x, axis_name, [(i + 1, i) for i in range(sp - 1)]
    )


def _spill_to_right(x, axis_name, sp):
    """Ship a value to the right neighbour (first shard receives zeros)."""
    return jax.lax.ppermute(
        x, axis_name, [(i, i + 1) for i in range(sp - 1)]
    )


def make_sp_gn_solver(
    problem,
    dev_mesh,
    options: SolverOptions = SolverOptions(),
    *,
    axis_name: str = SP_AXIS,
):
    """Single-experiment GN solver with elements sharded over ``axis_name``.

    Returns a jitted ``solve(z0, data) -> (z, SolveStats)`` on GLOBAL
    arrays; sharding is internal (shard_map over ``dev_mesh``).
    """
    opt = options
    sp = dev_mesh.shape[axis_name]
    n, d = problem.mesh.num_elements, problem.mesh.degree
    nv, nq, nx = problem.nv, problem.model.nq, problem.model.nx
    k, bd = n + 1, d * problem.nv
    num_nodes = problem.num_nodes
    if k % sp:
        raise ValueError(f"K={k} blocks not divisible by sp={sp}")
    mb = k // sp  # blocks (= element slots) per shard
    if mb < 2:
        raise ValueError("need >= 2 blocks per sp shard")
    dtype = problem.dtype
    elem_idx = (jnp.arange(mb)[:, None] * d + jnp.arange(d + 1)[None, :])

    def local_solve(V_loc, p0, ed, data):
        """Inside shard_map.  V_loc: (mb*d, nv) local padded node rows;
        ed: ElemData with mb (local) elements; data: replicated priors."""
        sidx = jax.lax.axis_index(axis_name)
        is_first = sidx == 0
        is_last = sidx == sp - 1
        # Dummy-element mask: the very last element slot (on the last shard)
        # pads the count from N to K and must not contribute.
        emask = jnp.where(
            is_last & (jnp.arange(mb) == mb - 1), 0.0, 1.0
        ).astype(dtype)

        def gather_local(V):
            first = V[:1]
            nxt = _halo_from_right(first, axis_name, sp)     # (1, nv)
            v_ext = jnp.concatenate([V, nxt], axis=0)        # (mb*d+1, nv)
            return v_ext, v_ext[elem_idx].reshape(mb, -1)

        def total_cost_dw(V, p):
            """Global double-word cost: local residual partials summed
            exactly across shards (lm_core.psum_dw), priors added once
            (identically on every shard)."""
            _, xe = gather_local(V)
            r = jax.vmap(problem.elem_residual, in_axes=(0, None, 0))(
                xe, p, ed
            ) * emask[:, None]
            rf = r.ravel()
            s = psum_dw(
                dw.pairwise_sum(dw.DW(*dw.two_prod(rf, rf))), axis_name
            )
            rp = data.p_w * (p - data.p_prior)
            # x(t0) lives on shard 0; a masked psum fetches it with
            # INVARIANT type (all_gather would type it varying and poison
            # the LM loop carry — see lm_core.replicate).
            x0 = jax.lax.psum(
                jnp.where(sidx == 0, V[0, :nx], jnp.zeros((nx,), dtype)),
                axis_name,
            )
            dx0 = x0 - data.x0_prior
            rx0 = data.x0_w @ dx0 if data.x0_w.ndim == 2 else data.x0_w * dx0
            extra = jnp.concatenate([rp, rx0])
            s = dw.add(
                s, dw.pairwise_sum(dw.DW(*dw.two_prod(extra, extra)))
            )
            return dw.mul_single(s, 0.5)

        def assemble(V, p):
            v_ext, xe = gather_local(V)

            def per_elem(xe_flat, e):
                r = problem.elem_residual(xe_flat, p, e)
                jx, jp = jax.jacfwd(
                    problem.elem_residual, argnums=(0, 1)
                )(xe_flat, p, e)
                return r, jx, jp

            r, jx, jp = jax.vmap(per_elem)(xe, ed)
            r = r * emask[:, None]
            jx = jx * emask[:, None, None]
            jp = jp * emask[:, None, None]

            hxx = einsum_hp("emi,emj->eij", jx, jx)
            hxp = einsum_hp("emi,emq->eiq", jx, jp)
            hpp = einsum_hp("emq,emr->qr", jp, jp)      # local partial
            gxe = einsum_hp("emi,em->ei", jx, r)
            gpe = einsum_hp("emq,em->q", jp, r)         # local partial

            sys_loc = scatter_gn_blocks(
                hxx, hxp, hpp, gxe, gpe,
                num_blocks=mb + 1, nv=nv, overlap=nv, dtype=dtype,
            )
            # Block mb spills into the right neighbour's block 0 — minus
            # the SPD pad identity scatter_gn_blocks put on its own last
            # block (the neighbour's block 0 entries are real nodes).
            pad_ix = jnp.arange(nv, bd)
            spill_D = sys_loc.D[-1].at[pad_ix, pad_ix].add(-1.0)
            D = sys_loc.D[:-1].at[0].add(
                _spill_to_right(spill_D, axis_name, sp)
            )
            B = sys_loc.B[:-1].at[0].add(
                _spill_to_right(sys_loc.B[-1], axis_name, sp)
            )
            gx = sys_loc.gx[:-1].at[0].add(
                _spill_to_right(sys_loc.gx[-1], axis_name, sp)
            )
            E = sys_loc.E[:-1]  # E[mb-1] couples to the next shard

            # scatter_gn_blocks put the SPD pad identity on the spilled
            # (mb-th) block; re-add it where it belongs: the pad node
            # entries (nv..bd) of the true last block K-1 (last shard).
            pad_flags = jnp.zeros((mb, bd), dtype)
            pad_flags = pad_flags.at[mb - 1, nv:].set(1.0)
            D = D + jnp.where(
                is_last, pad_flags, 0.0
            )[..., None] * jnp.eye(bd, dtype=dtype)

            # x0 prior: first shard, block 0.
            gate = jnp.where(is_first, 1.0, 0.0).astype(dtype)
            dx0 = v_ext[0, :nx] - data.x0_prior
            if data.x0_w.ndim == 2:  # full sqrt-information prior
                lam_x0 = data.x0_w.T @ data.x0_w
                D = D.at[0, :nx, :nx].add(gate * lam_x0)
                gx = gx.at[0, :nx].add(gate * (lam_x0 @ dx0))
            else:
                x0w2 = data.x0_w**2
                ix = jnp.arange(nx)
                D = D.at[0, ix, ix].add(gate * x0w2)
                gx = gx.at[0, :nx].add(gate * x0w2 * dx0)
            return D, E, B, hpp, gx, gpe

        def trial_fn(z, carry, lam):
            V, p = z
            D, E, B, hpp_loc, gx, gpe_loc = assemble(V, p)
            pw2 = data.p_w**2
            C = jax.lax.psum(hpp_loc, axis_name) + jnp.diag(pw2)
            gp = jax.lax.psum(gpe_loc, axis_name) + pw2 * (
                p - data.p_prior
            )
            gnorm = jax.lax.pmax(
                jnp.maximum(
                    jnp.max(jnp.abs(gx)),
                    jnp.max(jnp.abs(gp), initial=0.0),
                ),
                axis_name,
            )

            # Damped + Jacobi-equilibrated SPIKE solve (same scaling as
            # solve.kkt._equilibrate, distributed): dimensionless
            # isotropic damping, lam * global max diagonal (pmax over the
            # element-chain shards), then scale the damped system to unit
            # diagonal.
            eye_b = jnp.eye(bd, dtype=dtype)
            dgd = einsum_hp("kii->ki", D)
            dmax = jax.lax.pmax(jnp.max(dgd), axis_name)
            if nq:
                dmax = jnp.maximum(dmax, jnp.max(jnp.diag(C)))
            lam_abs = lam * jnp.maximum(dmax, jnp.finfo(dtype).tiny)
            dd = D + lam_abs * eye_b
            inv = 1.0 / jnp.sqrt(einsum_hp("kii->ki", dd))
            inv_nxt = _halo_from_right(inv[:1], axis_name, sp)
            Ds = dd * inv[:, :, None] * inv[:, None, :]
            inv_shift = jnp.concatenate([inv[1:], inv_nxt], axis=0)
            Es = E * inv[:, :, None] * inv_shift[:, None, :]
            gxs = gx * inv
            if nq:
                invp = 1.0 / jnp.sqrt(jnp.diag(C) + lam_abs)
                Bs = B * inv[:, :, None] * invp[None, None, :]
                rhs = jnp.concatenate([gxs[..., None], Bs], axis=-1)
            else:
                invp = jnp.zeros((0,), dtype)
                rhs = gxs[..., None]
            x = blocktri_solve_spike(Ds, Es, rhs, axis_name=axis_name)
            a_g, a_b = x[..., 0], x[..., 1:]
            if nq:
                Cs = (C + lam_abs * jnp.eye(nq, dtype=dtype)) * (
                    invp[:, None] * invp[None, :]
                )
                schur = Cs - jax.lax.psum(
                    einsum_hp("kbq,kbr->qr", Bs, a_b), axis_name
                )
                rp = gp * invp - jax.lax.psum(
                    einsum_hp("kbq,kb->q", Bs, a_g), axis_name
                )
                dps = -spd_solve(schur, rp[:, None])[:, 0]
                dx = -(a_g + einsum_hp("kbq,q->kb", a_b, dps)) * inv
                dp = dps * invp
            else:
                dp = jnp.zeros((0,), dtype)
                dx = -a_g * inv
            dV = dx.reshape(mb * d, nv)

            z_try = (V + dV, p + dp)
            ct = total_cost_dw(*z_try)

            # Globally-reduced double-word accept quantities: local DW
            # partials of g·s and s·s, exact cross-shard sum, then the
            # replicated parameter terms added ONCE (identically on every
            # shard).
            gdot_dw = psum_dw(dw.dot(gx.ravel(), dx.ravel()), axis_name)
            snorm2_dw = psum_dw(dw.dot(dx.ravel(), dx.ravel()), axis_name)
            gdot = dw.to_single(gdot_dw) + jnp.vdot(gp, dp)
            snorm2 = dw.to_single(snorm2_dw) + jnp.vdot(dp, dp)
            aux = LMAux(
                gnorm=gnorm, gdot=gdot, sds=dmax * snorm2,
                step_norm=jnp.sqrt(snorm2),
                alpha=jnp.asarray(1.0, dtype),
            )
            return z_try, carry, ct, aux

        st = lm_loop(
            (V_loc, p0), (), total_cost_dw(V_loc, p0), trial_fn,
            maxiter=opt.maxiter, lam0=opt.lam0,
            gtol=opt.gtol, ftol=opt.ftol, xtol=opt.xtol,
            lam_min=opt.lam_min, lam_max=opt.lam_max,
            dtype=dtype, verbose=opt.verbose,
        )
        V_fin, p_fin = st.z
        return V_fin, p_fin, stats_from_lm(st)

    from collocfem_tpu.solve.newton import SolveStats

    ed_spec = jax.tree_util.tree_map(
        lambda _: P(axis_name), _elemdata_proto(problem)
    )
    data_spec = jax.tree_util.tree_map(lambda _: P(), _data_proto(problem))
    sharded = jax.shard_map(
        local_solve,
        mesh=dev_mesh,
        in_specs=(P(axis_name), P(), ed_spec, data_spec),
        out_specs=(P(axis_name), P(), SolveStats(*([P()] * 6))),
        # vma checking ON: lm_core.replicate/psum_dw re-type every
        # cross-shard reduction as invariant, so shard_map's type checker
        # audits the collective plumbing for free (round-3 verdict weak 5).
        check_vma=True,
    )

    sharded_jit = jax.jit(sharded)

    def solve(z0: Decision, data):
        # Padding runs EAGERLY (outside jit) on purpose: under jit, GSPMD
        # propagates the shard_map's P(sp) sharding back onto the uneven
        # (N,) -> (K,) concatenate and mis-shards it (each shard locally
        # padded instead of globally reshuffled), silently zeroing interior
        # element widths.
        V_pad = jnp.zeros((k * d, nv), dtype).at[:num_nodes].set(z0.V)
        ed = problem._elem_data(data)
        ed_pad = jax.tree_util.tree_map(
            lambda leaf: jnp.concatenate(
                [leaf, jnp.zeros((1,) + leaf.shape[1:], leaf.dtype)]
            ),
            ed,
        )
        ed_pad = ed_pad._replace(width=ed_pad.width.at[-1].set(1.0))
        V_out, p_out, stats = sharded_jit(V_pad, z0.p, ed_pad, data)
        return Decision(V=V_out[:num_nodes], p=p_out), stats

    return solve


def _data_proto(problem):
    m = problem.model
    n, s = problem.mmask.shape
    z = lambda *shape: jnp.zeros(shape, problem.dtype)
    return ProblemData(
        y=z(n, s, m.ny), u=z(n, problem.mesh.degree + 1, m.nu),
        meas_w=z(m.ny), p_prior=z(m.nq), p_w=z(m.nq),
        x0_prior=z(m.nx), x0_w=z(m.nx),
    )


def _elemdata_proto(problem):
    return problem._elem_data(_data_proto(problem))
