"""Damped KKT solve: block-tridiagonal core + arrowhead Schur complement.

SURVEY.md §7 hard part 2: parameters touch every element (arrowhead
columns); they are eliminated by a Schur complement — solve the
block-tridiagonal part against [g_x | B] in one multi-RHS pass, then a tiny
dense (nq, nq) solve, then back-substitution.  Replaces the reference's
global sparse factorization of the bordered system (SURVEY.md §2b).
"""

from __future__ import annotations

import jax.numpy as jnp

from collocfem_tpu.ops.assemble import BlockTriSystem, materialize_dense
from collocfem_tpu.solve.blocktri import SOLVERS


def solve_kkt(sys: BlockTriSystem, lam, method: str = "cr"):
    """Solve [[A+lam I, B], [B^T, C+lam I]] [dx, dp] = -[gx, gp].

    Returns (dx (K, bd), dp (nq,)).
    """
    k, bd = sys.num_blocks, sys.block_size
    nq = sys.C.shape[0]
    eye_b = jnp.eye(bd, dtype=sys.D.dtype)

    if method == "dense_full":
        h, g = materialize_dense(sys)
        n = h.shape[0]
        d = -jnp.linalg.solve(h + lam * jnp.eye(n, dtype=h.dtype), g)
        dx = d[: k * bd].reshape(k, bd)
        return dx, d[k * bd :]

    solver = SOLVERS[method]
    d_damped = sys.D + lam * eye_b

    if nq == 0:
        dx = -solver(d_damped, sys.E, sys.gx[..., None])[..., 0]
        return dx, jnp.zeros((0,), sys.D.dtype)

    rhs = jnp.concatenate([sys.gx[..., None], sys.B], axis=-1)  # (K, bd, 1+nq)
    x = solver(d_damped, sys.E, rhs)
    a_g, a_b = x[..., 0], x[..., 1:]                # A^{-1}gx, A^{-1}B
    c_damped = sys.C + lam * jnp.eye(nq, dtype=sys.C.dtype)
    schur = c_damped - jnp.einsum("kbq,kbr->qr", sys.B, a_b)
    rp = sys.gp - jnp.einsum("kbq,kb->q", sys.B, a_g)
    dp = -jnp.linalg.solve(schur, rp)
    dx = -(a_g + jnp.einsum("kbq,q->kb", a_b, dp))
    return dx, dp
