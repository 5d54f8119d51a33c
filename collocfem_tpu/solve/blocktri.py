"""Symmetric positive-definite block-tridiagonal solvers.

TPU-native replacement for the reference's UMFPACK/SuperLU sparse LU
(SURVEY.md §2b row 1; BASELINE.json north_star: "Pallas cyclic-reduction
block-tridiagonal LU instead of a scipy/UMFPACK sparse factorization").

Three interchangeable algorithms, all pivot-free (the Gauss-Newton normal
equations + Levenberg damping make every Schur complement SPD — SURVEY.md §7
hard part 1):

  * ``blocktri_solve_scan``  — block-Cholesky Thomas recursion via
    ``lax.scan`` (O(K) sequential depth; reference implementation, and the
    in-shard local solver for the distributed SPIKE path).
  * ``blocktri_solve_cr``    — cyclic reduction: log2(K) levels, each level a
    *batched* Cholesky/triangular-solve over half the blocks (parallel depth
    O(log K) — the TPU hot path; Pallas kernel variant in
    ``collocfem_tpu.ops.blocktri_pallas``).
  * ``blocktri_solve_dense`` — materialized dense solve (tests, tiny K).

Convention: A[k,k] = D[k] (SPD, (K,b,b)); A[k,k+1] = E[k]; A[k+1,k] = E[k]^T,
with E[K-1] ignored/zero.  Solves A X = G for G (K, b, r).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tri_solve(L, B, trans=False):
    """Batched lower-triangular solve; trans=True solves L^T X = B."""
    if trans:
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), B, lower=False
        )
    return jax.scipy.linalg.solve_triangular(L, B, lower=True)


def _chol_solve(L, B):
    """Batched SPD solve given lower Cholesky factors."""
    return _tri_solve(L, _tri_solve(L, B), trans=True)


def _mm(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b, preferred_element_type=a.dtype)


def _mtm(a, b):
    """a^T @ b batched."""
    return jnp.einsum("...ji,...jk->...ik", a, b, preferred_element_type=a.dtype)


# ---------------------------------------------------------------------------
# Dense reference
# ---------------------------------------------------------------------------
def blocktri_solve_dense(D, E, G):
    """Materialize the block-tridiagonal matrix and solve densely (tests)."""
    k, b, _ = D.shape
    A = jnp.zeros((k * b, k * b), D.dtype)
    for i in range(k):
        sl = slice(i * b, (i + 1) * b)
        A = A.at[sl, sl].set(D[i])
        if i + 1 < k:
            s2 = slice((i + 1) * b, (i + 2) * b)
            A = A.at[sl, s2].set(E[i])
            A = A.at[s2, sl].set(E[i].T)
    x = jnp.linalg.solve(A, G.reshape(k * b, -1))
    return x.reshape(G.shape)


# ---------------------------------------------------------------------------
# Sequential block-Cholesky (Thomas) via lax.scan
# ---------------------------------------------------------------------------
def blocktri_solve_scan(D, E, G):
    """O(K)-depth block LDL^T forward/backward recursion with lax.scan."""
    k = D.shape[0]
    if k == 1:
        return _chol_solve(jnp.linalg.cholesky(D[0]), G[0])[None]

    l0 = jnp.linalg.cholesky(D[0])

    def fwd(carry, inp):
        l_prev, y_prev = carry
        d_i, e_prev, g_i = inp
        w = _chol_solve(l_prev, e_prev)          # U_{i-1}^{-1} E_{i-1}
        u_i = d_i - _mtm(e_prev, w)              # D_i - E^T U^{-1} E
        y_i = g_i - _mtm(w, y_prev)              # g_i - (U^{-1}E)^T y_{i-1}
        l_i = jnp.linalg.cholesky(u_i)
        return (l_i, y_i), (l_i, y_i)

    (_, _), (ls, ys) = jax.lax.scan(fwd, (l0, G[0]), (D[1:], E[:-1], G[1:]))
    ls = jnp.concatenate([l0[None], ls])
    ys = jnp.concatenate([G[0][None], ys])

    x_last = _chol_solve(ls[-1], ys[-1])

    def bwd(x_next, inp):
        l_i, y_i, e_i = inp
        x_i = _chol_solve(l_i, y_i - _mm(e_i, x_next))
        return x_i, x_i

    _, xs = jax.lax.scan(
        bwd, x_last, (ls[:-1], ys[:-1], E[:-1]), reverse=True
    )
    return jnp.concatenate([xs, x_last[None]])


# ---------------------------------------------------------------------------
# Cyclic reduction: O(log K) parallel depth
# ---------------------------------------------------------------------------
def _pad_pow2(D, E, G):
    k, b, _ = D.shape
    kp = 1 << max(0, (k - 1).bit_length())
    if kp == k:
        return D, E, G
    eye = jnp.broadcast_to(jnp.eye(b, dtype=D.dtype), (kp - k, b, b))
    D = jnp.concatenate([D, eye])
    E = jnp.concatenate([E, jnp.zeros((kp - k, b, b), D.dtype)])
    G = jnp.concatenate([G, jnp.zeros((kp - k,) + G.shape[1:], D.dtype)])
    return D, E, G


def blocktri_solve_cr(D, E, G):
    """Pivot-free SPD block cyclic reduction (even-odd elimination).

    Each level eliminates the odd-indexed blocks in one *batched* Cholesky +
    pair of triangular solves, halving the system; back-substitution retraces
    the levels.  log2(K) levels total.  The even-odd permutation of an SPD
    block-tridiagonal matrix stays SPD at every level, so no pivoting is
    needed (SURVEY.md §7 hard part 1).
    """
    squeeze = G.ndim == 2
    if squeeze:
        G = G[..., None]
    k0 = D.shape[0]
    D, E, G = _pad_pow2(D, E, G)
    k = D.shape[0]

    stack = []
    while k > 1:
        d_odd, g_odd = D[1::2], G[1::2]
        e_up, e_lo = E[0::2], E[1::2]           # even->odd, odd->next even
        l_odd = jnp.linalg.cholesky(d_odd)
        s_up = _chol_solve(l_odd, jnp.swapaxes(e_up, -1, -2))  # Dodd^{-1} Eup^T
        s_lo = _chol_solve(l_odd, e_lo)                         # Dodd^{-1} Elo
        s_g = _chol_solve(l_odd, g_odd)                         # Dodd^{-1} g_odd

        d_new = D[0::2] - _mm(e_up, s_up)
        d_new = d_new.at[1:].add(-_mtm(e_lo, s_lo)[:-1])
        g_new = G[0::2] - _mm(e_up, s_g)
        g_new = g_new.at[1:].add(-_mtm(e_lo, s_g)[:-1])
        e_new = -_mm(e_up, s_lo)                # even i -> even i+1

        stack.append((l_odd, e_up, e_lo, g_odd))
        D, E, G = d_new, e_new, g_new
        k //= 2

    x = _chol_solve(jnp.linalg.cholesky(D[0]), G[0])[None]

    for l_odd, e_up, e_lo, g_odd in reversed(stack):
        x_right = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])])
        rhs = g_odd - _mtm(e_up, x) - _mm(e_lo, x_right)
        x_odd = _chol_solve(l_odd, rhs)
        x = jnp.stack([x, x_odd], axis=1).reshape(
            (2 * x.shape[0],) + x.shape[1:]
        )

    x = x[:k0]
    return x[..., 0] if squeeze else x


SOLVERS = {
    "cr": blocktri_solve_cr,
    "scan": blocktri_solve_scan,
    "dense": blocktri_solve_dense,
}
