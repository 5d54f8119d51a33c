"""Single-kernel SPIKE solve of an SPD block-tridiagonal chain.

The per-level cyclic-reduction pipeline (ops.cr_pallas + solve.blocktri)
launches ~2 log2(K) Mosaic programs plus XLA glue per solve; measured on the
v5e at the N=10k KKT shape the factor+apply wall is launch-dominated
(~4 ms/iteration while the arithmetic is bandwidth-trivial).  This module
does the ENTIRE solve — tile-parallel block-Thomas elimination, the reduced
interface system, and back-substitution — in ONE ``pallas_call``, with all
state resident in VMEM.

Algorithm (the in-kernel analogue of ``parallel.spike``, which does the same
substructuring across devices; SURVEY.md §2c/§5 — same math, different
hierarchy level):

  1. Partition the K-block chain into T contiguous tiles of L blocks, tiles
     riding the 128-wide vector lanes.  Every tile eliminates its L-2
     interior blocks with a pivot-free block-Cholesky Thomas recursion — all
     tiles advance in LOCKSTEP, so each of the L-2 sequential steps is a
     handful of full-width VPU ops (RHS/solution column groups ride the
     sublanes).
  2. The tile boundary blocks form a 2T-block SPD interface chain
     (SPIKE/Schur: exactly parallel.spike's s_ll/s_lr/s_rr/gh blocks).  It
     is solved in-kernel by LANE-OBLIVIOUS cyclic reduction: every lane
     redundantly computes each level's elimination, neighbors are fetched
     with ``pltpu.roll`` and masked merges — log2(T) levels of straight-line
     full-width vector code, no cross-level kernel boundaries.
  3. Interiors are recovered by one more lockstep Thomas back-substitution
     against the combined right-hand side g - U x_left - V x_right
     (linearity folds the three spike solves of parallel.spike into one).

No pivoting anywhere: every Schur complement of an SPD matrix is SPD
(SURVEY.md §7 hard part 1); diagonal clamping matches ops.cr_pallas.

CPU fallback: interpret mode (tests); f64 works (dtype-generic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from collocfem_tpu.ops.cr_pallas import _chol_rows, _interpret_default

DEFAULT_TILES = 128

# The fused program keeps the WHOLE chain resident in VMEM (inputs +
# solution + per-tile factor/spike scratch ~ K*(4b^2 + 3br) floats); past
# that footprint the Mosaic compile fails with a scoped-vmem OOM.  The
# budget is calibrated at the measured-good point (v5e: K=16384 at b=8,
# r=3 compiles and runs; K=100001 at the same shape needs 61.5 MB against
# the 16 MB scoped limit), expressed in model bytes so the gate scales
# with BLOCK SIZE and RHS COUNT, not just chain length — a b=16 problem
# has 4x the per-block footprint and caps near K=4500, which a pure
# K-threshold would wrongly admit.  'auto' method resolution falls back
# to the per-level CR pipeline above the budget.
SPIKE_VMEM_BUDGET = 16384 * (4 * 8 * 8 + 3 * 8 * 3) * 4  # model bytes
# Back-compat alias: the max chain length at the headline shape (b=8, r=3).
SPIKE_MAX_CHAIN = 16384


def spike_fits_vmem(num_blocks: int, block_size: int = 8,
                    nrhs: int = 3, itemsize: int = 4) -> bool:
    """True when the fused single-kernel SPIKE solve can compile for a
    chain of ``num_blocks`` blocks of ``block_size`` with ``nrhs``
    right-hand sides (estimation: 1 + nq).  Footprint model:
    K*(4b^2 + 3br)*itemsize vs the calibrated SPIKE_VMEM_BUDGET."""
    b, r = block_size, nrhs
    est = num_blocks * (4 * b * b + 3 * b * r) * itemsize
    return est <= SPIKE_VMEM_BUDGET


# ---------------------------------------------------------------------------
# Grouped-row block algebra.
#
# A block matrix is a list-of-lists of (1, T) "scalar rows" (entry (i, j) is
# one lane vector).  A multi-column quantity (RHS group, solution, spike
# matrix) is a list over the block-row index i of a (c, T) array whose
# sublanes are the c columns — one VPU op covers all columns at once.
# ---------------------------------------------------------------------------
def _scal(rows2d, b, c):
    """(b*c, T) -> scalar rows [i][j] = (1, T)."""
    return [[rows2d[i * c + j:i * c + j + 1, :] for j in range(c)]
            for i in range(b)]


def _grp(rows2d, b, c):
    """(b*c, T) -> grouped rows [i] = (c, T)."""
    return [rows2d[i * c:(i + 1) * c, :] for i in range(b)]


def _pack_grp(g):
    return jnp.concatenate(g, axis=0)


def _pack_scal(s):
    return jnp.concatenate([v for row in s for v in row], axis=0)


def _g2s(g, b):
    """Grouped (each (b, T)) -> scalar rows."""
    return [[g[i][j:j + 1, :] for j in range(b)] for i in range(b)]


def _gT(g, b):
    """Grouped square matrix -> grouped transpose: row i of A^T is col i."""
    return [jnp.concatenate([g[k][i:i + 1, :] for k in range(b)], axis=0)
            for i in range(b)]


def _tri_solve_g(L, inv, B, b):
    """Solve (L L^T) X = B; L scalar rows, B grouped; returns grouped."""
    Y = [None] * b
    for i in range(b):
        s = B[i]
        for k in range(i):
            s = s - L[i][k] * Y[k]
        Y[i] = s * inv[i]
    X = [None] * b
    for i in range(b - 1, -1, -1):
        s = Y[i]
        for k in range(i + 1, b):
            s = s - L[k][i] * X[k]
        X[i] = s * inv[i]
    return X


def _mm_g(A, X, b):
    """(A X)[i] = sum_k A[i][k] X[k]; A scalar rows, X grouped."""
    return [sum(A[i][k] * X[k] for k in range(b)) for i in range(b)]


def _mtm_g(A, X, b):
    """(A^T X)[i] = sum_k A[k][i] X[k]."""
    return [sum(A[k][i] * X[k] for k in range(b)) for i in range(b)]


def _chol_g(S_g, b):
    """Cholesky of a grouped symmetric matrix; returns scalar rows + inv."""
    return _chol_rows(_g2s(S_g, b), b)


def _sub_g(A, B, b):
    return [A[i] - B[i] for i in range(b)]


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------
def _spike_kernel(d_ref, e_ref, g_ref, x_ref, l_scr, y_scr,
                  *, b, r, L, T, levels):
    M = L - 2
    c = r + b  # stored forward-reduced columns: [g | u]
    f32_like = d_ref.dtype

    def dyn(ref, j):
        return ref[pl.ds(j, 1)][0]

    # ---- interior forward elimination (lockstep Thomas) -------------------
    # Interior block m lives at local j = m + 1.  S_0 = D[1]; the u-spike
    # RHS enters at m = 0 as E[0]^T; the v-spike RHS is zero until the last
    # block, so its forward reduction is implicit (see pass B).
    S0 = _grp(d_ref[1], b, b)
    L0, inv0 = _chol_g(S0, b)
    y0 = [jnp.concatenate([_grp(g_ref[1], b, r)[i],
                           _gT(_grp(e_ref[0], b, b), b)[i]], axis=0)
          for i in range(b)]
    zero_row = jnp.zeros_like(y0[0][:1])
    l0_full = [[L0[i][j] if j <= i else zero_row for j in range(b)]
               for i in range(b)]
    l_scr[0] = _pack_scal(l0_full)
    y_scr[0] = _pack_grp(y0)

    def fwd_body(m, carry):
        l_pack, y_pack = carry
        Lp = _scal(l_pack, b, b)
        invp = [1.0 / Lp[i][i] for i in range(b)]
        e_prev = _grp(dyn(e_ref, m), b, b)          # couples interior m-1 -> m
        w = _tri_solve_g(Lp, invp, e_prev, b)       # grouped, row k cols j
        d_m = _grp(dyn(d_ref, m + 1), b, b)
        # S[i] = d[i] - sum_k e_prev[k][i] * w[k]  (e^T w; scalars from grp)
        S = [d_m[i] - sum(e_prev[k][i:i + 1, :] * w[k] for k in range(b))
             for i in range(b)]
        g_m = _grp(dyn(g_ref, m + 1), b, r)
        rhs = [jnp.concatenate(
            [g_m[i], jnp.zeros((b,) + g_m[i].shape[1:], g_m[i].dtype)],
            axis=0) for i in range(b)]
        y_prev = _grp(y_pack, b, c)
        y = [rhs[i] - sum(w[k][i:i + 1, :] * y_prev[k] for k in range(b))
             for i in range(b)]
        Lm, _ = _chol_g(S, b)
        lm_full = [[Lm[i][j] if j <= i else zero_row for j in range(b)]
                   for i in range(b)]
        l_pack = _pack_scal(lm_full)
        y_pack = _pack_grp(y)
        l_scr[pl.ds(m, 1)] = l_pack[None]
        y_scr[pl.ds(m, 1)] = y_pack[None]
        return l_pack, y_pack

    jax.lax.fori_loop(1, M, fwd_body,
                      (_pack_scal(l0_full), _pack_grp(y0)))

    # ---- pass A: backward sweep for the spike endpoint values -------------
    # Full (g, u, v) back-substitution carried (not stored); only the m=0
    # values (w_g[0], w_u[0], w_v[0]) and m=M-1 values feed the reduced
    # interface system.
    cv = c + b
    Llast = _scal(l_scr[M - 1], b, b)
    inv_last = [1.0 / Llast[i][i] for i in range(b)]
    ylast = _grp(y_scr[M - 1], b, c)
    ev_last = _grp(e_ref[L - 2], b, b)              # v-spike RHS at m = M-1
    rhs_last = [jnp.concatenate([ylast[i], ev_last[i]], axis=0)
                for i in range(b)]
    x_last = _tri_solve_g(Llast, inv_last, rhs_last, b)
    wg_last = [x_last[i][:r] for i in range(b)]
    wv_last = [x_last[i][c:] for i in range(b)]

    def bwdA_body(i2, x_pack):
        m = M - 2 - i2
        x_next = _grp(x_pack, b, cv)
        Lm = _scal(dyn(l_scr, m), b, b)
        invm = [1.0 / Lm[i][i] for i in range(b)]
        y_m = _grp(dyn(y_scr, m), b, c)
        e_m = _grp(dyn(e_ref, m + 1), b, b)         # couples m -> m+1
        rhs = [jnp.concatenate(
            [y_m[i], jnp.zeros((b,) + y_m[i].shape[1:], y_m[i].dtype)],
            axis=0) - sum(e_m[i][k:k + 1, :] * x_next[k] for k in range(b))
            for i in range(b)]
        x_m = _tri_solve_g(Lm, invm, rhs, b)
        return _pack_grp(x_m)

    x0_pack = jax.lax.fori_loop(0, M - 1, bwdA_body, _pack_grp(x_last))
    x0 = _grp(x0_pack, b, cv)
    wg0 = [x0[i][:r] for i in range(b)]
    wu0 = [x0[i][r:c] for i in range(b)]
    wv0 = [x0[i][c:] for i in range(b)]

    # ---- reduced interface blocks (parallel.spike s_ll/s_lr/s_rr/gh) ------
    D0 = _grp(d_ref[0], b, b)
    DL = _grp(d_ref[L - 1], b, b)
    E0 = _grp(e_ref[0], b, b)
    ELm2 = _grp(e_ref[L - 2], b, b)
    Ecp = _grp(e_ref[L - 1], b, b)                  # tile -> tile coupling
    G0 = _grp(g_ref[0], b, r)
    GL = _grp(g_ref[L - 1], b, r)

    def e_mm(Eg, X):
        return [sum(Eg[i][k:k + 1, :] * X[k] for k in range(b))
                for i in range(b)]

    def e_mtm(Eg, X):
        return [sum(Eg[k][i:i + 1, :] * X[k] for k in range(b))
                for i in range(b)]

    s_ll = _sub_g(D0, e_mm(E0, wu0), b)
    s_lr = [-v for v in e_mm(E0, wv0)]
    s_rr = _sub_g(DL, e_mtm(ELm2, wv_last), b)
    gh_l = _sub_g(G0, e_mm(E0, wg0), b)
    gh_r = _sub_g(GL, e_mtm(ELm2, wg_last), b)

    # ---- interface R0: eliminate every tile's right-boundary block --------
    l1, inv1 = _chol_g(s_rr, b)
    wl1 = _tri_solve_g(l1, inv1, _gT(s_lr, b), b)   # S^-1 s_lr^T
    wr1 = _tri_solve_g(l1, inv1, Ecp, b)            # S^-1 Ecp
    wg1 = _tri_solve_g(l1, inv1, gh_r, b)           # S^-1 gh_r

    def roll(x, k):
        return pltpu.roll(x, k % T, 1)

    Dh = [s_ll[i] - sum(s_lr[i][k:k + 1, :] * wl1[k] for k in range(b))
          - roll(sum(Ecp[k][i:i + 1, :] * wr1[k] for k in range(b)), 1)
          for i in range(b)]
    Eh = [-sum(s_lr[i][k:k + 1, :] * wr1[k] for k in range(b))
          for i in range(b)]
    Gh = [gh_l[i] - sum(s_lr[i][k:k + 1, :] * wg1[k] for k in range(b))
          - roll(sum(Ecp[k][i:i + 1, :] * wg1[k] for k in range(b)), 1)
          for i in range(b)]

    # ---- lane-oblivious CR on the T-chain of left-boundary blocks ---------
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    sub_b = jax.lax.broadcasted_iota(jnp.int32, (b, T), 0)
    eye_rows = [(sub_b == i).astype(f32_like) for i in range(b)]
    saved = []
    for lvl in range(levels):
        s = 1 << lvl
        src = (lane % (2 * s)) == s                 # eliminated this level
        keep = (lane % (2 * s)) == 0                # active afterwards
        lC, invC = _chol_g(Dh, b)
        Eprev = [roll(Eh[i], s) for i in range(b)]  # coupling (t-s) -> t
        wl = _tri_solve_g(lC, invC, _gT(Eprev, b), b)
        wr = _tri_solve_g(lC, invC, Eh, b)
        wg = _tri_solve_g(lC, invC, Gh, b)
        saved.append((wl, wr, wg))

        def mroll(x, k):
            return roll(jnp.where(src, x, jnp.zeros_like(x)), k)

        Dh = [jnp.where(
            keep,
            Dh[i]
            - mroll(sum(Eprev[i][k:k + 1, :] * wl[k] for k in range(b)), -s)
            - mroll(sum(Eh[k][i:i + 1, :] * wr[k] for k in range(b)), s),
            eye_rows[i]) for i in range(b)]
        Gh = [jnp.where(
            keep,
            Gh[i]
            - mroll(sum(Eprev[i][k:k + 1, :] * wg[k] for k in range(b)), -s)[:r]
            - mroll(sum(Eh[k][i:i + 1, :] * wg[k] for k in range(b)), s)[:r],
            jnp.zeros_like(Gh[i])) for i in range(b)]
        Eh = [jnp.where(
            keep,
            mroll(-sum(Eprev[i][k:k + 1, :] * wr[k] for k in range(b)), -s),
            jnp.zeros_like(Eh[i])) for i in range(b)]

    lroot, invroot = _chol_g(Dh, b)
    xroot = _tri_solve_g(lroot, invroot, Gh, b)
    X = [jnp.where(lane == 0, xroot[i], jnp.zeros_like(xroot[i]))
         for i in range(b)]
    for lvl in range(levels - 1, -1, -1):
        s = 1 << lvl
        src = (lane % (2 * s)) == s
        wl, wr, wg = saved[lvl]
        xl_n = [roll(X[k], s) for k in range(b)]    # x(t-s)
        xr_n = [roll(X[k], -s) for k in range(b)]   # x(t+s)
        X = [jnp.where(
            src,
            wg[i] - sum(wl[i][k:k + 1, :] * xl_n[k] for k in range(b))
            - sum(wr[i][k:k + 1, :] * xr_n[k] for k in range(b)),
            X[i]) for i in range(b)]
    x_l = X
    x_r = [wg1[i] - sum(wl1[i][k:k + 1, :] * x_l[k] for k in range(b))
           - sum(wr1[i][k:k + 1, :] * roll(x_l[k], -1) for k in range(b))
           for i in range(b)]

    x_ref[0] = _pack_grp(x_l)
    x_ref[L - 1] = _pack_grp(x_r)

    # ---- pass B: combined interior back-substitution ----------------------
    # Linearity: x_int = A_II^{-1}(g - U x_l - V x_r) and the Thomas forward
    # reduction is linear, so the combined reduced RHS is
    # y_comb = y_g - y_u x_l (- E[L-2] x_r at the last block only).
    def ycomb(y_m, i, extra=None):
        v = y_m[i][:r] - sum(y_m[i][r + k:r + k + 1, :] * x_l[k]
                             for k in range(b))
        if extra is not None:
            v = v - extra[i]
        return v

    ev_xr = e_mm(ELm2, x_r)
    rhsM = [ycomb(ylast, i, ev_xr) for i in range(b)]
    xM = _tri_solve_g(Llast, inv_last, rhsM, b)
    x_ref[L - 2] = _pack_grp(xM)

    def bwdB_body(i2, x_pack):
        m = M - 2 - i2
        x_next = _grp(x_pack, b, r)
        Lm = _scal(dyn(l_scr, m), b, b)
        invm = [1.0 / Lm[i][i] for i in range(b)]
        y_m = _grp(dyn(y_scr, m), b, c)
        e_m = _grp(dyn(e_ref, m + 1), b, b)
        rhs = [ycomb(y_m, i)
               - sum(e_m[i][k:k + 1, :] * x_next[k] for k in range(b))
               for i in range(b)]
        x_m = _tri_solve_g(Lm, invm, rhs, b)
        pk = _pack_grp(x_m)
        x_ref[pl.ds(m + 1, 1)] = pk[None]
        return pk

    jax.lax.fori_loop(0, M - 1, bwdB_body, _pack_grp(xM))


# ---------------------------------------------------------------------------
# Fused damped-KKT kernel: equilibration + SPIKE + arrowhead Schur in ONE
# Mosaic program (round-5).
#
# The XLA pipeline around the chain kernel — scale D/E/G, concat the RHS
# group, form the (nq, nq) Schur complement with lane-reduction einsums,
# solve it, compose dx, unscale — cost ~1.5 ms of small-op glue per LM
# iteration at the N=10k headline shape, ~4x the solve kernel itself.
# Here the kernel takes the RAW system plus the per-row scale vector
# inv = rsqrt(diag(D) + lam_abs) and applies the symmetric Jacobi scaling
# AT LOAD TIME (the scaled diagonal is exactly 1 by construction, so
# lam_abs itself never enters), runs the multi-RHS SPIKE solve for
# [gx | B], reduces the Schur system over lanes in-kernel, solves it with
# an unrolled scalar Cholesky, and writes back the UNSCALED dx and the
# scaled Schur solution t (dp = -t * inv_sp outside).
# ---------------------------------------------------------------------------
def _chol_scalar(S, rhs, nq):
    """Unrolled scalar Cholesky solve of the tiny (nq, nq) SPD system."""
    L = [[None] * nq for _ in range(nq)]
    for i in range(nq):
        s = S[i][i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, jnp.finfo(s.dtype).tiny))
        for j in range(i + 1, nq):
            s = S[j][i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s / L[i][i]
    y = [None] * nq
    for i in range(nq):
        s = rhs[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    t = [None] * nq
    for i in range(nq - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, nq):
            s = s - L[k][i] * t[k]
        t[i] = s / L[i][i]
    return t


def _kkt_spike_kernel(d_ref, e_ref, g_ref, i_ref, cg_ref, x_ref, dp_ref,
                      l_scr, y_scr, xs_scr, *, b, r, L, T, levels):
    nq = r - 1
    M = L - 2
    c = r + b
    f32_like = d_ref.dtype
    sub_b = jax.lax.broadcasted_iota(jnp.int32, (b, T), 0)

    def dyn(ref, j):
        return ref[pl.ds(j, 1)][0]

    def inv_at(j):
        return dyn(i_ref, j)                      # (b, T)

    def load_d(j, invj):
        """Scaled+damped grouped D at local j; diagonal exactly 1."""
        raw = _grp(dyn(d_ref, j), b, b)
        out = []
        for i in range(b):
            row = raw[i] * invj * invj[i:i + 1, :]
            out.append(jnp.where(sub_b == i, jnp.ones_like(row), row))
        return out

    def load_e(j, invj, invj1):
        """Scaled grouped E at local j (couples j -> j+1)."""
        raw = _grp(dyn(e_ref, j), b, b)
        return [raw[i] * invj1 * invj[i:i + 1, :] for i in range(b)]

    def load_g(j, invj):
        """Scaled grouped RHS group [gx | B·inv_sp] at local j."""
        raw = _grp(dyn(g_ref, j), b, r)
        return [raw[i] * invj[i:i + 1, :] for i in range(b)]

    inv0 = i_ref[0]
    inv1 = i_ref[1]
    invL1 = i_ref[L - 1]
    invL2 = i_ref[L - 2]

    # ---- interior forward elimination (lockstep Thomas) -------------------
    S0 = load_d(1, inv1)
    L0, inv_c0 = _chol_g(S0, b)
    e0T = _gT(load_e(0, inv0, inv1), b)
    g1 = load_g(1, inv1)
    y0 = [jnp.concatenate([g1[i], e0T[i]], axis=0) for i in range(b)]
    zero_row = jnp.zeros_like(y0[0][:1])
    l0_full = [[L0[i][j] if j <= i else zero_row for j in range(b)]
               for i in range(b)]
    l_scr[0] = _pack_scal(l0_full)
    y_scr[0] = _pack_grp(y0)

    def fwd_body(m, carry):
        l_pack, y_pack = carry
        Lp = _scal(l_pack, b, b)
        invp = [1.0 / Lp[i][i] for i in range(b)]
        e_prev = load_e(m, inv_at(m), inv_at(m + 1))
        w = _tri_solve_g(Lp, invp, e_prev, b)
        d_m = load_d(m + 1, inv_at(m + 1))
        S = [d_m[i] - sum(e_prev[k][i:i + 1, :] * w[k] for k in range(b))
             for i in range(b)]
        g_m = load_g(m + 1, inv_at(m + 1))
        rhs = [jnp.concatenate(
            [g_m[i], jnp.zeros((b,) + g_m[i].shape[1:], g_m[i].dtype)],
            axis=0) for i in range(b)]
        y_prev = _grp(y_pack, b, c)
        y = [rhs[i] - sum(w[k][i:i + 1, :] * y_prev[k] for k in range(b))
             for i in range(b)]
        Lm, _ = _chol_g(S, b)
        lm_full = [[Lm[i][j] if j <= i else zero_row for j in range(b)]
                   for i in range(b)]
        l_pack = _pack_scal(lm_full)
        y_pack = _pack_grp(y)
        l_scr[pl.ds(m, 1)] = l_pack[None]
        y_scr[pl.ds(m, 1)] = y_pack[None]
        return l_pack, y_pack

    jax.lax.fori_loop(1, M, fwd_body,
                      (_pack_scal(l0_full), _pack_grp(y0)))

    # ---- pass A: backward sweep for the spike endpoint values -------------
    cv = c + b
    Llast = _scal(l_scr[M - 1], b, b)
    inv_last = [1.0 / Llast[i][i] for i in range(b)]
    ylast = _grp(y_scr[M - 1], b, c)
    ev_last = load_e(L - 2, invL2, invL1)
    rhs_last = [jnp.concatenate([ylast[i], ev_last[i]], axis=0)
                for i in range(b)]
    x_last = _tri_solve_g(Llast, inv_last, rhs_last, b)
    wg_last = [x_last[i][:r] for i in range(b)]
    wv_last = [x_last[i][c:] for i in range(b)]

    def bwdA_body(i2, x_pack):
        m = M - 2 - i2
        x_next = _grp(x_pack, b, cv)
        Lm = _scal(dyn(l_scr, m), b, b)
        invm = [1.0 / Lm[i][i] for i in range(b)]
        y_m = _grp(dyn(y_scr, m), b, c)
        e_m = load_e(m + 1, inv_at(m + 1), inv_at(m + 2))
        rhs = [jnp.concatenate(
            [y_m[i], jnp.zeros((b,) + y_m[i].shape[1:], y_m[i].dtype)],
            axis=0) - sum(e_m[i][k:k + 1, :] * x_next[k] for k in range(b))
            for i in range(b)]
        x_m = _tri_solve_g(Lm, invm, rhs, b)
        return _pack_grp(x_m)

    x0_pack = jax.lax.fori_loop(0, M - 1, bwdA_body, _pack_grp(x_last))
    x0 = _grp(x0_pack, b, cv)
    wg0 = [x0[i][:r] for i in range(b)]
    wu0 = [x0[i][r:c] for i in range(b)]
    wv0 = [x0[i][c:] for i in range(b)]

    # ---- reduced interface blocks -----------------------------------------
    D0 = load_d(0, inv0)
    DL = load_d(L - 1, invL1)
    E0 = load_e(0, inv0, inv1)
    ELm2 = load_e(L - 2, invL2, invL1)
    Ecp = load_e(L - 1, invL1,
                 pltpu.roll(inv0, T - 1, 1))        # next tile's block 0
    G0 = load_g(0, inv0)
    GL = load_g(L - 1, invL1)

    def e_mm(Eg, X):
        return [sum(Eg[i][k:k + 1, :] * X[k] for k in range(b))
                for i in range(b)]

    def e_mtm(Eg, X):
        return [sum(Eg[k][i:i + 1, :] * X[k] for k in range(b))
                for i in range(b)]

    s_ll = _sub_g(D0, e_mm(E0, wu0), b)
    s_lr = [-v for v in e_mm(E0, wv0)]
    s_rr = _sub_g(DL, e_mtm(ELm2, wv_last), b)
    gh_l = _sub_g(G0, e_mm(E0, wg0), b)
    gh_r = _sub_g(GL, e_mtm(ELm2, wg_last), b)

    # ---- interface R0 + lane-oblivious CR (identical to _spike_kernel) ----
    l1, inv1c = _chol_g(s_rr, b)
    wl1 = _tri_solve_g(l1, inv1c, _gT(s_lr, b), b)
    wr1 = _tri_solve_g(l1, inv1c, Ecp, b)
    wg1 = _tri_solve_g(l1, inv1c, gh_r, b)

    def roll(x, k):
        return pltpu.roll(x, k % T, 1)

    Dh = [s_ll[i] - sum(s_lr[i][k:k + 1, :] * wl1[k] for k in range(b))
          - roll(sum(Ecp[k][i:i + 1, :] * wr1[k] for k in range(b)), 1)
          for i in range(b)]
    Eh = [-sum(s_lr[i][k:k + 1, :] * wr1[k] for k in range(b))
          for i in range(b)]
    Gh = [gh_l[i] - sum(s_lr[i][k:k + 1, :] * wg1[k] for k in range(b))
          - roll(sum(Ecp[k][i:i + 1, :] * wg1[k] for k in range(b)), 1)
          for i in range(b)]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    eye_rows = [(sub_b == i).astype(f32_like) for i in range(b)]
    saved = []
    for lvl in range(levels):
        s = 1 << lvl
        src = (lane % (2 * s)) == s
        keep = (lane % (2 * s)) == 0
        lC, invC = _chol_g(Dh, b)
        Eprev = [roll(Eh[i], s) for i in range(b)]
        wl = _tri_solve_g(lC, invC, _gT(Eprev, b), b)
        wr = _tri_solve_g(lC, invC, Eh, b)
        wg = _tri_solve_g(lC, invC, Gh, b)
        saved.append((wl, wr, wg))

        def mroll(x, k):
            return roll(jnp.where(src, x, jnp.zeros_like(x)), k)

        Dh = [jnp.where(
            keep,
            Dh[i]
            - mroll(sum(Eprev[i][k:k + 1, :] * wl[k] for k in range(b)), -s)
            - mroll(sum(Eh[k][i:i + 1, :] * wr[k] for k in range(b)), s),
            eye_rows[i]) for i in range(b)]
        Gh = [jnp.where(
            keep,
            Gh[i]
            - mroll(sum(Eprev[i][k:k + 1, :] * wg[k] for k in range(b)), -s)[:r]
            - mroll(sum(Eh[k][i:i + 1, :] * wg[k] for k in range(b)), s)[:r],
            jnp.zeros_like(Gh[i])) for i in range(b)]
        Eh = [jnp.where(
            keep,
            mroll(-sum(Eprev[i][k:k + 1, :] * wr[k] for k in range(b)), -s),
            jnp.zeros_like(Eh[i])) for i in range(b)]

    lroot, invroot = _chol_g(Dh, b)
    xroot = _tri_solve_g(lroot, invroot, Gh, b)
    X = [jnp.where(lane == 0, xroot[i], jnp.zeros_like(xroot[i]))
         for i in range(b)]
    for lvl in range(levels - 1, -1, -1):
        s = 1 << lvl
        src = (lane % (2 * s)) == s
        wl, wr, wg = saved[lvl]
        xl_n = [roll(X[k], s) for k in range(b)]
        xr_n = [roll(X[k], -s) for k in range(b)]
        X = [jnp.where(
            src,
            wg[i] - sum(wl[i][k:k + 1, :] * xl_n[k] for k in range(b))
            - sum(wr[i][k:k + 1, :] * xr_n[k] for k in range(b)),
            X[i]) for i in range(b)]
    x_l = X
    x_r = [wg1[i] - sum(wl1[i][k:k + 1, :] * x_l[k] for k in range(b))
           - sum(wr1[i][k:k + 1, :] * roll(x_l[k], -1) for k in range(b))
           for i in range(b)]

    xs_scr[0] = _pack_grp(x_l)
    xs_scr[L - 1] = _pack_grp(x_r)

    # ---- pass B: combined interior back-substitution into xs_scr ----------
    def ycomb(y_m, i, extra=None):
        v = y_m[i][:r] - sum(y_m[i][r + k:r + k + 1, :] * x_l[k]
                             for k in range(b))
        if extra is not None:
            v = v - extra[i]
        return v

    ev_xr = e_mm(ELm2, x_r)
    rhsM = [ycomb(ylast, i, ev_xr) for i in range(b)]
    xM = _tri_solve_g(Llast, inv_last, rhsM, b)
    xs_scr[L - 2] = _pack_grp(xM)

    def bwdB_body(i2, x_pack):
        m = M - 2 - i2
        x_next = _grp(x_pack, b, r)
        Lm = _scal(dyn(l_scr, m), b, b)
        invm = [1.0 / Lm[i][i] for i in range(b)]
        y_m = _grp(dyn(y_scr, m), b, c)
        e_m = load_e(m + 1, inv_at(m + 1), inv_at(m + 2))
        rhs = [ycomb(y_m, i)
               - sum(e_m[i][k:k + 1, :] * x_next[k] for k in range(b))
               for i in range(b)]
        x_m = _tri_solve_g(Lm, invm, rhs, b)
        pk = _pack_grp(x_m)
        xs_scr[pl.ds(m + 1, 1)] = pk[None]
        return pk

    jax.lax.fori_loop(0, M - 1, bwdB_body, _pack_grp(xM))

    # ---- arrowhead Schur: lane-reduce B_s^T X over the whole chain --------
    # acc rows (q*r + s_) hold per-lane partial sums of B_s[:,q]·X[:,s_];
    # padded blocks contribute exact zeros (their G rows are zero).
    def red_body(l, acc):
        invl = inv_at(l)
        g = load_g(l, invl)
        x = _grp(dyn(xs_scr, l), b, r)
        rows = []
        for q in range(nq):
            for s_ in range(r):
                rows.append(sum(g[i][1 + q:2 + q, :] * x[i][s_:s_ + 1, :]
                                for i in range(b)))
        return acc + jnp.concatenate(rows, axis=0)

    acc = jax.lax.fori_loop(
        0, L, red_body, jnp.zeros((nq * r, T), f32_like))
    tot = [jnp.sum(acc[k]) for k in range(nq * r)]

    # schur = C_s - B_s^T A_s^{-1} B_s ; rp = gp_s - B_s^T A_s^{-1} gx_s
    S = [[cg_ref[q, qq] - tot[q * r + 1 + qq] for qq in range(nq)]
         for q in range(nq)]
    rp = [cg_ref[q, nq] - tot[q * r] for q in range(nq)]
    t = _chol_scalar(S, rp, nq)                   # dp_s = -t
    for q in range(nq):
        dp_ref[q:q + 1, :] = jnp.full((1, T), t[q], f32_like)
    t_vec = [jnp.full((1, T), t[q], f32_like) for q in range(nq)]

    # ---- compose dx = -(a_g + a_b·dp_s) = -a_g + a_b·t, unscaled ----------
    def comp_body(l, _):
        invl = inv_at(l)
        x = _grp(dyn(xs_scr, l), b, r)
        rows = []
        for i in range(b):
            v = -x[i][0:1, :]
            for q in range(nq):
                v = v + x[i][1 + q:2 + q, :] * t_vec[q]
            rows.append(v * invl[i:i + 1, :])
        x_ref[pl.ds(l, 1)] = jnp.concatenate(rows, axis=0)[None]
        return 0

    jax.lax.fori_loop(0, L, comp_body, 0)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------
def _plan(K, tiles):
    """Pick (T, L): T power-of-two lanes, L >= 3 blocks per tile."""
    T = tiles
    while T > 1 and (K + T - 1) // T < 3:
        T //= 2
    L = max(3, -(-K // T))
    return T, L


@functools.partial(jax.jit, static_argnames=("tiles", "interpret"))
def blocktri_solve_spike_fused(Ds, Es, Gs, *, tiles: int = DEFAULT_TILES,
                               interpret=None):
    """Solve the SPD block-tridiagonal system in ONE fused kernel.

    Args/returns use the SoA convention of ``solve.blocktri``'s *_soa
    functions: Ds/Es (b, b, K) with Es[..., K-1] ignored/zero, Gs (b, r, K);
    returns X (b, r, K) with A X = G.
    """
    if interpret is None:
        interpret = _interpret_default()
    b, _, K = Ds.shape
    r = Gs.shape[1]
    T, L = _plan(K, tiles)
    levels = T.bit_length() - 1
    Kp = T * L
    dtype = Ds.dtype

    Dr = jnp.zeros((b * b, Kp), dtype).at[:, :K].set(Ds.reshape(b * b, K))
    if Kp != K:  # identity pad keeps the chain SPD and decoupled
        diag_rows = jnp.arange(b) * b + jnp.arange(b)
        Dr = Dr.at[diag_rows, K:].set(1.0)
    Er = jnp.zeros((b * b, Kp), dtype).at[:, :K].set(Es.reshape(b * b, K))
    Er = Er.at[:, K - 1:].set(0.0)
    Gr = jnp.zeros((b * r, Kp), dtype).at[:, :K].set(Gs.reshape(b * r, K))

    def relay(A):
        rows = A.shape[0]
        return A.reshape(rows, T, L).transpose(2, 0, 1)

    M = L - 2
    out = pl.pallas_call(
        functools.partial(_spike_kernel, b=b, r=r, L=L, T=T, levels=levels),
        out_shape=jax.ShapeDtypeStruct((L, b * r, T), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((M, b * b, T), dtype),
            pltpu.VMEM((M, b * (r + b), T), dtype),
        ],
        interpret=interpret,
    )(relay(Dr), relay(Er), relay(Gr))

    Xr = out.transpose(1, 2, 0).reshape(b * r, Kp)
    return Xr[:, :K].reshape(b, r, K)


@functools.partial(jax.jit, static_argnames=("tiles", "interpret"))
def kkt_solve_spike_fused(D, E, B, gx, C, gp, lam, damp_scale=None, *,
                          tiles: int = DEFAULT_TILES, interpret=None):
    """One-kernel damped-KKT solve (equilibrate + SPIKE + arrowhead Schur).

    Raw SoA inputs: D/E (b, b, K) with E[..., K-1] ignored, B (b, nq, K)
    with nq >= 1, gx (b, K), C (nq, nq), gp (nq,); ``lam`` is the
    dimensionless damping and ``damp_scale`` optionally overrides the
    damping scale (solve.kkt._equilibrate semantics).  Returns
    (dx (b, K), dp (nq,), dmax) for the system
    [[A + lam_abs·I, B], [B^T, C + lam_abs·I]] [dx, dp] = -[gx, gp].

    Replaces the XLA pipeline around :func:`blocktri_solve_spike_fused`
    (scaled-array materialization, RHS concat, Schur einsums, compose,
    unscale — ~1.5 ms of small-op glue per LM iteration at the N=10k
    headline shape, measured round 5) with in-kernel scaled loads and
    lane reductions; only the O(b·K) scale vector and the relays remain
    in XLA.
    """
    if interpret is None:
        interpret = _interpret_default()
    b, _, K = D.shape
    nq = B.shape[1]
    if nq == 0:
        raise ValueError("kkt_solve_spike_fused needs nq >= 1 "
                         "(use blocktri_solve_spike_fused otherwise)")
    r = 1 + nq
    dtype = D.dtype
    tiny = jnp.finfo(dtype).tiny

    # Diag extraction via static slices, NOT einsum("iik->ik"): the einsum
    # form made XLA pick a block-major {0,1,2} layout for D, turning the
    # assembly's diagonal-add update into a ~1 ms/iteration full-array
    # layout-conversion copy (seen directly in the device trace).
    diag = jnp.stack([D[i, i] for i in range(b)])   # (b, K)
    if damp_scale is None:
        dmax = jnp.maximum(jnp.max(diag), jnp.max(jnp.diag(C)))
    else:
        dmax = jnp.asarray(damp_scale, dtype)
    lam_abs = lam * jnp.maximum(dmax, tiny)
    inv = 1.0 / jnp.sqrt(diag + lam_abs)            # (b, K)
    c_d = C + lam_abs * jnp.eye(nq, dtype=dtype)
    inv_sp = 1.0 / jnp.sqrt(jnp.diag(c_d))
    C_s = c_d * inv_sp[:, None] * inv_sp[None, :]
    gp_s = gp * inv_sp
    G = jnp.concatenate(
        [gx[:, None, :], B * inv_sp[None, :, None]], axis=1
    )                                               # (b, r, K) raw x-side

    T, Lt = _plan(K, tiles)
    levels = T.bit_length() - 1
    Kp = T * Lt
    M = Lt - 2

    Dr = jnp.zeros((b * b, Kp), dtype).at[:, :K].set(D.reshape(b * b, K))
    if Kp != K:  # identity pad keeps the chain SPD and decoupled
        diag_rows = jnp.arange(b) * b + jnp.arange(b)
        Dr = Dr.at[diag_rows, K:].set(1.0)
    Er = jnp.zeros((b * b, Kp), dtype).at[:, :K].set(E.reshape(b * b, K))
    Er = Er.at[:, K - 1:].set(0.0)
    Gr = jnp.zeros((b * r, Kp), dtype).at[:, :K].set(G.reshape(b * r, K))
    Ir = jnp.ones((b, Kp), dtype).at[:, :K].set(inv)
    cg = jnp.concatenate([C_s, gp_s[:, None]], axis=1)  # (nq, nq+1)

    def relay(A):
        rows = A.shape[0]
        return A.reshape(rows, T, Lt).transpose(2, 0, 1)

    dx_rel, dps = pl.pallas_call(
        functools.partial(
            _kkt_spike_kernel, b=b, r=r, L=Lt, T=T, levels=levels),
        out_shape=(
            jax.ShapeDtypeStruct((Lt, b, T), dtype),
            jax.ShapeDtypeStruct((nq, T), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((M, b * b, T), dtype),
            pltpu.VMEM((M, b * (r + b), T), dtype),
            pltpu.VMEM((Lt, b * r, T), dtype),
        ],
        interpret=interpret,
    )(relay(Dr), relay(Er), relay(Gr), relay(Ir), cg)

    dx = dx_rel.transpose(1, 2, 0).reshape(b, Kp)[:, :K]
    dp = -dps[:, 0] * inv_sp
    return dx, dp, dmax
