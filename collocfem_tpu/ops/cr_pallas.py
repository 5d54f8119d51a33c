"""Pallas TPU kernels for cyclic-reduction levels (row-SoA layout).

The XLA lowering of one SoA CR level is hundreds of small elementwise
kernels whose dispatch overhead dominates inside the Newton while_loop.
Here each level is ONE fused Mosaic program per sweep direction
(BASELINE.json north_star: "Pallas cyclic-reduction block-tridiagonal LU").

Mosaic-conservative design: every ref is 2-D ``(b*b, T)`` — block entry
(i, j) is row ``i*b + j``, the chain tile rides the 128-wide lanes — and
every in-kernel value is a ``(1, T)`` row.  No reshapes, stacks, gathers or
scatters inside the kernel; the even/odd pair split and the interleave are
single cheap XLA ops outside.  CPU fallback: interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Chain pairs per program instance (lanes per row).
_TILE = 512


def _read(ref, b, cols):
    """ref (b*cols_b, T) -> list-of-lists of (1, T) rows."""
    return [
        [ref[i * cols + j:i * cols + j + 1, :] for j in range(cols)]
        for i in range(b)
    ]


def _write(ref, rows, cols):
    for i, rrow in enumerate(rows):
        for j, v in enumerate(rrow):
            ref[i * cols + j:i * cols + j + 1, :] = v


def _chol_rows(a, b):
    """Row-wise unrolled Cholesky: a[i][j] are (1, T); returns L, inv_diag."""
    L = [[None] * b for _ in range(b)]
    inv = [None] * b
    for j in range(b):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        # Clamp (see smallblocks.chol): finite junk over NaN poisoning.
        d = jnp.sqrt(jnp.maximum(s, jnp.finfo(s.dtype).tiny))
        L[j][j] = d
        inv[j] = 1.0 / d
        for i in range(j + 1, b):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv[j]
    return L, inv


def _chol_solve_rows(L, inv, B, b, r):
    """Solve L L^T X = B for rows B[i][c] (1, T); returns X rows."""
    Y = [[None] * r for _ in range(b)]
    for i in range(b):
        for c in range(r):
            s = B[i][c]
            for k in range(i):
                s = s - L[i][k] * Y[k][c]
            Y[i][c] = s * inv[i]
    X = [[None] * r for _ in range(b)]
    for i in range(b - 1, -1, -1):
        for c in range(r):
            s = Y[i][c]
            for k in range(i + 1, b):
                s = s - L[k][i] * X[k][c]
            X[i][c] = s * inv[i]
    return X


def _mm_rows(A, B, b, m, r):
    """C[i][c] = sum_j A[i][j] B[j][c]."""
    return [
        [sum(A[i][j] * B[j][c] for j in range(m)) for c in range(r)]
        for i in range(b)
    ]


def _t_rows(A, b, m):
    """Transpose the row structure: A (b x m) -> (m x b)."""
    return [[A[i][j] for i in range(b)] for j in range(m)]


def _fwd_kernel(de_ref, do_ref, eu_ref, el_ref, ge_ref, go_ref,
                dn_ref, en_ref, gn_ref, su_ref, sl_ref, sg_ref,
                cd_ref, cg_ref, *, b: int, r: int):
    d_even = _read(de_ref, b, b)
    d_odd = _read(do_ref, b, b)
    e_up = _read(eu_ref, b, b)
    e_lo = _read(el_ref, b, b)
    g_even = _read(ge_ref, b, r)
    g_odd = _read(go_ref, b, r)

    L, inv = _chol_rows(d_odd, b)
    s_up = _chol_solve_rows(L, inv, _t_rows(e_up, b, b), b, b)
    s_lo = _chol_solve_rows(L, inv, e_lo, b, b)
    s_g = _chol_solve_rows(L, inv, g_odd, b, r)

    eu_sup = _mm_rows(e_up, s_up, b, b, b)
    eu_sg = _mm_rows(e_up, s_g, b, b, r)
    # Cross terms destined for slot j+1 are emitted whole; the shift and
    # subtraction happen in one cheap XLA op outside the kernel (Mosaic
    # supports neither scatter-add nor dynamic single-lane stores).
    cross_d = _mm_rows(_t_rows(e_lo, b, b), s_lo, b, b, b)
    cross_g = _mm_rows(_t_rows(e_lo, b, b), s_g, b, b, r)

    d_new = [
        [d_even[i][j] - eu_sup[i][j] for j in range(b)]
        for i in range(b)
    ]
    g_new = [
        [g_even[i][c] - eu_sg[i][c] for c in range(r)]
        for i in range(b)
    ]
    eu_slo = _mm_rows(e_up, s_lo, b, b, b)
    e_new = [[-eu_slo[i][j] for j in range(b)] for i in range(b)]

    _write(dn_ref, d_new, b)
    _write(en_ref, e_new, b)
    _write(gn_ref, g_new, r)
    _write(su_ref, s_up, b)
    _write(sl_ref, s_lo, b)
    _write(sg_ref, s_g, r)
    _write(cd_ref, cross_d, b)
    _write(cg_ref, cross_g, r)


def _factor_kernel(de_ref, do_ref, eu_ref, el_ref,
                   dn_ref, en_ref, su_ref, sl_ref, lo_ref, cd_ref,
                   *, b: int):
    """G-independent level half: eliminate + emit factors (incl. L rows)."""
    d_even = _read(de_ref, b, b)
    d_odd = _read(do_ref, b, b)
    e_up = _read(eu_ref, b, b)
    e_lo = _read(el_ref, b, b)

    L, inv = _chol_rows(d_odd, b)
    s_up = _chol_solve_rows(L, inv, _t_rows(e_up, b, b), b, b)
    s_lo = _chol_solve_rows(L, inv, e_lo, b, b)

    eu_sup = _mm_rows(e_up, s_up, b, b, b)
    cross_d = _mm_rows(_t_rows(e_lo, b, b), s_lo, b, b, b)
    d_new = [
        [d_even[i][j] - eu_sup[i][j] for j in range(b)] for i in range(b)
    ]
    eu_slo = _mm_rows(e_up, s_lo, b, b, b)
    e_new = [[-eu_slo[i][j] for j in range(b)] for i in range(b)]

    zero = jnp.zeros_like(L[0][0])
    L_full = [[L[i][j] if j <= i else zero for j in range(b)]
              for i in range(b)]
    _write(dn_ref, d_new, b)
    _write(en_ref, e_new, b)
    _write(su_ref, s_up, b)
    _write(sl_ref, s_lo, b)
    _write(lo_ref, L_full, b)
    _write(cd_ref, cross_d, b)


def _apply_kernel(lo_ref, eu_ref, el_ref, ge_ref, go_ref,
                  gn_ref, sg_ref, cg_ref, *, b: int, r: int):
    """RHS level half: reduce G through the stored factorization."""
    L = _read(lo_ref, b, b)
    inv = [1.0 / L[i][i] for i in range(b)]
    e_up = _read(eu_ref, b, b)
    e_lo = _read(el_ref, b, b)
    g_even = _read(ge_ref, b, r)
    g_odd = _read(go_ref, b, r)

    s_g = _chol_solve_rows(L, inv, g_odd, b, r)
    eu_sg = _mm_rows(e_up, s_g, b, b, r)
    cross_g = _mm_rows(_t_rows(e_lo, b, b), s_g, b, b, r)
    g_new = [
        [g_even[i][c] - eu_sg[i][c] for c in range(r)] for i in range(b)
    ]
    _write(gn_ref, g_new, r)
    _write(sg_ref, s_g, r)
    _write(cg_ref, cross_g, r)


def _bwd_kernel(xe_ref, xr_ref, su_ref, sl_ref, sg_ref, xo_ref,
                *, b: int, r: int):
    xe = _read(xe_ref, b, r)
    xr = _read(xr_ref, b, r)
    s_up = _read(su_ref, b, b)
    s_lo = _read(sl_ref, b, b)
    s_g = _read(sg_ref, b, r)
    t1 = _mm_rows(s_up, xe, b, b, r)
    t2 = _mm_rows(s_lo, xr, b, b, r)
    x_odd = [
        [s_g[i][c] - t1[i][c] - t2[i][c] for c in range(r)]
        for i in range(b)
    ]
    _write(xo_ref, x_odd, r)


def _interpret_default():
    return jax.default_backend() != "tpu"


def _rows2(A):
    """(b, c, m) -> (b*c, m)."""
    return A.reshape(A.shape[0] * A.shape[1], A.shape[2])


def _unrows(A, b, c):
    return A.reshape(b, c, A.shape[-1])


@functools.partial(jax.jit, static_argnames=("interpret",))
def cr_level(Ds, Es, Gs, *, interpret=None):
    """One SoA CR level via Pallas: (b, ·, m) -> halved system + factors."""
    if interpret is None:
        interpret = _interpret_default()
    b, r, m = Ds.shape[0], Gs.shape[1], Ds.shape[-1]
    h = m // 2
    t = min(_TILE, h)
    ng = h // t
    dtype = Ds.dtype

    def split2(A, c):
        """(b, c, m) -> even/odd (b*c, h) row forms."""
        A4 = A.reshape(b * c, h, 2)
        return A4[..., 0], A4[..., 1]

    de, do = split2(Ds, b)
    eu, el = split2(Es, b)
    ge, go = split2(Gs, r)

    spec = lambda rows: pl.BlockSpec(
        (rows, t), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    shp = lambda rows, n: jax.ShapeDtypeStruct((rows, n), dtype)

    dn, en, gn, su, sl, sg, cd, cg = pl.pallas_call(
        functools.partial(_fwd_kernel, b=b, r=r),
        grid=(ng,),
        in_specs=[spec(b * b)] * 4 + [spec(b * r)] * 2,
        out_specs=(
            spec(b * b), spec(b * b), spec(b * r),
            spec(b * b), spec(b * b), spec(b * r),
            spec(b * b), spec(b * r),
        ),
        out_shape=(
            shp(b * b, h), shp(b * b, h), shp(b * r, h),
            shp(b * b, h), shp(b * b, h), shp(b * r, h),
            shp(b * b, h), shp(b * r, h),
        ),
        interpret=interpret,
    )(de, do, eu, el, ge, go)

    # Slot j+1 absorbs the cross term from pair j (global shift-subtract).
    shift = lambda a: jnp.concatenate(
        [jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=-1
    )
    dn = dn - shift(cd)
    gn = gn - shift(cg)
    return (
        (_unrows(dn, b, b), _unrows(en, b, b), _unrows(gn, b, r)),
        (_unrows(su, b, b), _unrows(sl, b, b), _unrows(sg, b, r)),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def cr_level_factor(Ds, Es, *, interpret=None):
    """G-independent Pallas level: (b, b, m) -> halved (D, E) + factors.

    The returned factor tuple (lo, eu, el, su, sl) is in row form
    ((b*b, h) each) and feeds :func:`cr_level_apply` / :func:`cr_backsub`.
    """
    if interpret is None:
        interpret = _interpret_default()
    b, m = Ds.shape[0], Ds.shape[-1]
    h = m // 2
    t = min(_TILE, h)
    ng = h // t
    dtype = Ds.dtype

    def split2(A, c):
        A4 = A.reshape(b * c, h, 2)
        return A4[..., 0], A4[..., 1]

    de, do = split2(Ds, b)
    eu, el = split2(Es, b)
    spec = lambda rows: pl.BlockSpec(
        (rows, t), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    shp = lambda rows: jax.ShapeDtypeStruct((rows, h), dtype)
    dn, en, su, sl, lo, cd = pl.pallas_call(
        functools.partial(_factor_kernel, b=b),
        grid=(ng,),
        in_specs=[spec(b * b)] * 4,
        out_specs=tuple([spec(b * b)] * 6),
        out_shape=tuple([shp(b * b)] * 6),
        interpret=interpret,
    )(de, do, eu, el)
    shift = lambda a: jnp.concatenate(
        [jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=-1
    )
    dn = dn - shift(cd)
    return (
        (_unrows(dn, b, b), _unrows(en, b, b)),
        (lo, eu, el, su, sl),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def cr_level_apply(fac, Gs, *, interpret=None):
    """RHS Pallas level: reduce G through stored factors -> (g_new, s_g)."""
    if interpret is None:
        interpret = _interpret_default()
    lo, eu, el, _, _ = fac
    b = Gs.shape[0]
    r = Gs.shape[1]
    h = lo.shape[-1]
    t = min(_TILE, h)
    ng = h // t
    G4 = Gs.reshape(b * r, h, 2)
    ge, go = G4[..., 0], G4[..., 1]
    spec = lambda rows: pl.BlockSpec(
        (rows, t), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    shp = lambda rows: jax.ShapeDtypeStruct((rows, h), Gs.dtype)
    gn, sg, cg = pl.pallas_call(
        functools.partial(_apply_kernel, b=b, r=r),
        grid=(ng,),
        in_specs=[spec(b * b)] * 3 + [spec(b * r)] * 2,
        out_specs=tuple([spec(b * r)] * 3),
        out_shape=tuple([shp(b * r)] * 3),
        interpret=interpret,
    )(lo, eu, el, ge, go)
    shift = lambda a: jnp.concatenate(
        [jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=-1
    )
    gn = gn - shift(cg)
    return _unrows(gn, b, r), _unrows(sg, b, r)


def cr_backsub_rows(x_even, fac_rows, s_g, *, interpret=None):
    """Back-substitution taking the row-form factor tuple + SoA s_g."""
    _, _, _, su, sl = fac_rows
    b, r, h = x_even.shape
    return cr_backsub(
        x_even, _unrows(su, b, b), _unrows(sl, b, b), s_g,
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def cr_backsub(x_even, s_up, s_lo, s_g, *, interpret=None):
    """Backward CR level via Pallas: (b, r, h) -> (b, r, 2h) interleaved."""
    if interpret is None:
        interpret = _interpret_default()
    b, r, h = x_even.shape
    t = min(_TILE, h)
    ng = h // t
    xr = jnp.concatenate(
        [x_even[..., 1:], jnp.zeros_like(x_even[..., :1])], axis=-1
    )
    spec = lambda rows: pl.BlockSpec(
        (rows, t), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    x_odd = pl.pallas_call(
        functools.partial(_bwd_kernel, b=b, r=r),
        grid=(ng,),
        in_specs=[spec(b * r), spec(b * r), spec(b * b), spec(b * b),
                  spec(b * r)],
        out_specs=spec(b * r),
        out_shape=jax.ShapeDtypeStruct((b * r, h), x_even.dtype),
        interpret=interpret,
    )(_rows2(x_even), _rows2(xr), _rows2(s_up), _rows2(s_lo), _rows2(s_g))
    x_odd = _unrows(x_odd, b, r)
    return jnp.stack([x_even, x_odd], axis=-1).reshape(b, r, 2 * h)
