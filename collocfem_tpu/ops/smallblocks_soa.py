"""Structure-of-arrays tiny-block algebra: block indices LEADING, batch last.

The (K, b, b) block-major layout puts the tiny b*b=64-element blocks on the
minor (tiled) axes — each block occupies a mostly-empty (8, 128) TPU tile
and every strided chain access walks tiles.  Here block matrices are stored
as (b, b, K): the chain dimension K rides the 128-wide vector lanes, every
unrolled arithmetic op is a full-width elementwise op over K, and the CR
even/odd split becomes a contiguous pair reshape.  Measured on v5e, the
in-loop cyclic reduction went from ~4x cost growth per K-doubling
(layout-bound) to linear.

All functions are exact (same flop sequence as smallblocks, no
approximation) and layout-only transposes at the solver boundary convert
from/to the block-major convention.
"""

from __future__ import annotations

import jax.numpy as jnp


def from_aos(A):
    """(K, b, b) or (K, b, r) -> (b, b|r, K)."""
    return jnp.moveaxis(A, 0, -1)


def to_aos(A):
    """(b, r, K) -> (K, b, r)."""
    return jnp.moveaxis(A, -1, 0)


def chol(A):
    """Lower Cholesky of SPD blocks in SoA layout: A (b, b, K) -> L."""
    b = A.shape[0]
    L = [[None] * b for _ in range(b)]
    inv = [None] * b
    for j in range(b):
        s = A[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        # Clamp (see smallblocks.chol): finite junk over NaN poisoning.
        d = jnp.sqrt(jnp.maximum(s, jnp.finfo(s.dtype).tiny))
        L[j][j] = d
        inv[j] = 1.0 / d
        for i in range(j + 1, b):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv[j]
    zero = jnp.zeros_like(A[0, 0])
    return jnp.stack([
        jnp.stack([L[i][j] if j <= i else zero for j in range(b)])
        for i in range(b)
    ])


def solve_lower(L, B):
    """X with L X = B; L (b, b, K) lower, B (b, r, K)."""
    b, r = B.shape[0], B.shape[1]
    X = [[None] * r for _ in range(b)]
    for i in range(b):
        inv = 1.0 / L[i, i]
        for c in range(r):
            s = B[i, c]
            for k in range(i):
                s = s - L[i, k] * X[k][c]
            X[i][c] = s * inv
    return jnp.stack([jnp.stack(row) for row in X])


def solve_lower_t(L, B):
    """X with L^T X = B."""
    b, r = B.shape[0], B.shape[1]
    X = [[None] * r for _ in range(b)]
    for i in range(b - 1, -1, -1):
        inv = 1.0 / L[i, i]
        for c in range(r):
            s = B[i, c]
            for k in range(i + 1, b):
                s = s - L[k, i] * X[k][c]
            X[i][c] = s * inv
    return jnp.stack([jnp.stack(row) for row in X])


def chol_solve(L, B):
    return solve_lower_t(L, solve_lower(L, B))


def mm(A, B):
    """(b, m, K) @ (m, c, K) -> (b, c, K), unrolled over block indices."""
    b, m = A.shape[0], A.shape[1]
    c = B.shape[1]
    return jnp.stack([
        jnp.stack([
            sum(A[i, j] * B[j, k] for j in range(m)) for k in range(c)
        ])
        for i in range(b)
    ])


def mtm(A, B):
    """A^T @ B in SoA: (m, b, K)^T @ (m, c, K) -> (b, c, K)."""
    m, b = A.shape[0], A.shape[1]
    c = B.shape[1]
    return jnp.stack([
        jnp.stack([
            sum(A[j, i] * B[j, k] for j in range(m)) for k in range(c)
        ])
        for i in range(b)
    ])


def transpose(A):
    """(b, c, K) -> (c, b, K)."""
    return jnp.swapaxes(A, 0, 1)
