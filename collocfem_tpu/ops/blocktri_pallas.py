"""Pallas TPU kernel: fused batched block-tridiagonal Cholesky (Thomas) solve.

The batched multi-experiment config (BASELINE.json config 5) solves
thousands of independent SHORT block-tridiagonal chains per Newton
iteration.  The jnp path launches one XLA op per factorization step with
HBM round-trips between them; this kernel runs the ENTIRE forward
elimination + back substitution of a tile of experiments inside VMEM in one
Mosaic program — factors, intermediate solves and all — touching HBM once
per input/output (BASELINE.json north_star: "Pallas ... block-tridiagonal LU
instead of a scipy/UMFPACK sparse factorization").

Design (pallas_guide.md):
  * grid over experiment tiles; each program owns (TILE_E, K, b, b) in VMEM;
  * the chain position k and block indices (i, j) are small and STATIC:
    all loops unroll at trace time, so every arithmetic op is an
    elementwise VPU op over the experiment tile (the batch rides the
    8x128 vector lanes);
  * pivot-free: damped GN blocks are SPD (SURVEY.md §7 hard part 1).

Use :func:`batched_thomas_solve` (jittable, CPU fallback via interpret
mode).  Shapes: D (E, K, b, b) SPD diagonal, Ecoup (E, K, b, b) upper
coupling (last unused), G (E, K, b, r) -> X (E, K, b, r).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from collocfem_tpu.ops.einsum_hp import einsum_hp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from collocfem_tpu.ops import smallblocks


def _thomas_kernel(d_ref, e_ref, g_ref, x_ref, *, kk: int):
    """One experiment tile: block-Cholesky forward sweep + back substitution.

    All refs are (TILE_E, K, b, b) / (TILE_E, K, b, r) VMEM blocks.  The
    chain loop is unrolled (K static); smallblocks' unrolled factorizations
    make every op an elementwise op over the leading experiment axis.
    """
    ls = []
    l0 = smallblocks.chol(d_ref[:, 0])
    y_prev = g_ref[:, 0]
    ls.append(l0)
    ys = [y_prev]
    l_prev = l0
    for k in range(1, kk):
        e_prev = e_ref[:, k - 1]
        w = smallblocks.chol_solve(l_prev, e_prev)           # U^{-1}E
        u = d_ref[:, k] - einsum_hp(
            "eji,ejk->eik", e_prev, w, preferred_element_type=e_prev.dtype
        )
        y = g_ref[:, k] - einsum_hp(
            "eji,ejk->eik", w, y_prev, preferred_element_type=w.dtype
        )
        l_prev = smallblocks.chol(u)
        y_prev = y
        ls.append(l_prev)
        ys.append(y)

    x_next = smallblocks.chol_solve(ls[-1], ys[-1])
    x_ref[:, kk - 1] = x_next
    for k in range(kk - 2, -1, -1):
        rhs = ys[k] - einsum_hp(
            "eij,ejk->eik", e_ref[:, k], x_next,
            preferred_element_type=x_next.dtype,
        )
        x_next = smallblocks.chol_solve(ls[k], rhs)
        x_ref[:, k] = x_next


@functools.partial(jax.jit, static_argnames=("tile_e", "interpret"))
def batched_thomas_solve(D, E, G, *, tile_e: int = 128, interpret=None):
    """Solve a batch of SPD block-tridiagonal systems in one Pallas kernel.

    Args:
      D: (n_exp, K, b, b) SPD diagonal blocks (damping already applied).
      E: (n_exp, K, b, b) super-diagonal coupling; E[:, K-1] ignored.
      G: (n_exp, K, b, r) right-hand sides.
      tile_e: experiments per program instance (rides the vector lanes).
      interpret: force interpreter mode (auto: True off-TPU).
    Returns:
      X (n_exp, K, b, r) with A X = G per experiment.
    """
    n_exp, kk, b, _ = D.shape
    r = G.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile = min(tile_e, n_exp)
    if n_exp % tile:
        pad = tile - n_exp % tile
        padder = lambda a, diag: jnp.concatenate(
            [a, jnp.broadcast_to(
                jnp.eye(a.shape[-2], a.shape[-1], dtype=a.dtype) * diag,
                (pad,) + a.shape[1:],
            )], axis=0,
        )
        D = padder(D, 1.0)
        E = padder(E, 0.0)
        G = jnp.concatenate(
            [G, jnp.zeros((pad,) + G.shape[1:], G.dtype)], axis=0
        )
    n_pad = D.shape[0]

    grid = (n_pad // tile,)
    bs = lambda shp: pl.BlockSpec(
        (tile,) + shp, lambda i: (i,) + (0,) * len(shp),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_thomas_kernel, kk=kk),
        out_shape=jax.ShapeDtypeStruct((n_pad, kk, b, r), G.dtype),
        grid=grid,
        in_specs=[bs((kk, b, b)), bs((kk, b, b)), bs((kk, b, r))],
        out_specs=bs((kk, b, r)),
        interpret=interpret,
    )(D, E, G)
    return out[:n_exp]
