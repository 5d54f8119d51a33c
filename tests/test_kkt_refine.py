"""Iterative refinement of the damped KKT solve (SURVEY.md §7 hard part 4):
in float32, refinement must reduce the true KKT residual of an
ill-conditioned system by orders of magnitude."""

import jax
import jax.numpy as jnp
import numpy as np

from collocfem_tpu.ops.assemble import BlockTriSystem
from collocfem_tpu.solve.kkt import blocktri_matvec, solve_kkt


def _ill_conditioned_system(rng, k=32, bd=4, nq=2, spread=1e6):
    """SPD block-tri + arrowhead with wildly mixed row scales."""
    scales = spread ** rng.uniform(0, 1, size=(k, bd))
    A = rng.standard_normal((k, bd, bd))
    D = (A @ A.transpose(0, 2, 1) + 10 * bd * np.eye(bd))
    D = D * scales[:, :, None] * scales[:, None, :]
    E = 0.05 * rng.standard_normal((k, bd, bd))
    E = E * scales[:, :, None] * np.concatenate(
        [scales[1:], np.ones((1, bd))]
    )[:, None, :]
    B = rng.standard_normal((k, bd, nq)) * scales[:, :, None]
    Cq = rng.standard_normal((nq, nq))
    C = Cq @ Cq.T + 10 * np.eye(nq)
    gx = rng.standard_normal((k, bd)) * scales
    gp = rng.standard_normal(nq)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return BlockTriSystem(
        D=f32(D), E=f32(E), B=f32(B), C=f32(C), gx=f32(gx), gp=f32(gp)
    )


def _kkt_residual(sys, lam, dx, dp):
    """True residual of the damped system under the DIMENSIONLESS-lam
    contract: the damping added is lam * max(diag(D) u diag(C)) * I
    (solve.kkt._equilibrate)."""
    bd = sys.block_size
    eye = jnp.eye(bd, dtype=sys.D.dtype)
    dmax = jnp.max(jnp.einsum("kii->ki", sys.D))
    if sys.C.shape[0]:
        dmax = jnp.maximum(dmax, jnp.max(jnp.diag(sys.C)))
    lam = lam * dmax
    rx = (
        sys.gx
        + blocktri_matvec(sys.D + lam * eye, sys.E, dx)
        + jnp.einsum("kbq,q->kb", sys.B, dp,
                     precision=jax.lax.Precision.HIGHEST)
    )
    rp = (
        sys.gp
        + jnp.einsum("kbq,kb->q", sys.B, dx,
                     precision=jax.lax.Precision.HIGHEST)
        + (sys.C + lam * jnp.eye(sys.C.shape[0], dtype=sys.C.dtype)) @ dp
    )
    denom = max(float(jnp.max(jnp.abs(sys.gx))), float(jnp.max(jnp.abs(sys.gp))))
    return max(float(jnp.max(jnp.abs(rx))), float(jnp.max(jnp.abs(rp)))) / denom


def test_refinement_tightens_f32_solve():
    rng = np.random.default_rng(0)
    sys = _ill_conditioned_system(rng)
    lam = jnp.float32(1e-6)
    dx0, dp0 = jax.jit(
        lambda s: solve_kkt(s, lam, "cr", refine=0)
    )(sys)
    dx2, dp2 = jax.jit(
        lambda s: solve_kkt(s, lam, "cr", refine=2)
    )(sys)
    r0 = _kkt_residual(sys, lam, dx0, dp0)
    r2 = _kkt_residual(sys, lam, dx2, dp2)
    assert np.isfinite(r0) and np.isfinite(r2)
    assert r2 < 0.2 * r0 or r2 < 1e-6, (r0, r2)


def test_refinement_noop_in_f64():
    # In f64 the first solve is already accurate; refinement must not hurt.
    rng = np.random.default_rng(1)
    sys = _ill_conditioned_system(rng, spread=1e3)
    sys = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), sys)
    lam = jnp.float64(1e-8)
    dx1, dp1 = solve_kkt(sys, lam, "cr", refine=1)
    r1 = _kkt_residual(sys, lam, dx1, dp1)
    assert r1 < 1e-12, r1
