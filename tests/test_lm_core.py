"""Unit tests for the shared LM loop machinery (solve/lm_core.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from collocfem_tpu.ops import doubleword as dw
from collocfem_tpu.solve.lm_core import (
    LMAux,
    lm_loop,
    psum_dw,
    replicate,
)


def test_alpha_pred_matches_quadratic_model():
    """pred(α) in lm_loop must equal the EXACT decrease of the quadratic
    model m(s) = g·s + ½ sᵀHs along the damped-Newton step α·s, for any
    clip fraction α — including α = 1 (the classic LM formula)."""
    rng = np.random.default_rng(0)
    n = 7
    A = rng.standard_normal((n, n))
    H = A @ A.T + 0.5 * np.eye(n)
    g = rng.standard_normal(n)
    lam = 0.37
    dmax = np.max(np.diag(H))
    s = -np.linalg.solve(H + lam * dmax * np.eye(n), g)
    for alpha in [1.0, 0.625, 0.31, 0.05]:
        m = alpha * g @ s + 0.5 * alpha**2 * s @ H @ s
        gdot = g @ s
        sds = dmax * (s @ s)
        pred = -alpha * (1.0 - 0.5 * alpha) * gdot + 0.5 * alpha**2 * lam * sds
        np.testing.assert_allclose(pred, -m, rtol=1e-12)


def test_lm_loop_minimizes_quadratic():
    """The shared loop drives a pure least-squares quadratic to its
    minimum in a handful of iterations."""
    rng = np.random.default_rng(1)
    n = 5
    J = jnp.asarray(rng.standard_normal((12, n)))
    y = jnp.asarray(rng.standard_normal(12))
    z_star = np.linalg.lstsq(np.asarray(J), np.asarray(y), rcond=None)[0]

    def cost_dw(z):
        r = J @ z - y
        return dw.mul_single(dw.pairwise_sum(dw.DW(*dw.two_prod(r, r))), 0.5)

    H = J.T @ J
    dmax = jnp.max(jnp.diag(H))

    def trial_fn(z, carry, lam):
        r = J @ z - y
        g = J.T @ r
        s = -jnp.linalg.solve(H + lam * dmax * jnp.eye(n), g)
        z_try = z + s
        gdot = jnp.vdot(g, s)
        sn2 = jnp.vdot(s, s)
        aux = LMAux(
            gnorm=jnp.max(jnp.abs(g)), gdot=gdot, sds=dmax * sn2,
            step_norm=jnp.sqrt(sn2), alpha=jnp.asarray(1.0, z.dtype),
        )
        return z_try, carry, cost_dw(z_try), aux

    z0 = jnp.zeros(n)
    st = jax.jit(
        lambda z: lm_loop(
            z, (), cost_dw(z), trial_fn, maxiter=30, lam0=1e-6,
            gtol=1e-12, dtype=z.dtype,
        )
    )(z0)
    assert bool(st.done)
    np.testing.assert_allclose(np.asarray(st.z), z_star, atol=1e-9)
    # History logged the accepted first step.
    hist = np.asarray(st.history)
    assert hist[0, 4] == 1.0


def test_lm_loop_lam_rail_terminates():
    """A trial that never improves must exit via the λ rail, quickly."""
    def cost_dw(z):
        return dw.from_single(jnp.asarray(1.0))

    def trial_fn(z, carry, lam):
        aux = LMAux(
            gnorm=jnp.asarray(1.0), gdot=jnp.asarray(-1.0),
            sds=jnp.asarray(1.0), step_norm=jnp.asarray(1.0),
            alpha=jnp.asarray(1.0),
        )
        return z, carry, dw.from_single(jnp.asarray(2.0)), aux  # worse

    st = lm_loop(
        jnp.zeros(2), (), cost_dw(None), trial_fn,
        maxiter=500, lam0=1.0, lam_max=1e6, dtype=jnp.zeros(2).dtype,
    )
    assert bool(st.done)
    assert int(st.it) < 30  # nu-escalated rejections rail fast, not at 500


def test_psum_dw_exact_and_invariant(eight_devices):
    """psum_dw must (a) beat plain-psum rounding by orders of magnitude and
    (b) return an INVARIANT value: returnable under P() out_specs with
    vma checking ON, usable in while_loop carries."""
    mesh = jax.make_mesh((8,), ("dp",), devices=eight_devices)
    rng = np.random.default_rng(2)
    # Partials span 8 orders of magnitude: a plain f32 sum rounds hard.
    parts = (rng.standard_normal(8) * np.logspace(0, 8, 8)).astype(np.float32)
    want = float(np.sum(parts.astype(np.float64)))  # oracle on f32 inputs

    x32 = jnp.asarray(parts, jnp.float32)

    def f(x):
        local = dw.DW(x[0], jnp.zeros_like(x[0]))
        s = psum_dw(local, "dp")
        plain = jax.lax.psum(x[0], "dp")
        # while_loop carry exercises the invariant typing.
        out = jax.lax.while_loop(
            lambda c: c < s.hi * 0.5, lambda c: c + s.hi, jnp.zeros(())
        )
        return dw.to_float64(s) if x.dtype == jnp.float64 else (
            s.hi.astype(jnp.float64) + s.lo.astype(jnp.float64)
        ), plain, out

    got, plain, _ = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=P("dp"),
                      out_specs=(P(), P(), P()))
    )(x32)
    err_dw = abs(float(got) - want)
    err_plain = abs(float(np.asarray(plain, dtype=np.float64)) - want)
    # DW sum: ~eps² relative; plain f32 psum: ~eps·max|part|.
    assert err_dw <= max(1e-12 * abs(want), 0.25 * err_plain + 1e-30), (
        err_dw, err_plain
    )


def test_replicate_preserves_bits(eight_devices):
    mesh = jax.make_mesh((8,), ("dp",), devices=eight_devices)

    def f(x):
        g = jax.lax.all_gather(x, "dp")     # varying-typed
        v = jnp.sum(g) * 1.5
        return replicate(v, "dp")           # invariant, same bits

    out = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=P("dp"), out_specs=P())
    )(jnp.arange(8.0))
    np.testing.assert_allclose(float(out), 1.5 * np.arange(8.0).sum())
