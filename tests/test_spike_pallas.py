"""Single-kernel SPIKE block-tridiagonal solve (ops.spike_pallas) vs the
scan oracle, in interpret mode on CPU (SURVEY.md §4: Pallas kernels tested
via interpret=True), plus an end-to-end Gauss-Newton solve with
method='spike'."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collocfem_tpu.ops.spike_pallas import _plan, blocktri_solve_spike_fused
from collocfem_tpu.solve.blocktri import blocktri_solve_scan


def _spd_chain(rng, k, b, r, couple=0.3):
    D = np.zeros((k, b, b))
    E = rng.standard_normal((k, b, b)) * couple
    E[-1] = 0.0
    for i in range(k):
        m = rng.standard_normal((b, b))
        D[i] = m @ m.T + 2 * b * np.eye(b)
    G = rng.standard_normal((k, b, r))
    return jnp.asarray(D), jnp.asarray(E), jnp.asarray(G)


def _to_soa(A):
    return jnp.transpose(A, (1, 2, 0))


# Interpret-mode walls on CPU run minutes per case; the fast tier keeps
# the two smallest shapes (still covering padding + multi-tile interface
# CR), the rest are slow-tier (--runslow).
@pytest.mark.parametrize(
    "k,b,r,tiles",
    [
        (3, 2, 1, 128),   # minimum chain, tiles collapse to 1
        (7, 3, 2, 4),     # padding + tiny tiles
        pytest.param(20, 4, 3, 8, marks=pytest.mark.slow),
        pytest.param(37, 8, 3, 8, marks=pytest.mark.slow),  # KKT block size,
        # K not divisible by tiles
    ],
)
def test_matches_scan_oracle(k, b, r, tiles):
    rng = np.random.default_rng(k)
    D, E, G = _spd_chain(rng, k, b, r)
    want = blocktri_solve_scan(D, E, G)
    got = blocktri_solve_spike_fused(
        _to_soa(D), _to_soa(E), _to_soa(G), tiles=tiles, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (2, 0, 1))), np.asarray(want),
        rtol=1e-11, atol=1e-12,
    )


def test_plan_shapes():
    assert _plan(10001, 128) == (128, 79)
    assert _plan(3, 128) == (1, 3)
    assert _plan(6, 128) == (2, 3)
    t, l = _plan(20, 8)
    assert t * l >= 20 and l >= 3 and (t & (t - 1)) == 0


@pytest.mark.slow
def test_illconditioned_chain():
    # 1-D-Poisson-like chain (cond ~ K^2), the collocation KKT regime.
    k, b, r = 80, 4, 2
    rng = np.random.default_rng(0)
    D = np.tile(2.0 * np.eye(b), (k, 1, 1))
    E = np.tile(-1.0 * np.eye(b), (k, 1, 1))
    E[-1] = 0.0
    G = rng.standard_normal((k, b, r))
    D, E, G = jnp.asarray(D), jnp.asarray(E), jnp.asarray(G)
    want = blocktri_solve_scan(D, E, G)
    got = blocktri_solve_spike_fused(
        _to_soa(D), _to_soa(E), _to_soa(G), tiles=16, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (2, 0, 1))), np.asarray(want),
        rtol=1e-9, atol=1e-10,
    )


@pytest.mark.slow
def test_gn_solver_spike_end_to_end():
    """method='spike' drives the full estimation loop to the same answer."""
    from collocfem_tpu.models import VanDerPol
    from collocfem_tpu.ops.mesh import uniform_mesh
    from collocfem_tpu.problem import EstimationProblem
    from collocfem_tpu.solve import SolverOptions
    from collocfem_tpu.solve.newton import make_gn_solver
    from collocfem_tpu.utils import rk4_trajectory

    model = VanDerPol()
    tf = 6.0
    mesh = uniform_mesh(0.0, tf, 12, 4)
    t_meas = np.linspace(0.05, tf - 0.05, 40)
    ts = np.linspace(0.0, tf, 2001)
    xs = rk4_trajectory(
        model.f, jnp.asarray([1.0, 0.0]), jnp.asarray(ts),
        u_fn=lambda t: jnp.zeros((1,)), p=jnp.asarray([1.0, 1.0]),
    )
    y = np.interp(t_meas, ts, np.asarray(xs[:, 0]))[:, None]
    prob = EstimationProblem.build(model, mesh, t_meas, defect_weight=100.0)
    data = prob.pack_data(y, t_meas)
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.7, 0.7])

    opts = SolverOptions(maxiter=30, gtol=1e-9, xtol=1e-13)
    z_cr, _ = make_gn_solver(
        prob, __import__("dataclasses").replace(opts, method="cr"))(z0, data)
    z_sp, stats = make_gn_solver(
        prob, __import__("dataclasses").replace(opts, method="spike"))(
            z0, data)
    assert bool(stats.converged)
    np.testing.assert_allclose(np.asarray(z_sp.p), np.asarray(z_cr.p),
                               rtol=1e-8)
