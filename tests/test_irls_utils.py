"""IRLS robust estimation + auxiliary-subsystem tests (checkpoint, rk4,
timing harness)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collocfem_tpu.models import VanDerPol
from collocfem_tpu.ops.mesh import uniform_mesh
from collocfem_tpu.problem import Decision, EstimationProblem
from collocfem_tpu.solve import SolverOptions, make_gn_solver
from collocfem_tpu.solve.newton import make_irls_solver
from collocfem_tpu.utils import (
    load_pytree,
    rk4_trajectory,
    save_pytree,
    timed,
)

MU, B = 1.0, 1.0
TF = 8.0


def test_rk4_matches_analytic():
    # Linear oscillator x'' = -x with exact solution sin(t).
    f = lambda x, u, p, t: jnp.stack([x[1], -x[0]])
    ts = np.linspace(0.0, 2 * np.pi, 2001)
    xs = rk4_trajectory(f, jnp.asarray([0.0, 1.0]), ts)
    np.testing.assert_allclose(
        np.asarray(xs[:, 0]), np.sin(ts), atol=1e-9
    )


@pytest.fixture(scope="module")
def outlier_setup():
    # Degree 2: robustness claims are discretization-insensitive and the
    # solver-loop compile is ~3x cheaper (fast tier is compile-bound).
    mesh = uniform_mesh(0.0, TF, 48, 2)
    t_meas = np.linspace(0.05, TF - 0.05, 120)
    model = VanDerPol()
    u_fn = lambda t: jnp.sin(0.9 * jnp.atleast_1d(t))

    ts_fine = np.linspace(0.0, TF, 8001)
    xs = rk4_trajectory(
        model.f, jnp.asarray([1.0, 0.0]), ts_fine,
        u_fn=lambda t: jnp.stack([jnp.sin(0.9 * t)]), p=jnp.asarray([MU, B]),
    )
    y = np.interp(t_meas, ts_fine, np.asarray(xs[:, 0]))[:, None]
    rng = np.random.default_rng(5)
    y += 0.01 * rng.standard_normal(y.shape)
    # 8 gross outliers.
    idx = rng.choice(t_meas.size, 8, replace=False)
    y[idx] += rng.choice([-1, 1], 8)[:, None] * 2.0

    prob = EstimationProblem.build(model, mesh, t_meas, defect_weight=300.0)
    u_nodes = np.sin(0.9 * mesh.elem_times)[..., None]
    data = prob.pack_data(y, t_meas, u_nodes=u_nodes, meas_weight=100.0)
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.5, 0.5])
    return prob, z0, data


def test_irls_beats_plain_gn_on_outliers(outlier_setup):
    prob, z0, data = outlier_setup
    opts = SolverOptions(maxiter=40, gtol=1e-8, xtol=1e-10, irls_delta=2.0)
    z_plain, _ = make_gn_solver(prob, opts)(z0, data)
    z_rob, stats, dataw = make_irls_solver(prob, opts, n_rounds=4)(z0, data)
    err_plain = np.abs(np.asarray(z_plain.p) - [MU, B]).max()
    err_rob = np.abs(np.asarray(z_rob.p) - [MU, B]).max()
    assert err_rob < err_plain / 3, (err_plain, err_rob)
    # Huber (soft) influence keeps a small residual bias with 8 gross
    # outliers at weight delta/|r|; observed ~1.4e-2 vs 0.55 unrobust.
    assert err_rob < 3e-2
    # Outlier samples got visibly down-weighted.
    w = np.asarray(dataw.meas_w)
    assert w.min() < 0.1 * w.max()


def test_checkpoint_roundtrip(tmp_path, outlier_setup):
    prob, z0, data = outlier_setup
    path = os.path.join(tmp_path, "ckpt.npz")
    save_pytree(path, z0)
    z1 = load_pytree(path, z0)
    np.testing.assert_array_equal(np.asarray(z0.V), np.asarray(z1.V))
    np.testing.assert_array_equal(np.asarray(z0.p), np.asarray(z1.p))
    # Structure mismatch is detected.
    with pytest.raises(ValueError):
        load_pytree(path, (z0.V,))


def test_timed_harness():
    f = jax.jit(lambda x: x * 2.0)
    secs, out = timed(f, jnp.ones(8), reps=2)
    assert secs >= 0.0
    np.testing.assert_allclose(np.asarray(out), 2.0)
