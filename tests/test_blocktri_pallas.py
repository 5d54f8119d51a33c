"""Fused Pallas batched Thomas kernel vs the jnp solvers (SURVEY.md §4:
"Pallas kernels tested in interpret mode" on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collocfem_tpu.ops.blocktri_pallas import batched_thomas_solve
from collocfem_tpu.solve.blocktri import blocktri_solve_cr


def _random_system(rng, n_exp, k, b, r, dtype=np.float64):
    A = rng.standard_normal((n_exp, k, b, b)).astype(dtype)
    D = jnp.asarray(
        A @ A.transpose(0, 1, 3, 2) + 4 * b * np.eye(b, dtype=dtype)
    )
    E = jnp.asarray(
        0.3 * rng.standard_normal((n_exp, k, b, b)).astype(dtype)
    )
    G = jnp.asarray(rng.standard_normal((n_exp, k, b, r)).astype(dtype))
    return D, E, G


@pytest.mark.parametrize("shape", [
    (4, 5, 3, 2),
    pytest.param((3, 16, 8, 3), marks=pytest.mark.slow),  # 35 s interpret-mode wall
])
def test_pallas_thomas_matches_cr(shape):
    rng = np.random.default_rng(0)
    D, E, G = _random_system(rng, *shape)
    X_pl = batched_thomas_solve(D, E, G, tile_e=2, interpret=True)
    X_cr = jax.vmap(blocktri_solve_cr)(D, E, G)
    np.testing.assert_allclose(
        np.asarray(X_pl), np.asarray(X_cr), rtol=1e-9, atol=1e-9
    )


def test_pallas_thomas_residual():
    rng = np.random.default_rng(1)
    D, E, G = _random_system(rng, 5, 9, 4, 2)
    X = batched_thomas_solve(D, E, G, tile_e=8, interpret=True)  # pads batch
    AX = jnp.einsum("ekij,ekjr->ekir", D, X)
    AX = AX.at[:, :-1].add(jnp.einsum("ekij,ekjr->ekir", E[:, :-1], X[:, 1:]))
    AX = AX.at[:, 1:].add(
        jnp.einsum("ekji,ekjr->ekir", E[:, :-1], X[:, :-1])
    )
    np.testing.assert_allclose(np.asarray(AX), np.asarray(G), atol=1e-10)


def test_pallas_in_multi_experiment_solver():
    # The fused kernel plugs into the shared-parameter batch solver.
    from collocfem_tpu.models import VanDerPol
    from collocfem_tpu.ops.mesh import uniform_mesh
    from collocfem_tpu.parallel.batch import (
        BatchDecision,
        make_multi_experiment_solver,
    )
    from collocfem_tpu.problem import EstimationProblem
    from collocfem_tpu.solve import SolverOptions
    from collocfem_tpu.utils import rk4_trajectory

    model = VanDerPol()
    tf = 6.0
    mesh = uniform_mesh(0.0, tf, 8, 3)
    t_meas = np.linspace(0.05, tf - 0.05, 40)
    prob = EstimationProblem.build(model, mesh, t_meas, defect_weight=300.0)

    ts = np.linspace(0, tf, 4001)
    rng = np.random.default_rng(2)
    datas, v0s = [], []
    for i in range(4):
        freq = 0.8 + 0.1 * i
        xs = rk4_trajectory(
            model.f, jnp.asarray(rng.uniform(-1, 1, 2)), ts,
            u_fn=lambda t, f=freq: jnp.stack([jnp.sin(f * t)]),
            p=jnp.asarray([1.3, 0.5]),
        )
        y = np.interp(t_meas, ts, np.asarray(xs[:, 0]))[:, None]
        u_nodes = np.sin(freq * mesh.elem_times)[..., None]
        datas.append(prob.pack_data(y, t_meas, u_nodes=u_nodes))
        v0s.append(prob.initial_guess_from_data(t_meas, y, p0=[0, 0]).V)
    data_batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)
    z0 = BatchDecision(V=jnp.stack(v0s), p=jnp.asarray([0.8, 0.8], prob.dtype))

    def pallas_chain(D, E, G):
        return batched_thomas_solve(D, E, G, tile_e=4, interpret=True)

    pallas_chain.batched = True
    opts = SolverOptions(maxiter=40, gtol=1e-8, xtol=1e-10)
    solve_pl = make_multi_experiment_solver(
        prob, opts, chain_solver=pallas_chain
    )
    solve_cr = make_multi_experiment_solver(prob, opts)
    pw = jnp.full((2,), 1e-3, prob.dtype)
    pp = jnp.zeros(2, prob.dtype)
    z_pl, st_pl = solve_pl(z0, data_batch, pp, pw)
    z_cr, st_cr = solve_cr(z0, data_batch, pp, pw)
    np.testing.assert_allclose(
        np.asarray(z_pl.p), np.asarray(z_cr.p), rtol=1e-8, atol=1e-10
    )
