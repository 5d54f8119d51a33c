"""Shared-parameter multi-experiment estimation (BASELINE.json config 5):
batched VdP experiments with one shared parameter vector, solved by the
parameter-Schur DP algorithm — single shard (vmap) and sharded over the
"dp" axis of the virtual 8-device mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from scipy.integrate import solve_ivp

from collocfem_tpu.models import VanDerPol
from collocfem_tpu.ops.mesh import uniform_mesh
from collocfem_tpu.parallel.batch import (
    BatchDecision,
    make_multi_experiment_solver,
)
from collocfem_tpu.parallel.meshes import make_device_mesh
from collocfem_tpu.problem import EstimationProblem
from collocfem_tpu.solve import SolverOptions

MU_TRUE, B_TRUE = 1.3, 0.5
N_EXP = 8


def _simulate(x0, freq, tf):
    def u_fn(t):
        return np.sin(freq * t)

    def rhs(t, x):
        return [x[1], MU_TRUE * (1 - x[0] ** 2) * x[1] - x[0] + B_TRUE * u_fn(t)]

    sol = solve_ivp(rhs, (0.0, tf), x0, rtol=1e-10, atol=1e-11,
                    dense_output=True)
    return sol.sol, u_fn


@pytest.fixture(scope="module")
def batch_setup():
    tf = 8.0
    mesh = uniform_mesh(0.0, tf, num_elements=24, degree=4)
    t_meas = np.linspace(0.05, tf - 0.05, 80)
    model = VanDerPol()
    prob = EstimationProblem.build(model, mesh, t_meas, defect_weight=300.0)

    rng = np.random.default_rng(42)
    datas, v0s = [], []
    for i in range(N_EXP):
        x0 = rng.uniform(-2, 2, size=2)
        freq = 0.7 + 0.15 * i
        traj, u_fn = _simulate(x0, freq, tf)
        y = traj(t_meas)[0][:, None]
        u_nodes = u_fn(mesh.elem_times)[..., None]
        d = prob.pack_data(y, t_meas, u_nodes=u_nodes, p_weight=0.0)
        datas.append(d)
        v0s.append(prob.initial_guess_from_data(t_meas, y, p0=[0.0, 0.0]).V)
    data_batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)
    z0 = BatchDecision(
        V=jnp.stack(v0s), p=jnp.asarray([2.0, 0.2], prob.dtype)
    )
    p_prior = jnp.asarray([1.0, 1.0], prob.dtype)
    p_w = jnp.asarray([1e-3, 1e-3], prob.dtype)
    return prob, z0, data_batch, p_prior, p_w


def test_multi_experiment_vmap(batch_setup):
    prob, z0, data_batch, p_prior, p_w = batch_setup
    solve = make_multi_experiment_solver(
        prob, SolverOptions(maxiter=60, gtol=1e-9, xtol=1e-10)
    )
    z, stats = solve(z0, data_batch, p_prior, p_w)
    p = np.asarray(z.p)
    assert bool(stats.converged), np.asarray(stats.history)[:, :2]
    assert abs(p[0] - MU_TRUE) < 1e-3, p
    assert abs(p[1] - B_TRUE) < 1e-3, p


def test_multi_experiment_sharded_matches_vmap(batch_setup, eight_devices):
    prob, z0, data_batch, p_prior, p_w = batch_setup
    z_ref, _ = make_multi_experiment_solver(
        prob, SolverOptions(maxiter=30, gtol=1e-9)
    )(z0, data_batch, p_prior, p_w)

    mesh = make_device_mesh(dp=8, sp=1, devices=eight_devices)
    opts = SolverOptions(maxiter=30, gtol=1e-9)
    solve = make_multi_experiment_solver(prob, opts, dp_axis="dp")

    sharded = jax.jit(
        jax.shard_map(
            solve,
            mesh=mesh,
            in_specs=(
                BatchDecision(V=P("dp"), p=P()),
                jax.tree_util.tree_map(lambda _: P("dp"), data_batch),
                P(), P(),
            ),
            out_specs=(
                BatchDecision(V=P("dp"), p=P()),
                jax.tree_util.tree_map(lambda _: P(), (0,) * 6)
                and None,  # placeholder replaced below
            ),
        )
    )
    # out_specs for SolveStats: all replicated.
    from collocfem_tpu.solve.newton import SolveStats

    sharded = jax.jit(
        jax.shard_map(
            solve,
            mesh=mesh,
            in_specs=(
                BatchDecision(V=P("dp"), p=P()),
                jax.tree_util.tree_map(lambda _: P("dp"), data_batch),
                P(), P(),
            ),
            out_specs=(
                BatchDecision(V=P("dp"), p=P()),
                SolveStats(*([P()] * 6)),
            ),
        )
    )
    z_sh, stats_sh = sharded(z0, data_batch, p_prior, p_w)
    np.testing.assert_allclose(
        np.asarray(z_sh.p), np.asarray(z_ref.p), rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(z_sh.V), np.asarray(z_ref.V), rtol=1e-6, atol=1e-8
    )
