"""Element-chain sharded GN (assembly + SPIKE solve over "sp") must match
the single-device solver (SURVEY.md §5 sequence-parallel rebuild plan;
tested on the virtual 8-device CPU mesh per §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collocfem_tpu.models import VanDerPol
from collocfem_tpu.ops.mesh import uniform_mesh
from collocfem_tpu.parallel.meshes import make_device_mesh
from collocfem_tpu.parallel.sharded import make_sp_gn_solver
from collocfem_tpu.problem import EstimationProblem
from collocfem_tpu.solve import SolverOptions, make_gn_solver
from collocfem_tpu.utils import rk4_trajectory

MU, B = 1.0, 1.0
TF = 6.0


@pytest.fixture(scope="module")
def setup():
    # N = 15 elements -> K = 16 blocks: divides by sp = 4 and 8.
    mesh = uniform_mesh(0.0, TF, 15, 3)
    t_meas = np.linspace(0.05, TF - 0.05, 60)
    model = VanDerPol()
    ts = np.linspace(0.0, TF, 6001)
    xs = rk4_trajectory(
        model.f, jnp.asarray([1.0, 0.0]), ts,
        u_fn=lambda t: jnp.stack([jnp.sin(0.9 * t)]),
        p=jnp.asarray([MU, B]),
    )
    y = np.interp(t_meas, ts, np.asarray(xs[:, 0]))[:, None]
    prob = EstimationProblem.build(model, mesh, t_meas, defect_weight=100.0)
    u_nodes = np.sin(0.9 * mesh.elem_times)[..., None]
    data = prob.pack_data(y, t_meas, u_nodes=u_nodes)
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.5, 0.5])
    return prob, z0, data


@pytest.mark.parametrize("sp", [4, 8])
def test_sp_sharded_matches_single_device(setup, eight_devices, sp):
    prob, z0, data = setup
    opts = SolverOptions(maxiter=30, gtol=1e-9, xtol=1e-12)
    z_ref, stats_ref = make_gn_solver(prob, opts)(z0, data)

    dev_mesh = make_device_mesh(dp=1, sp=sp, devices=eight_devices[:sp])
    solve = make_sp_gn_solver(prob, dev_mesh, opts)
    z_sh, stats_sh = solve(z0, data)

    np.testing.assert_allclose(
        np.asarray(z_sh.p), np.asarray(z_ref.p), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(z_sh.V), np.asarray(z_ref.V), rtol=1e-6, atol=1e-8
    )
    # Coarse-mesh discretization bias ~2e-3 (identical in both solvers).
    np.testing.assert_allclose(
        np.asarray(z_sh.p), [MU, B], atol=5e-3
    )
