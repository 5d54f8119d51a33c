"""Parameter covariance: structured Schur computation vs dense inverse, and
statistical calibration on repeated noisy estimations (SURVEY.md §3.4
output-error standard errors).

Degree 2 + ONE shared solver build: every check here is either parity vs a
dense oracle of the SAME system or statistical calibration — neither needs
degree-4 discretization accuracy, and XLA:CPU solver-loop compiles cost
~3x more at degree 4 (the fast tier is compile-bound)."""

import jax.numpy as jnp
import numpy as np
import pytest

from collocfem_tpu.models import VanDerPol
from collocfem_tpu.ops.assemble import assemble_gn, materialize_dense
from collocfem_tpu.ops.mesh import uniform_mesh
from collocfem_tpu.problem import EstimationProblem
from collocfem_tpu.solve import SolverOptions, make_gn_solver
from collocfem_tpu.solve.blocktri import blocktri_inverse_blocks
from collocfem_tpu.solve.covariance import (
    element_covariance,
    parameter_covariance,
    parameter_std,
    state_covariance_blocks,
    state_covariance_nodes,
    state_std,
    trajectory_std,
)
from collocfem_tpu.utils import rk4_trajectory

MU, B, TF = 1.0, 1.0, 8.0
NOISE = 0.05


@pytest.fixture(scope="module")
def setup():
    model = VanDerPol()
    mesh = uniform_mesh(0.0, TF, 24, 2)
    t_meas = np.linspace(0.05, TF - 0.05, 80)
    ts = np.linspace(0.0, TF, 8001)
    xs = rk4_trajectory(
        model.f, jnp.asarray([1.0, 0.0]), ts,
        u_fn=lambda t: jnp.stack([jnp.sin(0.9 * t)]),
        p=jnp.asarray([MU, B]),
    )
    y_clean = np.interp(t_meas, ts, np.asarray(xs[:, 0]))[:, None]
    prob = EstimationProblem.build(model, mesh, t_meas, defect_weight=1e3)
    u_nodes = np.sin(0.9 * mesh.elem_times)[..., None]
    return prob, t_meas, y_clean, u_nodes


@pytest.fixture(scope="module")
def solver(setup):
    prob = setup[0]
    return make_gn_solver(prob, SolverOptions(maxiter=40, xtol=1e-12))


def test_matches_dense_inverse(setup, solver):
    prob, t_meas, y_clean, u_nodes = setup
    rng = np.random.default_rng(0)
    y = y_clean + NOISE * rng.standard_normal(y_clean.shape)
    data = prob.pack_data(y, t_meas, u_nodes=u_nodes, meas_weight=1 / NOISE)
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.8, 0.8])
    z, _ = solver(z0, data)

    cov = np.asarray(parameter_covariance(prob, z, data))
    # Dense oracle: invert the full GN matrix, take the p-block.
    sys = assemble_gn(prob, z, data)
    H, _ = materialize_dense(sys)
    n = H.shape[0]
    cov_dense = np.linalg.inv(np.asarray(H))[n - 2:, n - 2:]
    np.testing.assert_allclose(cov, cov_dense, rtol=1e-6, atol=1e-12)


def _random_spd_chain(rng, k, b):
    D = np.zeros((k, b, b))
    E = rng.standard_normal((k, b, b)) * 0.3
    E[-1] = 0.0
    for i in range(k):
        m = rng.standard_normal((b, b))
        D[i] = m @ m.T + (b + 2) * np.eye(b)
    return jnp.asarray(D), jnp.asarray(E)


def test_takahashi_selected_inverse_matches_dense():
    rng = np.random.default_rng(3)
    k, b = 7, 3
    D, E = _random_spd_chain(rng, k, b)
    A = np.zeros((k * b, k * b))
    for i in range(k):
        A[i * b:(i + 1) * b, i * b:(i + 1) * b] = np.asarray(D[i])
        if i + 1 < k:
            A[i * b:(i + 1) * b, (i + 1) * b:(i + 2) * b] = np.asarray(E[i])
            A[(i + 1) * b:(i + 2) * b, i * b:(i + 1) * b] = np.asarray(E[i]).T
    Ainv = np.linalg.inv(A)
    diag, off = blocktri_inverse_blocks(D, E)
    for i in range(k):
        np.testing.assert_allclose(
            np.asarray(diag[i]), Ainv[i * b:(i + 1) * b, i * b:(i + 1) * b],
            rtol=1e-9, atol=1e-12)
        if i + 1 < k:
            np.testing.assert_allclose(
                np.asarray(off[i]),
                Ainv[i * b:(i + 1) * b, (i + 1) * b:(i + 2) * b],
                rtol=1e-9, atol=1e-12)


def test_state_covariance_matches_dense_inverse(setup, solver):
    prob, t_meas, y_clean, u_nodes = setup
    rng = np.random.default_rng(7)
    y = y_clean + NOISE * rng.standard_normal(y_clean.shape)
    data = prob.pack_data(y, t_meas, u_nodes=u_nodes, meas_weight=1 / NOISE)
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.8, 0.8])
    z, _ = solver(z0, data)

    sys = assemble_gn(prob, z, data)
    H, _ = materialize_dense(sys)
    Hinv = np.linalg.inv(np.asarray(H))
    k, bd = sys.num_blocks, sys.block_size

    diag, off, cov_p = state_covariance_blocks(prob, z, data)
    np.testing.assert_allclose(
        np.asarray(cov_p), Hinv[k * bd:, k * bd:], rtol=1e-6, atol=1e-12)
    for i in (0, 1, k // 2, k - 2, k - 1):
        np.testing.assert_allclose(
            np.asarray(diag[i]),
            Hinv[i * bd:(i + 1) * bd, i * bd:(i + 1) * bd],
            rtol=1e-5, atol=1e-12)
    for i in (0, k // 2, k - 2):
        np.testing.assert_allclose(
            np.asarray(off[i]),
            Hinv[i * bd:(i + 1) * bd, (i + 1) * bd:(i + 2) * bd],
            rtol=1e-5, atol=1e-12)

    # Node-level extraction: node m lives at flat offset m*nv in the
    # block-stacked ordering (d nodes per block).
    nv = prob.nv
    nodes = np.asarray(state_covariance_nodes(prob, z, data))
    stds = np.asarray(state_std(prob, z, data))
    assert nodes.shape == (prob.num_nodes, nv, nv)
    for m in (0, 5, prob.num_nodes - 1):
        sl = slice(m * nv, (m + 1) * nv)
        np.testing.assert_allclose(nodes[m], Hinv[sl, sl],
                                   rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(
        stds, np.sqrt(np.maximum(np.diagonal(nodes, axis1=1, axis2=2), 0)),
        rtol=1e-12)

    # Element-level: element e spans flat rows [e*bd, e*bd + s).
    s = bd + nv
    ecov = np.asarray(element_covariance(prob, z, data))
    for e in (0, 3, prob.mesh.num_elements - 1):
        sl = slice(e * bd, e * bd + s)
        np.testing.assert_allclose(ecov[e], Hinv[sl, sl],
                                   rtol=1e-5, atol=1e-12)

    # Interpolated band: at node times it reduces to the node std; at
    # off-node times it matches the dense quadratic form r^T Cov r.
    node_t = np.asarray(prob.mesh.node_times)
    ts_mid = 0.5 * (node_t[:-1] + node_t[1:])[:7]
    tstd_nodes = np.asarray(trajectory_std(prob, z, data, node_t[:9]))
    np.testing.assert_allclose(tstd_nodes, stds[:9], rtol=1e-8, atol=1e-12)
    tstd_mid = np.asarray(trajectory_std(prob, z, data, ts_mid))
    e_idx, rows = prob.mesh.interp_rows(ts_mid)
    d = prob.mesh.degree
    for t in range(ts_mid.size):
        e = int(e_idx[t])
        sl = slice(e * bd, e * bd + s)
        Ce = Hinv[sl, sl].reshape(d + 1, nv, d + 1, nv)
        for a in range(nv):
            var = rows[t] @ Ce[:, a, :, a] @ rows[t]
            np.testing.assert_allclose(tstd_mid[t, a], np.sqrt(max(var, 0)),
                                       rtol=1e-6)


def test_state_std_calibrated(setup, solver):
    # The reported pointwise band must cover the actual node errors at a
    # plausible rate: z-scores (x_hat - x_true)/std should be ~N(0,1) —
    # check the RMS z-score is O(1) (loose MC bar, single realization).
    prob, t_meas, y_clean, u_nodes = setup
    rng = np.random.default_rng(21)
    y = y_clean + NOISE * rng.standard_normal(y_clean.shape)
    data = prob.pack_data(y, t_meas, u_nodes=u_nodes, meas_weight=1 / NOISE)
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.8, 0.8])
    z, _ = solver(z0, data)

    model = VanDerPol()
    ts = np.linspace(0.0, TF, 8001)
    xs = rk4_trajectory(
        model.f, jnp.asarray([1.0, 0.0]), ts,
        u_fn=lambda t: jnp.stack([jnp.sin(0.9 * t)]),
        p=jnp.asarray([MU, B]),
    )
    node_t = np.asarray(prob.mesh.node_times)
    x_true = np.stack(
        [np.interp(node_t, ts, np.asarray(xs[:, i])) for i in range(2)], -1)
    err = np.asarray(z.V[:, :2]) - x_true
    std = np.asarray(state_std(prob, z, data))[:, :2]
    zscores = err / np.maximum(std, 1e-12)
    rms = np.sqrt(np.mean(zscores**2))
    assert 0.2 < rms < 3.0, rms


def test_std_errors_calibrated(setup, solver):
    # Repeat the estimation over independent noise draws: the empirical
    # spread of the estimates must match the reported standard errors
    # within Monte-Carlo tolerance.
    prob, t_meas, y_clean, u_nodes = setup
    rng = np.random.default_rng(1)
    solve = solver
    estimates, stds = [], None
    for trial in range(12):
        y = y_clean + NOISE * rng.standard_normal(y_clean.shape)
        data = prob.pack_data(
            y, t_meas, u_nodes=u_nodes, meas_weight=1 / NOISE
        )
        z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.8, 0.8])
        z, stats = solve(z0, data)
        estimates.append(np.asarray(z.p))
        if stds is None:
            stds = np.asarray(parameter_std(prob, z, data))
    emp = np.std(np.asarray(estimates), axis=0, ddof=1)
    # 12 samples -> loose factor-2.5 agreement is the honest bar.
    ratio = emp / stds
    assert np.all(ratio > 0.4) and np.all(ratio < 2.5), (emp, stds)
