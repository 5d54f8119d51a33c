"""Assembly-layer consistency: the block-tridiagonal + arrowhead GN system
must equal J^T J / J^T r of the full stacked residual vector computed by
brute-force autodiff (SURVEY.md §4: sparsity-pattern consistency tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from collocfem_tpu.models import VanDerPol
from collocfem_tpu.ops.assemble import (
    assemble_gn,
    blocks_to_nodes,
    materialize_dense,
)
from collocfem_tpu.ops.mesh import uniform_mesh
from collocfem_tpu.problem import Decision, EstimationProblem


def small_problem(seed=0):
    rng = np.random.default_rng(seed)
    model = VanDerPol()
    mesh = uniform_mesh(0.0, 3.0, num_elements=4, degree=3)
    t_meas = np.linspace(0.05, 2.95, 17)
    prob = EstimationProblem.build(model, mesh, t_meas, defect_weight=2.0)
    y = rng.standard_normal((17, 1))
    u = rng.standard_normal((4, 4, 1)) * 0.3
    data = prob.pack_data(
        y, t_meas, u_nodes=u, meas_weight=1.7,
        p_prior=[1.0, 0.5], p_weight=[0.3, 0.8],
        x0_prior=[2.0, 0.0], x0_weight=1.1,
    )
    z = Decision(
        V=jnp.asarray(rng.standard_normal((mesh.num_nodes, 2))),
        p=jnp.asarray([0.9, 0.4]),
    )
    return prob, z, data


def test_gradient_matches_autodiff():
    prob, z, data = small_problem()
    sys = assemble_gn(prob, z, data)
    gV = blocks_to_nodes(sys.gx, prob.num_nodes, prob.nv)
    want_gV, want_gp = jax.grad(lambda v, p: prob.cost(Decision(v, p), data),
                                argnums=(0, 1))(z.V, z.p)
    np.testing.assert_allclose(np.asarray(gV), np.asarray(want_gV),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(sys.gp), np.asarray(want_gp),
                               rtol=1e-9, atol=1e-11)


def test_hessian_matches_jtj():
    prob, z, data = small_problem(1)
    sys = assemble_gn(prob, z, data)
    H, _ = materialize_dense(sys)

    nv, M = prob.nv, prob.num_nodes
    K, bd = sys.D.shape[0], sys.D.shape[1]

    def res_flat(vp):
        V = vp[: M * nv].reshape(M, nv)
        p = vp[M * nv :]
        return prob.residual_vector(Decision(V, p), data)

    vp = jnp.concatenate([z.V.ravel(), z.p])
    J = jax.jacobian(res_flat)(vp)
    JTJ = np.asarray(J.T @ J)

    # Map node-ordered JTJ into padded block order and compare.
    n_pad = K * bd - M * nv
    nq = z.p.shape[0]
    perm = np.concatenate([
        np.arange(M * nv),                      # real node dofs
        np.full(n_pad, -1),                     # pads
        np.arange(M * nv, M * nv + nq),         # params
    ])
    H_np = np.asarray(H)
    want = np.zeros_like(H_np)
    for a, ia in enumerate(perm):
        for b, ib in enumerate(perm):
            if ia >= 0 and ib >= 0:
                want[a, b] = JTJ[ia, ib]
    # Pad diagonal gets the +1 identity.
    for a, ia in enumerate(perm):
        if ia < 0:
            want[a, a] = 1.0
    np.testing.assert_allclose(H_np, want, rtol=1e-8, atol=1e-9)


def test_finite_difference_gradient():
    """Derivative correctness vs central differences (SURVEY.md §4 unit b)."""
    prob, z, data = small_problem(2)
    sys = assemble_gn(prob, z, data)
    gp = np.asarray(sys.gp)
    eps = 1e-6
    for j in range(2):
        dp = np.zeros(2)
        dp[j] = eps
        cp = prob.cost(Decision(z.V, z.p + dp), data)
        cm = prob.cost(Decision(z.V, z.p - dp), data)
        fd = float((cp - cm) / (2 * eps))
        assert abs(fd - gp[j]) < 1e-5 * max(1.0, abs(fd))


def test_soa_assembly_matches_block_major():
    # The SoA hot-path assembly must agree with the block-major reference.
    import jax.numpy as jnp

    from collocfem_tpu.ops.assemble import assemble_gn, assemble_gn_soa

    prob, z, data = small_problem()
    a = assemble_gn(prob, z, data)
    s = assemble_gn_soa(prob, z, data)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(s.D, -1, 0)), np.asarray(a.D), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(s.E, -1, 0)), np.asarray(a.E), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(s.B, -1, 0)), np.asarray(a.B), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(s.gx.T), np.asarray(a.gx), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s.C), np.asarray(a.C), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s.gp), np.asarray(a.gp), atol=1e-12)


def test_solve_kkt_soa_matches_block_major():
    import jax.numpy as jnp

    from collocfem_tpu.ops.assemble import assemble_gn, assemble_gn_soa
    from collocfem_tpu.solve.kkt import solve_kkt, solve_kkt_soa

    prob, z, data = small_problem()
    a = assemble_gn(prob, z, data)
    s = assemble_gn_soa(prob, z, data)
    lam = jnp.asarray(1e-4, prob.dtype)
    dx_a, dp_a = solve_kkt(a, lam, "cr", refine=1)
    dx_s, dp_s = solve_kkt_soa(s, lam, refine=1)
    np.testing.assert_allclose(np.asarray(dx_s.T), np.asarray(dx_a),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dp_s), np.asarray(dp_a),
                               rtol=1e-8, atol=1e-10)
