"""Symbolic model front-end: parity with hand-written models + traceability.

Mirrors the reference lineage's sym2num workflow test surface (SURVEY.md
§2a "Model codegen"): the symbolic definition must produce the same f/h as
the hand-coded JAX model, and its derivatives must come out of jax.jacfwd
identically (no codegen path to diverge).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collocfem_tpu.model_sym import symbolic_model
from collocfem_tpu.models import VanDerPol


def _vdp_sym():
    return symbolic_model(
        name="VanDerPolSym",
        states="x0 x1",
        inputs="u0",
        params="mu b",
        f=["x1", "mu*(1 - x0**2)*x1 - x0 + b*u0"],
        h=["x0"],
    )()


def test_matches_handwritten_vdp():
    sym, ref = _vdp_sym(), VanDerPol()
    assert (sym.nx, sym.nu, sym.nq) == (ref.nx, ref.nu, ref.nq)
    rng = np.random.default_rng(0)
    for _ in range(5):
        x = jnp.asarray(rng.standard_normal(2))
        u = jnp.asarray(rng.standard_normal(1))
        p = jnp.asarray(rng.uniform(0.1, 2.0, 2))
        t = float(rng.uniform(0, 10))
        np.testing.assert_allclose(sym.f(x, u, p, t), ref.f(x, u, p, t),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(sym.h(x, u, p, t), ref.h(x, u, p, t),
                                   rtol=1e-12, atol=1e-12)


def test_jacobians_match_and_trace():
    sym, ref = _vdp_sym(), VanDerPol()
    x = jnp.array([0.3, -1.2])
    u = jnp.array([0.7])
    p = jnp.array([1.0, 1.0])

    jf_sym = jax.jit(jax.jacfwd(lambda x_: sym.f(x_, u, p, 0.0)))
    jf_ref = jax.jacfwd(lambda x_: ref.f(x_, u, p, 0.0))
    np.testing.assert_allclose(jf_sym(x), jf_ref(x), rtol=1e-12, atol=1e-12)

    jp = jax.jacfwd(lambda p_: sym.f(x, u, p_, 0.0))(p)
    np.testing.assert_allclose(jp, jax.jacfwd(
        lambda p_: ref.f(x, u, p_, 0.0))(p), rtol=1e-12, atol=1e-12)


def test_constant_component_and_time():
    m = symbolic_model(
        name="Decay", states="x0", params="k",
        f=["-k*x0 + sin(t)"],
    )()
    out = jax.jit(m.f)(jnp.array([2.0]), jnp.zeros((0,)),
                       jnp.array([0.5]), jnp.asarray(np.pi / 2))
    np.testing.assert_allclose(out, [-1.0 + 1.0], rtol=1e-6)
    # h defaults to full state when not given
    np.testing.assert_allclose(
        m.h(jnp.array([3.0]), jnp.zeros((0,)), jnp.array([0.5]), 0.0), [3.0])


def test_ocp_groups_and_validation():
    m = symbolic_model(
        name="Toy", states="a b", inputs="u0", params=None,
        f=["b", "u0"],
        g=["u0 - 2", "-u0 - 2"],
        g_eq=["a - b"],
        running_cost_residual=["u0"],
        terminal_cost_residual=["a - 1"],
    )()
    x = jnp.array([1.0, 1.0])
    u = jnp.array([3.0])
    p = jnp.zeros((0,))
    assert m.ng == 2 and m.ne == 1
    np.testing.assert_allclose(m.g(x, u, p, 0.0), [1.0, -5.0])
    np.testing.assert_allclose(m.g_eq(x, u, p, 0.0), [0.0])
    np.testing.assert_allclose(m.running_cost_residual(x, u, p, 0.0), [3.0])
    np.testing.assert_allclose(m.terminal_cost_residual(x, p), [0.0])

    with pytest.raises(ValueError, match="undeclared"):
        symbolic_model(name="Bad", states="x0", f=["x0 + y"])
    with pytest.raises(ValueError, match="components"):
        symbolic_model(name="Bad2", states="x0 x1", f=["x0"])
    with pytest.raises(ValueError, match="inputs"):
        symbolic_model(name="Bad3", states="x0", inputs="u0",
                       f=["u0"], terminal_cost_residual=["u0"])


def test_end_to_end_estimation_with_symbolic_model():
    """A symbolic model drives the full GN estimation pipeline unchanged."""
    from collocfem_tpu.ops.mesh import uniform_mesh
    from collocfem_tpu.problem import EstimationProblem
    from collocfem_tpu.solve import SolverOptions
    from collocfem_tpu.solve.newton import make_gn_solver
    from collocfem_tpu.utils.simulate import rk4_trajectory

    model = _vdp_sym()
    tf = 6.0
    mesh = uniform_mesh(0.0, tf, 48, 2)  # degree 2: 3x cheaper compile;
    # the claim is symbolic-model plumbing, not discretization fidelity
    t_meas = np.linspace(0.1, tf - 0.1, 80)
    p_true = jnp.array([1.0, 1.0])

    u_fn = lambda t: jnp.sin(0.9 * t)[None]
    # Integrate on a fine grid, then sample the measured output x0 at t_meas.
    t_fine = np.linspace(0.0, tf, 2001)
    xs = rk4_trajectory(model.f, jnp.array([1.0, 0.0]), t_fine,
                        u_fn=u_fn, p=p_true)
    y = np.interp(t_meas, t_fine, np.asarray(xs[:, 0]))[:, None]
    rng = np.random.default_rng(1)
    y = y + 0.01 * rng.standard_normal(np.shape(y))

    prob = EstimationProblem.build(model, mesh, t_meas, defect_weight=100.0)
    u_nodes = np.sin(0.9 * np.asarray(mesh.elem_times))[..., None]
    data = prob.pack_data(y, t_meas, u_nodes=u_nodes)
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.5, 0.5])

    solve = make_gn_solver(prob, SolverOptions(maxiter=25, gtol=1e-10))
    z, stats = solve(z0, data)
    p = np.asarray(z.p)
    assert np.all(np.isfinite(p))
    np.testing.assert_allclose(p, [1.0, 1.0], atol=0.08)


def test_terminal_cost_rejects_time():
    # 't' has no binding at the terminal instant (Model.terminal_cost_residual
    # has signature (x, p)); it must be rejected, not silently bound to 0.
    with pytest.raises(ValueError, match="'t'"):
        symbolic_model(name="BadT", states="x0",
                       f=["-x0"], terminal_cost_residual=["x0 - t"])
