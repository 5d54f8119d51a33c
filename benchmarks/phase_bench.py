"""Per-phase breakdown of one Gauss-Newton iteration at the headline shape.

Times the three phases of the N=10k VdP LM iteration separately —
SoA assembly (residual + jacfwd + normal-equation einsums + scatter),
the damped KKT solve (equilibrate + CR factor/apply + Schur), and the
double-word cost evaluation — to locate remaining optimization headroom.
Methodology as in blocktri_bench.py: each timed unit is a jitted
``fori_loop`` of ``inner`` data-dependent repetitions bounded by one
scalar fetch (naive per-call timing lies through the tunneled device).
``inner`` must be LARGE (default 200): the per-call dispatch/RPC overhead
through the tunnel is ~50 ms — at inner=20 every "phase" measures
~2.5 ms of pure overhead regardless of content (the round-4 numbers did
exactly that); at inner=200 the floor is ~0.25 ms and real phase costs
(0.3-2 ms) dominate.  The FULL-iteration number at the bottom is
differential ((wall60-wall15)/45) and overhead-free.

Usage: python benchmarks/phase_bench.py [--elements 10000] [--inner 20]
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=10000)
    ap.add_argument("--inner", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from collocfem_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from baseline_cpu.run_baseline import build_headline_problem
    from collocfem_tpu.models import VanDerPol
    from collocfem_tpu.ops.assemble import assemble_gn_soa
    from collocfem_tpu.problem import Decision, EstimationProblem
    from collocfem_tpu.solve.kkt import solve_kkt_soa

    mesh, t_meas, y, u_nodes = build_headline_problem(args.elements)
    prob = EstimationProblem.build(VanDerPol(), mesh, t_meas,
                                   defect_weight=100.0)
    data = prob.pack_data(y, t_meas, u_nodes=u_nodes)
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.5, 0.5])
    z0 = Decision(V=jnp.asarray(z0.V), p=jnp.asarray(z0.p))
    lam = jnp.asarray(3e-6, z0.V.dtype)

    def timed(name, fn, *xs):
        jfn = jax.jit(fn)
        out = jfn(*xs)
        jax.block_until_ready(out)
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = jfn(*xs)
            jax.block_until_ready(out)
            float(np.asarray(out))
            walls.append((time.perf_counter() - t0) / args.inner)
        print(f"{name:>28}: {1e3 * min(walls):8.3f} ms/iter")
        return min(walls)

    inner = args.inner

    def assemble_loop(V, p):
        def body(i, acc):
            sys = assemble_gn_soa(prob, Decision(V=V + 1e-30 * acc, p=p),
                                  data)
            return jnp.max(jnp.abs(sys.gx))
        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), V.dtype))

    sys0 = jax.jit(lambda z: assemble_gn_soa(prob, z, data))(z0)
    jax.block_until_ready(sys0)

    def kkt_loop(sys):
        def body(i, acc):
            dx, dp = solve_kkt_soa(
                sys._replace(gx=sys.gx * (1.0 + 1e-30 * acc)), lam, 0)
            return jnp.max(jnp.abs(dx))
        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), lam.dtype))

    def cost_loop(V, p):
        def body(i, acc):
            c = prob.cost_dw(Decision(V=V + 1e-30 * acc, p=p), data)
            return c.hi * 1e-30
        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), V.dtype))

    def assemble_cost_loop(V, p):
        def body(i, acc):
            sys, c = assemble_gn_soa(
                prob, Decision(V=V + 1e-30 * acc, p=p), data, with_cost=True)
            return jnp.max(jnp.abs(sys.gx)) + 1e-30 * c.hi
        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), V.dtype))

    def select_loop(V, p):
        sys, c = assemble_gn_soa(prob, Decision(V=V, p=p), data,
                                 with_cost=True)

        def body(i, st):
            sys_a, t = st
            acc = t > 0
            sys_b = jax.tree_util.tree_map(
                lambda a, b: jnp.where(acc, a, b), sys, sys_a)
            return sys_b, jnp.max(jnp.abs(sys_b.gx)) * 1e-30
        out = jax.lax.fori_loop(0, inner, body, (sys, jnp.zeros((), V.dtype)))
        return out[1]

    # --- sub-phases of solve_kkt_soa (round-5: locate the glue) ----------
    from collocfem_tpu.solve.kkt import _equilibrate_soa
    from collocfem_tpu.ops.spike_pallas import blocktri_solve_spike_fused

    def equil_loop(sys):
        def body(i, acc):
            s, inv, inv_sp, dmax = _equilibrate_soa(
                sys._replace(gx=sys.gx * (1.0 + 1e-30 * acc)), lam)
            return jnp.max(jnp.abs(s.gx))
        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), lam.dtype))

    s0 = jax.jit(lambda s: _equilibrate_soa(s, lam))(sys0)[0]
    jax.block_until_ready(s0)
    rhs0 = jnp.concatenate([s0.gx[:, None, :], s0.B], axis=1)

    def spike_loop(D, E, G):
        def body(i, acc):
            x = blocktri_solve_spike_fused(
                D, E, G * (1.0 + 1e-30 * acc))
            return jnp.max(jnp.abs(x))
        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), lam.dtype))

    # --- LM-body glue beyond (ac + k + s) --------------------------------
    from collocfem_tpu.solve.lm_core import fused_quadforms

    def quad_loop(sys):
        def body(i, acc):
            g, s2 = fused_quadforms(
                sys.gx.ravel() * (1.0 + 1e-30 * acc), sys.gp,
                sys.gx.ravel(), sys.gp)
            return g * 1e-30 + s2 * 1e-30
        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), lam.dtype))

    # --- the REAL full iteration: fixed-work solver / maxiter ------------
    from collocfem_tpu.solve import SolverOptions
    from collocfem_tpu.solve.newton import make_gn_solver

    def lm_wall(iters):
        solve_fn = make_gn_solver(prob, SolverOptions(
            maxiter=iters, gtol=0.0, ftol=0.0, xtol=0.0, kkt_refine=0,
            lam0=3e-6, lam_max=1e30))
        z1, st1 = solve_fn(z0, data)
        jax.block_until_ready((z1, st1))
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            z, st = solve_fn(z0, data)
            jax.block_until_ready((z, st))
            float(np.asarray(st.cost))
            walls.append(time.perf_counter() - t0)
        return min(walls)

    def full_wall():
        """Differential per-iteration cost: (wall60 - wall15)/45 cancels
        the fixed per-call dispatch/RPC overhead (~50 ms through the
        tunnel — measured LARGER than the entire 15-iteration compute,
        which the round-4 phase methodology at inner=20 silently divided
        into every phase)."""
        w15, w60 = lm_wall(15), lm_wall(60)
        per_it = (w60 - w15) / 45.0
        overhead = w15 - 15 * per_it
        print(f"{'FULL LM wall (15 its)':>28}: {1e3 * w15:8.3f} ms")
        print(f"{'FULL LM wall (60 its)':>28}: {1e3 * w60:8.3f} ms")
        print(f"{'per-iteration (differential)':>28}: "
              f"{1e3 * per_it:8.3f} ms/iter")
        print(f"{'per-call overhead (implied)':>28}: "
              f"{1e3 * overhead:8.3f} ms")
        return per_it

    t_a = timed("assemble_gn_soa", assemble_loop, z0.V, z0.p)
    t_ac = timed("assemble + dw cost", assemble_cost_loop, z0.V, z0.p)
    t_k = timed("solve_kkt_soa (lam fixed)", kkt_loop, sys0)
    t_eq = timed("  equilibrate_soa only", equil_loop, sys0)
    t_sp = timed("  spike kernel (pre-scaled)", spike_loop, s0.D, s0.E, rhs0)
    t_c = timed("cost_dw", cost_loop, z0.V, z0.p)
    t_s = timed("sys where-select", select_loop, z0.V, z0.p)
    t_q = timed("fused_quadforms", quad_loop, sys0)
    t_f = full_wall()
    print(f"{'old loop (a+k+c)':>28}: {1e3 * (t_a + t_k + t_c):8.3f} ms/iter")
    print(f"{'new loop (ac+k+s)':>28}: {1e3 * (t_ac + t_k + t_s):8.3f} ms/iter")
    print(f"{'in-loop glue (diff - acks)':>28}: "
          f"{1e3 * (t_f - t_ac - t_k - t_s):8.3f} ms/iter")


if __name__ == "__main__":
    main()
