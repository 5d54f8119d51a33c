"""Bisect TPU compile time of the Newton-solve pipeline stage by stage.

Usage: python benchmarks/compile_bisect.py [--elements 1000]
Times jit lower+compile for: residuals, GN assembly, KKT solve, one full LM
iteration, and the complete while_loop solve.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=1000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from baseline_cpu.run_baseline import build_headline_problem
    from collocfem_tpu.models import VanDerPol
    from collocfem_tpu.ops.assemble import assemble_gn, blocks_to_nodes
    from collocfem_tpu.problem import Decision, EstimationProblem
    from collocfem_tpu.solve import SolverOptions
    from collocfem_tpu.solve.kkt import solve_kkt
    from collocfem_tpu.solve.newton import make_gn_solver

    print("backend:", jax.default_backend())
    mesh, t_meas, y, u_nodes = build_headline_problem(args.elements)
    prob = EstimationProblem.build(
        VanDerPol(), mesh, t_meas, defect_weight=100.0
    )
    data = prob.pack_data(y, t_meas, u_nodes=u_nodes)
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.5, 0.5])

    def timed_compile(name, fn, *fargs):
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*fargs)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        out = compiled(*fargs)
        jax.block_until_ready(out)
        t3 = time.perf_counter()
        print(f"{name:>22}: trace/lower {t1-t0:7.2f}s  compile {t2-t1:7.2f}s"
              f"  run {t3-t2:7.3f}s")
        return out

    timed_compile("residual_vector", prob.residual_vector, z0, data)
    sys_ = timed_compile(
        "assemble_gn", lambda z, d: assemble_gn(prob, z, d), z0, data
    )
    lam = jnp.asarray(1e-3, prob.dtype)
    timed_compile("solve_kkt(cr)", lambda s: solve_kkt(s, lam, "cr"), sys_)

    def one_iter(z, d):
        s = assemble_gn(prob, z, d)
        dx, dp = solve_kkt(s, lam, "cr")
        dV = blocks_to_nodes(dx, prob.num_nodes, prob.nv)
        z2 = Decision(V=z.V + dV, p=z.p + dp)
        return z2, prob.cost(z2, d)

    timed_compile("one LM iteration", one_iter, z0, data)

    solve = make_gn_solver(
        prob, SolverOptions(maxiter=15, gtol=0.0, ftol=0.0, xtol=0.0)
    )
    t0 = time.perf_counter()
    out = solve(z0, data)
    jax.block_until_ready(out)
    print(f"{'full solve (15 it)':>22}: compile+run {time.perf_counter()-t0:7.2f}s")
    t0 = time.perf_counter()
    out = solve(z0, data)
    jax.block_until_ready(out)
    print(f"{'full solve (cached)':>22}: run {time.perf_counter()-t0:7.3f}s"
          f"  p={out[0].p}")


if __name__ == "__main__":
    main()
