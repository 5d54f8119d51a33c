"""HBM-traffic (roofline) accounting for the headline N=10k LM iteration.

Round-2 verdict item 7: BASELINE.md called the chain solve "launch-bound /
bandwidth-trivial" without a bytes-touched model to show whether the 0.1 s
headline is near the v5e HBM roofline or 10x off it.  This script states
that model and measures against it:

  * an analytic minimum-traffic model per phase — every HBM array each
    phase must READ once plus every array it must WRITE once (compulsory
    traffic; XLA fusion can't do better, re-materialization does worse);
  * measured per-phase walls (fori_loop of data-dependent repetitions
    bounded by one scalar fetch — per-call timing lies through the
    tunneled device).  METHODOLOGY NOTE (round 5): the round-4 numbers
    from this script were invalid twice over — the loop bodies used a
    ``0e0 * acc`` coupling that XLA hoisted (the loop measured nothing)
    and inner=20 divided the ~50 ms per-call dispatch/RPC overhead into
    every phase.  Bodies now carry a real 1e-30 data dependence,
    inner defaults to 400, and the full-iteration row is DIFFERENTIAL
    ((wall60 - wall15)/45 of the actual solver), which cancels the
    per-call overhead exactly;
  * achieved GB/s = model bytes / measured wall, reported as a fraction of
    the chip's HBM peak (v5e: 819 GB/s; override with --hbm-peak).

Interpretation: a phase far below peak at these sizes is bound by kernel
ISSUE/latency (many small ops over a K~10^4-lane chain), not bandwidth —
the quantitative form of the earlier "launch-bound" claim.

Usage: python benchmarks/roofline.py [--elements 10000] [--inner 20]
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np

V5E_HBM_PEAK_GBS = 819.0  # per chip, f32-agnostic


def nbytes(*arrs):
    return sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in arrs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=10000)
    ap.add_argument("--inner", type=int, default=400)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hbm-peak", type=float, default=V5E_HBM_PEAK_GBS)
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

    sys0, _ = assemble_gn_soa(prob, z0, data, with_cost=True)
    ed = prob._elem_data(data)

    # ---- analytic compulsory-traffic model (bytes per execution) --------
    sys_bytes = nbytes(sys0.D, sys0.E, sys0.B, sys0.gx)  # C/gp are tiny
    # Assembly: reads the iterate + per-element data tables, writes the
    # system.  The per-element Jacobian intermediates are fusion-resident
    # (never round-trip HBM in the measured XLA schedule at this size) —
    # if XLA did materialize them the model would UNDERcount, which only
    # strengthens a below-roofline conclusion.
    asm_bytes = (
        nbytes(z0.V)
        + sum(nbytes(np.asarray(leaf)) for leaf in ed)
        + nbytes(data.y, data.u)
        + sys_bytes
    )
    # KKT solve (fused one-kernel path): the relay layout pass reads the
    # raw chain + RHS + scale vector and writes the padded relayed copies;
    # the kernel reads those once and writes the 1-col solution; the tiny
    # Schur/unscale tails are lane-resident.
    rhs_bytes = nbytes(sys0.gx) + nbytes(sys0.B)
    inv_bytes = nbytes(sys0.gx)
    kkt_bytes = (
        2 * (sys_bytes + rhs_bytes + inv_bytes)   # relay read+write
        + (sys_bytes + rhs_bytes + inv_bytes)     # kernel reads
        + nbytes(sys0.gx)                         # dx write
    )
    # Iterate update + accept bookkeeping: read step + V, write V.
    upd_bytes = 3 * nbytes(z0.V)

    # ---- measured phase walls -------------------------------------------
    inner = args.inner

    def timed(name, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        jax.block_until_ready(out)
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = f(*xs)
            jax.block_until_ready(out)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            walls.append((time.perf_counter() - t0) / inner)
        return min(walls)

    def assemble_loop(V, p):
        def body(i, acc):
            s, ct = assemble_gn_soa(
                prob, Decision(V=V * (1.0 + 1e-30 * acc), p=p), data,
                with_cost=True
            )
            return acc + s.gx[0, 0] + ct.hi * 1e-30

        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), V.dtype))

    def kkt_loop(_):
        def body(i, acc):
            s = sys0._replace(D=sys0.D * (1.0 + 1e-30 * acc))
            dx, dp = solve_kkt_soa(s, lam, 0,
                                   spike=jax.default_backend() == "tpu")
            return acc + dx[0, 0] + dp[0] * 1e-30

        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), sys0.D.dtype))

    t_asm = timed("assembly", assemble_loop, z0.V, z0.p)
    t_kkt = timed("kkt", kkt_loop, jnp.zeros(()))

    # Differential full-iteration wall from the ACTUAL solver: cancels the
    # per-call dispatch overhead that polluted per-call timings.
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

    t_iter = (lm_wall(60) - lm_wall(15)) / 45.0

    peak = args.hbm_peak
    print(f"N={args.elements} headline iteration, "
          f"backend={jax.default_backend()}, dtype={sys0.D.dtype}")
    print(f"{'phase':>10} {'model MB':>10} {'wall ms':>9} "
          f"{'GB/s':>8} {'% peak':>7}")
    total_b = asm_bytes + kkt_bytes + upd_bytes
    for name, b, t in [("assembly", asm_bytes, t_asm),
                       ("kkt solve", kkt_bytes, t_kkt),
                       ("iteration", total_b, t_iter)]:
        gbs = b / t / 1e9
        print(f"{name:>10} {b / 1e6:>10.2f} {1e3 * t:>9.3f} "
              f"{gbs:>8.1f} {100 * gbs / peak:>6.1f}%")
    print(f"\nHBM peak assumed: {peak:.0f} GB/s. Phases far below peak are "
          "bound by kernel issue/latency, not bandwidth.")


if __name__ == "__main__":
    main()
