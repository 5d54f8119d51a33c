"""Headline benchmark: full Newton estimation on a 10k-element VdP mesh.

BASELINE.json north_star: "full Newton estimation on a 10k-element mesh in
< 1 s on a single chip".  TWO measurements, one JSON line:

  * fixed-work (the cross-round ``metric``/``value``): exactly 15 LM
    iterations, matched to baseline_cpu/run_baseline.py's fixed-work run;
    ``vs_baseline`` = CPU wall / TPU wall.
  * converged (``converged_*`` keys): TIME-TO-SOLUTION — the multilevel
    ladder (625 -> 2500 -> 10000 elements, warm-started nested iteration,
    refine.estimate_multilevel's schedule with each level's solver built
    and compiled up front) from the cold initial guess until the recovered
    parameters satisfy ‖p − p_true‖∞ < 1e-4; ``converged_vs_baseline`` =
    CPU converged wall / TPU converged wall.  This is the north_star's
    actual sentence — "estimation" means an answer, not 15 iterations.

Runs on the default platform (the real TPU chip when present; first compile
20-40 s per level, excluded from timing).  float32 on device — the 1e-9 f64
parity criterion is covered separately by tests/test_baseline_parity.py on
CPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ITERS = 15
ELEMENTS = int(os.environ.get("BENCH_ELEMENTS", "10000"))
P_TRUE = np.array([1.0, 1.0])


def _setup(elements):
    from baseline_cpu.run_baseline import build_headline_problem
    from collocfem_tpu.models import VanDerPol
    from collocfem_tpu.problem import EstimationProblem

    mesh, t_meas, y, u_nodes = build_headline_problem(elements)
    prob = EstimationProblem.build(
        VanDerPol(), mesh, t_meas, defect_weight=100.0
    )
    data = prob.pack_data(y, t_meas, u_nodes=u_nodes)
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.5, 0.5])
    return prob, z0, data, (t_meas, y)


def _timed_reps(fn, reps=3):
    """Best-of-reps wall.  Each rep ends with a scalar device->host fetch:
    through the tunneled device, block_until_ready was observed returning
    early while the chip was wedging, silently reporting ~0 s walls; a d2h
    read cannot complete before the computation has (its ~30 ms RPC
    latency is included — slightly pessimistic, but trustworthy)."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def run_fixed(elements):
    import jax

    from collocfem_tpu.problem import Decision  # noqa: F401 (warm import)
    from collocfem_tpu.solve import SolverOptions
    from collocfem_tpu.solve.newton import make_gn_solver

    prob, z0, data, _ = _setup(elements)

    # Fixed work: exactly ITERS LM iterations (no early-exit tolerances).
    # kkt_refine=0 matches the CPU baseline's work per iteration (it does
    # plain LM steps); one refinement pass costs ~70% extra wall and is a
    # quality knob, not part of the measured contract.  The gain-ratio LM
    # (solve.newton) rejects any degraded steps, so refine=0 is safe.
    # lam0=3e-6 (dimensionless, see solve.kkt): starts at the productive
    # damping level for this mesh so the fixed-work run spends its budget
    # on accepted steps instead of climbing lam.
    opts = SolverOptions(
        maxiter=ITERS, gtol=0.0, ftol=0.0, xtol=0.0, kkt_refine=0,
        lam0=3e-6, lam_max=1e30,  # lam rail disabled: fixed work means fixed
    )
    solve = make_gn_solver(prob, opts)

    t0 = time.perf_counter()
    z, stats = solve(z0, data)          # compile + warmup
    jax.block_until_ready((z, stats))
    float(np.asarray(stats.cost))
    print(f"compile+first-run: {time.perf_counter() - t0:.1f} s",
          file=sys.stderr)

    def rep():
        z, stats = solve(z0, data)
        jax.block_until_ready((z, stats))
        float(np.asarray(stats.cost))

    wall = _timed_reps(rep)

    # Sanity: the fixed-work run must do real optimization work (finite
    # state, cost down >10x from the initial guess).  15 cold iterations
    # do NOT pin the weakly-identified parameters on this landscape —
    # converged estimates are the ladder's job (the converged_* keys).
    z, stats = solve(z0, data)
    p = np.asarray(z.p)
    c0 = float(np.asarray(prob.cost(z0, data)))
    cN = float(np.asarray(stats.cost))
    sane = bool(np.all(np.isfinite(p))) and cN < 0.1 * c0
    print(f"final p={p} cost {c0:.3e} -> {cN:.3e}", file=sys.stderr)
    if not sane:
        print("WARNING: benchmark solve did no useful work", file=sys.stderr)
    return wall


def run_converged(elements, coarsen=4, levels=3):
    """Time-to-solution: the warm-started multilevel ladder, compile
    excluded (every level's solver is built and warmed before timing).

    The single-shot f32 solve is conditioning-limited at K ~ 10^4
    (cond ~ K², past the f32 Cholesky cliff); nested iteration converges
    each mesh and prolongs (BASELINE.md "Converged solutions...").  The
    inter-level prolongation is a jitted DEVICE op with static gather
    tables (ops.mesh.make_prolongation) — no host interpolation or
    d2h/h2d round-trips inside the timed region.
    """
    import jax
    import jax.numpy as jnp

    from collocfem_tpu.models import VanDerPol
    from collocfem_tpu.ops.mesh import make_prolongation, uniform_mesh
    from collocfem_tpu.problem import Decision, EstimationProblem
    from collocfem_tpu.solve import SolverOptions
    from collocfem_tpu.solve.newton import make_gn_solver

    from baseline_cpu.run_baseline import TF, build_headline_problem

    _, t_meas, y, _ = build_headline_problem(elements)
    from collocfem_tpu.refine import CR_DW_CHAIN

    if elements + 1 > CR_DW_CHAIN:
        # Past the f32 STATE-STORAGE cliff every plain-f32 level converges
        # to a stationary point of its own noise landscape (measured at
        # N=100k: coarse/mid levels all stall at p-err ~4.9e-4, and an
        # f64 oracle at the stalled point takes exactly the missing step).
        # Schedule: cold f32 coarse -> SAME-mesh double-word-state polish
        # (cleans the landscape; p-err 4.96e-4 -> 7.7e-7 measured) ->
        # fine level on the full DW tier (state_dw + cr_dw steps + DW
        # arrowhead reductions).  Measured at N=100k: p-err 7.2e-7.
        nc = max(2, elements // 16)
        schedule = [
            (nc, SolverOptions(maxiter=60, gtol=0.0, lam0=3e-6)),
            (nc, SolverOptions(maxiter=80, gtol=0.0, lam0=1e-9,
                               state_dw=True)),
            (elements, SolverOptions(maxiter=40, gtol=0.0, lam0=1e-9,
                                     method="cr_dw", state_dw=True)),
        ]
    else:
        ns = [max(2, int(np.ceil(elements / coarsen ** (levels - 1 - i))))
              for i in range(levels)]
        ns[-1] = elements
        # Cold coarse level starts at the productive damping; warm levels
        # start in the quadratic basin (lam ~ 0).  Termination: λ-railed
        # exit at the f32 progress floor (no tolerance tuning).
        schedule = [
            (n, SolverOptions(maxiter=60 if i == 0 else 30, gtol=0.0,
                              lam0=3e-6 if i == 0 else 1e-9))
            for i, n in enumerate(ns)
        ]

    lvls = []
    prev_mesh = None
    for n, opts in schedule:
        mesh = uniform_mesh(0.0, TF, n, 4)
        prob = EstimationProblem.build(
            VanDerPol(), mesh, t_meas, defect_weight=100.0
        )
        u_nodes = np.sin(0.9 * mesh.elem_times)[..., None]
        data = prob.pack_data(y, t_meas, u_nodes=u_nodes)
        prolong = (
            None if (prev_mesh is None
                     or prev_mesh.num_elements == mesh.num_elements)
            else jax.jit(make_prolongation(prev_mesh, mesh.node_times))
        )
        lvls.append((prob, data, make_gn_solver(prob, opts), prolong))
        prev_mesh = mesh

    def ladder(timer=None):
        z = None
        for li, (prob, data, solve, prolong) in enumerate(lvls):
            if z is None:
                z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.5, 0.5])
            elif prolong is None:          # same-mesh polish level
                z0 = z
            else:
                z0 = Decision(V=prolong(z.V).astype(prob.dtype), p=z.p)
            z, stats = solve(z0, data)
            if timer is not None:        # per-level phase split (adds syncs)
                jax.block_until_ready(z)
                timer.append(time.perf_counter())
        jax.block_until_ready(z)
        float(np.asarray(stats.cost))   # trustworthy d2h sync (see _timed_reps)
        return z, stats

    t0 = time.perf_counter()
    z, _ = ladder()                      # compile all levels + warm caches
    p = np.asarray(z.p, dtype=np.float64)
    print(f"converged compile+first-run: {time.perf_counter() - t0:.1f} s, "
          f"p={p}", file=sys.stderr)

    wall = _timed_reps(lambda: ladder(), reps=3)
    # Instrumented rep: per-level split (extra syncs -> reported, not timed).
    marks = [time.perf_counter()]
    z, _ = ladder(timer=marks)
    splits = np.diff(np.asarray(marks))
    p = np.asarray(z.p, dtype=np.float64)
    p_err = float(np.max(np.abs(p - P_TRUE)))
    print(f"converged: wall={wall:.4f} s  p={p}  err={p_err:.2e}  "
          f"level-split={np.array2string(splits, precision=4)}",
          file=sys.stderr)
    if p_err >= 1e-4:
        print("WARNING: converged run missed the 1e-4 target",
              file=sys.stderr)
    return wall, p_err


def _baseline_ref(elements):
    base_path = os.path.join(os.path.dirname(__file__), "baseline_cpu",
                             "results.json")
    if os.path.exists(base_path):
        with open(base_path) as fh:
            ref = json.load(fh)
        if ref.get("config", {}).get("elements") == elements:
            return ref
    return None


def run(elements, with_converged=True):
    from collocfem_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # skip the ~2 min recompile on repeat runs

    wall = run_fixed(elements)
    ref = _baseline_ref(elements)
    out = {
        "metric": f"vdp_newton{ITERS}_{elements}elem_wall",
        "value": round(wall, 4),
        "unit": "s",
    }
    if ref is not None:
        out["vs_baseline"] = round(ref["newton_wall_s"] / wall, 2)
    else:
        # No matching CPU baseline measurement for this element count:
        # report progress against the <1 s north-star target under a
        # DISTINCT key so cross-round comparisons never mix semantics.
        out["vs_target"] = round(1.0 / wall, 2)

    if with_converged:
        try:
            cwall, perr = run_converged(elements)
            out["converged_wall_s"] = round(cwall, 4)
            out["converged_p_err"] = float(f"{perr:.3g}")
            if ref is not None and "converged_wall_s" in ref:
                out["converged_vs_baseline"] = round(
                    ref["converged_wall_s"] / cwall, 2
                )
        except Exception as e:  # keep the headline line even if this fails
            print(f"converged bench failed: {e}", file=sys.stderr)
    print(json.dumps(out))


def main():
    with_conv = "--no-converged" not in sys.argv
    # The tunneled dev TPU occasionally faults (UNAVAILABLE); retry once,
    # then fall back to a smaller mesh rather than report nothing.
    attempts = [ELEMENTS, ELEMENTS, max(ELEMENTS // 10, 100)]
    for i, n in enumerate(attempts):
        try:
            run(n, with_converged=with_conv and n == ELEMENTS)
            return
        except Exception as e:  # jax.errors.JaxRuntimeError and kin
            print(f"bench attempt {i} (N={n}) failed: {e}", file=sys.stderr)
    raise SystemExit(1)


if __name__ == "__main__":
    main()
