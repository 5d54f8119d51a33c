"""Headline benchmark: full Newton estimation on a 10k-element VdP mesh.

BASELINE.json north_star: "full Newton estimation on a 10k-element mesh in
< 1 s on a single chip".  Work is fixed (15 LM iterations, no early exit) to
match baseline_cpu/run_baseline.py, which measured the scipy/SuperLU CPU
reference on this machine; ``vs_baseline`` = CPU reference wall / this wall.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "s", "vs_baseline": ...}

Runs on the default platform (the real TPU chip when present; first compile
20-40 s, excluded from timing).  float32 on device — the 1e-9 f64 parity
criterion is covered separately by tests/test_baseline_parity.py on CPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ITERS = 15
ELEMENTS = int(os.environ.get("BENCH_ELEMENTS", "10000"))


def run(elements):
    import jax
    import jax.numpy as jnp

    from collocfem_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # skip the ~2 min recompile on repeat runs

    from baseline_cpu.run_baseline import build_headline_problem
    from collocfem_tpu.models import VanDerPol
    from collocfem_tpu.problem import EstimationProblem
    from collocfem_tpu.solve import SolverOptions
    from collocfem_tpu.solve.newton import make_gn_solver

    mesh, t_meas, y, u_nodes = build_headline_problem(elements)
    prob = EstimationProblem.build(
        VanDerPol(), mesh, t_meas, defect_weight=100.0
    )
    data = prob.pack_data(y, t_meas, u_nodes=u_nodes)
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.5, 0.5])

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
        lam0=3e-6,
    )
    solve = make_gn_solver(prob, opts)

    t0 = time.perf_counter()
    z, stats = solve(z0, data)          # compile + warmup
    jax.block_until_ready((z, stats))
    float(np.asarray(stats.cost))
    print(f"compile+first-run: {time.perf_counter() - t0:.1f} s",
          file=sys.stderr)

    # Each rep ends with a scalar device->host fetch: through the tunneled
    # device, block_until_ready was observed returning early while the chip
    # was wedging, which silently reports ~0 s walls. A d2h read cannot
    # complete before the computation has; its ~30 ms RPC latency is
    # included (slightly pessimistic, but trustworthy).
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        z, stats = solve(z0, data)
        jax.block_until_ready((z, stats))
        float(np.asarray(stats.cost))
        times.append(time.perf_counter() - t0)
    wall = min(times)

    # Sanity: the fixed-work run must do real optimization work (finite
    # state, cost down >10x from the initial guess).  15 cold iterations
    # do NOT pin the weakly-identified parameters on this landscape —
    # converged estimates are the multilevel ladder's job
    # (refine.estimate_multilevel: p accurate to ~6e-6 at N=10k).
    p = np.asarray(z.p)
    c0 = float(np.asarray(prob.cost(z0, data)))
    cN = float(np.asarray(stats.cost))
    sane = bool(np.all(np.isfinite(p))) and cN < 0.1 * c0
    print(f"final p={p} cost {c0:.3e} -> {cN:.3e}", file=sys.stderr)
    if not sane:
        print("WARNING: benchmark solve did no useful work", file=sys.stderr)

    base_path = os.path.join(os.path.dirname(__file__), "baseline_cpu",
                             "results.json")
    vs = None
    if os.path.exists(base_path):
        with open(base_path) as fh:
            ref = json.load(fh)
        if ref.get("config", {}).get("elements") == elements:
            vs = ref["newton_wall_s"] / wall
    if vs is None:
        vs = 1.0 / wall  # north-star target: < 1 s

    print(json.dumps({
        "metric": f"vdp_newton{ITERS}_{elements}elem_wall",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(vs, 2),
    }))


def main():
    # The tunneled dev TPU occasionally faults (UNAVAILABLE); retry once,
    # then fall back to a smaller mesh rather than report nothing.
    attempts = [ELEMENTS, ELEMENTS, max(ELEMENTS // 10, 100)]
    for i, n in enumerate(attempts):
        try:
            run(n)
            return
        except Exception as e:  # jax.errors.JaxRuntimeError and kin
            print(f"bench attempt {i} (N={n}) failed: {e}", file=sys.stderr)
    raise SystemExit(1)


if __name__ == "__main__":
    main()
