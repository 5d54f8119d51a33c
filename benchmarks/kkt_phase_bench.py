"""Breakdown of solve_kkt_soa at the headline shape: equilibration vs
SPIKE apply (pad/relay prologue + kernel) vs Schur glue.

Methodology as in phase_bench.py: each timed unit is a jitted fori_loop of
``inner`` data-dependent repetitions bounded by one scalar fetch.

Usage: python benchmarks/kkt_phase_bench.py [--elements 10000] [--inner 20]
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=10000)
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from collocfem_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from baseline_cpu.run_baseline import build_headline_problem
    from collocfem_tpu.models import VanDerPol
    from collocfem_tpu.ops.assemble import assemble_gn_soa
    from collocfem_tpu.ops.spike_pallas import blocktri_solve_spike_fused
    from collocfem_tpu.problem import Decision, EstimationProblem
    from collocfem_tpu.solve.kkt import _equilibrate_soa, solve_kkt_soa

    mesh, t_meas, y, u_nodes = build_headline_problem(args.elements)
    prob = EstimationProblem.build(VanDerPol(), mesh, t_meas,
                                   defect_weight=100.0)
    data = prob.pack_data(y, t_meas, u_nodes=u_nodes)
    z0 = prob.initial_guess_from_data(t_meas, y, p0=[0.5, 0.5])
    z0 = Decision(V=jnp.asarray(z0.V), p=jnp.asarray(z0.p))
    lam = jnp.asarray(3e-6, z0.V.dtype)

    sys0 = jax.jit(lambda z: assemble_gn_soa(prob, z, data))(z0)
    jax.block_until_ready(sys0)
    s0, _, _ = jax.jit(lambda s: _equilibrate_soa(s, lam))(sys0)
    jax.block_until_ready(s0)
    nq = sys0.C.shape[0]
    rhs0 = jnp.concatenate([s0.gx[:, None, :], s0.B], axis=1)

    inner = args.inner

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
            walls.append((time.perf_counter() - t0) / inner)
        print(f"{name:>34}: {1e3 * min(walls):8.3f} ms/iter")
        return min(walls)

    def equil_loop(sys):
        def body(i, acc):
            s, inv, _ = _equilibrate_soa(
                sys._replace(gx=sys.gx * (1.0 + 1e-30 * acc)), lam)
            return jnp.max(jnp.abs(s.gx)) + jnp.max(inv) * 1e-30
        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), lam.dtype))

    def spike_loop(D, E, G):
        def body(i, acc):
            x = blocktri_solve_spike_fused(D, E, G * (1.0 + 1e-30 * acc))
            return jnp.max(jnp.abs(x))
        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), lam.dtype))

    def spike1_loop(D, E, g):
        G = g[:, None, :]
        def body(i, acc):
            x = blocktri_solve_spike_fused(D, E, G * (1.0 + 1e-30 * acc))
            return jnp.max(jnp.abs(x))
        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), lam.dtype))

    def full_loop(sys):
        def body(i, acc):
            dx, dp = solve_kkt_soa(
                sys._replace(gx=sys.gx * (1.0 + 1e-30 * acc)), lam, 0,
                spike=True)
            return jnp.max(jnp.abs(dx)) + jnp.max(jnp.abs(dp)) * 1e-30
        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), lam.dtype))

    t_e = timed("equilibrate_soa", equil_loop, sys0)
    t_s3 = timed(f"spike fused ({1 + nq} rhs)", spike_loop, s0.D, s0.E, rhs0)
    t_s1 = timed("spike fused (1 rhs)", spike1_loop, s0.D, s0.E, s0.gx)
    t_f = timed("solve_kkt_soa spike (full)", full_loop, sys0)
    print(f"{'residual (schur glue)':>34}: "
          f"{1e3 * (t_f - t_e - t_s3):8.3f} ms/iter")


if __name__ == "__main__":
    main()
