"""Microbenchmark: block-tridiagonal solver variants on the current backend.

Times one solve of an SPD block-tridiagonal system at the headline shape
(K=16384 blocks of bd=8, nrhs=3 — the VdP 10k-element KKT) for each solver
variant, to locate the Newton-iteration bottleneck.

Measurement methodology (IMPORTANT): through the tunneled dev TPU,
``jax.block_until_ready`` has been observed returning early, and a scalar
device->host fetch costs ~30 ms of RPC — both of which make naive per-call
timing of millisecond-scale solves meaningless (an early version of this
file reported 0.045 ms for ``cr``, off by ~50x; retracted in BASELINE.md).
Here each timed unit is a jitted ``fori_loop`` chaining ``inner``
data-dependent solves, bounded by ONE scalar fetch; the per-fetch RPC
amortizes to <1% of the measurement.

Usage: python benchmarks/blocktri_bench.py [--k 16384] [--b 8] [--r 3]
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def timeit_chained(solve, D, E, G, inner=400, reps=3):
    """min over reps of (wall of `inner` chained solves) / inner.

    ``inner`` must be LARGE: the per-call dispatch/RPC overhead through
    the tunneled device is ~50 ms, so at inner=50 every solver shows a
    ~1 ms floor regardless of content (round-4's 2.5 ms CR figure was
    ~40% floor).  At inner=400 the floor is ~0.13 ms."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(D, E, G):
        def body(i, g):
            x = solve(D, E, g)
            # Data dependence so XLA cannot elide or overlap iterations;
            # the perturbation is far below f32 resolution of G.
            return g + 1e-30 * x

        return jax.lax.fori_loop(0, inner, body, G)

    out = loop(D, E, G)
    float(np.asarray(out[0, 0, 0]))          # sync: d2h cannot finish early
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = loop(D, E, G)
        float(np.asarray(out[0, 0, 0]))
        ts.append(time.perf_counter() - t0)
    return min(ts) / inner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16384)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--r", type=int, default=3)
    ap.add_argument("--inner", type=int, default=400)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--with-scan", action="store_true",
                    help="include the O(K)-depth Thomas scan (slow at big K)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from collocfem_tpu.solve.blocktri import SOLVERS

    print(f"backend={jax.default_backend()}  K={args.k} b={args.b} r={args.r}")
    rng = np.random.default_rng(0)
    k, b, r = args.k, args.b, args.r
    A = rng.standard_normal((k, b, b)).astype(np.float32)
    D = jnp.asarray(A @ A.transpose(0, 2, 1) + 4 * b * np.eye(b, dtype=np.float32))
    E = jnp.asarray(0.3 * rng.standard_normal((k, b, b)).astype(np.float32))
    G = jnp.asarray(rng.standard_normal((k, b, r)).astype(np.float32))

    names = ["cr", "cr_dw"] + (["scan"] if args.with_scan else [])
    for name in names:
        fn = SOLVERS[name]
        inner = args.inner if name != "scan" else 2
        t = timeit_chained(fn, D, E, G, inner=inner)
        # residual check (single un-timed solve)
        X = jax.jit(fn)(D, E, G)
        rres = jnp.einsum("kij,kjr->kir", D, X)
        rres = rres.at[:-1].add(jnp.einsum("kij,kjr->kir", E[:-1], X[1:]))
        rres = rres.at[1:].add(jnp.einsum("kji,kjr->kir", E[:-1], X[:-1]))
        err = float(jnp.max(jnp.abs(rres - G)))
        print(f"{name:>6}: {t*1e3:9.3f} ms   max|Ax-g|={err:.2e}")


if __name__ == "__main__":
    main()
