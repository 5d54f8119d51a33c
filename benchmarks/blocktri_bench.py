"""Microbenchmark: block-tridiagonal solver variants on the current backend.

Times one solve of an SPD block-tridiagonal system at the headline shape
(K=16384 blocks of bd=8, nrhs=3 — the VdP 10k-element KKT) for each solver
variant, plus the assembly step, to locate the Newton-iteration bottleneck.

Usage: python benchmarks/blocktri_bench.py [--k 16384] [--b 8] [--r 3]
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def timeit(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16384)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--r", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
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

    results = {}
    for name in ("cr", "scan"):
        fn = jax.jit(SOLVERS[name])
        t = timeit(fn, D, E, G)
        results[name] = t
        # residual check
        X = fn(D, E, G)
        rres = jnp.einsum("kij,kjr->kir", D, X)
        rres = rres.at[:-1].add(jnp.einsum("kij,kjr->kir", E[:-1], X[1:]))
        rres = rres.at[1:].add(
            jnp.einsum("kji,kjr->kir", E[:-1], X[:-1])
        )
        err = float(jnp.max(jnp.abs(rres - G)))
        print(f"{name:>6}: {t*1e3:9.3f} ms   max|Ax-g|={err:.2e}")

    print(f"\nspeedup cr vs scan: {results['scan'] / results['cr']:.1f}x")


if __name__ == "__main__":
    main()
