"""Shared example-script plumbing: platform/precision flags, iteration table.

The container's site hook registers the TPU backend at interpreter start, so
``--platform cpu`` steers the platform back in-process before first device
use (same pattern as tests/conftest.py).
"""

from __future__ import annotations

import argparse


def make_parser(desc: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=desc)
    ap.add_argument(
        "--platform", default="cpu", choices=["cpu", "default"],
        help="'cpu' (float64, parity-grade) or 'default' (TPU if present)",
    )
    ap.add_argument("--plot", action="store_true", help="show matplotlib plots")
    return ap


def setup_jax(args):
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    return jax


def print_history(history, cols, n_iters):
    """Reference-style per-iteration Newton trace (SURVEY.md §5 metrics)."""
    import numpy as np

    h = np.asarray(history)
    print(f"{'it':>4} " + " ".join(f"{c:>12}" for c in cols))
    for i in range(min(int(n_iters), h.shape[0])):
        print(f"{i:>4} " + " ".join(f"{v:>12.4e}" for v in h[i]))
