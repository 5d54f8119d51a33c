"""Tracing / profiling helpers (SURVEY.md §5 "Tracing / profiling").

The reference has only ad-hoc timers [R]; here:
  * :func:`timed` — block-until-ready wall timer for jitted callables,
  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    Perfetto/XProf trace directory,
and the solvers already return per-iteration history tables in their stats
pytrees (the on-device analogue of per-phase counters).
"""

from __future__ import annotations

import contextlib
import time

import jax


def timed(fn, *args, reps: int = 5, warmup: int = 1, **kwargs):
    """Best-of-``reps`` wall time of ``fn(*args)`` with device sync.

    Returns (seconds, last_output).
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region into ``log_dir`` (view with XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
