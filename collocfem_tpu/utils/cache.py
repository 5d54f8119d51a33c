"""Persistent XLA compilation cache helper.

The N=10k headline solve costs ~100-130 s of one-time lowering + Mosaic
kernel compilation through the tunneled device (SURVEY.md §8 limitation 3).
JAX's persistent compilation cache stores the compiled executables on disk,
so every process after the first skips straight to execution.  Enable it
explicitly from entry points (bench.py, examples) — library code must not
mutate global jax config on import.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "jax",
)


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Turn on the on-disk compilation cache (idempotent). Returns the dir.

    Call before the first jit execution.  Safe to call when the backend is
    already initialized; only affects compilations that happen afterwards.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(
        "COLLOCFEM_CACHE_DIR", DEFAULT_CACHE_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the default thresholds skip small/fast programs,
    # but even those cost seconds through the tunneled-device RPC path.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
