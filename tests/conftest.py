"""Test harness configuration.

Tests run on CPU with a **virtual 8-device mesh** (SURVEY.md §4: the
rebuild's analogue of a fake backend) and float64 enabled for parity-grade
tolerances.  The container boots with an `axon` TPU PJRT plugin registered
from sitecustomize, so the platform is steered back to CPU via
``jax.config.update`` *before any backend is initialized* (env vars are too
late: jax is already imported by the site hook).
"""

import os
import sys

# Repo root on sys.path so `collocfem_tpu` imports without installation.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in _flags:
    # Tests are COMPILE-bound (a tiny GN while_loop costs ~12 s of XLA:CPU
    # optimization at the default level, ~8.5 s at level 0, vs ~0.01 s of
    # runtime); numerics are unaffected — only fusion/scheduling effort.
    _flags = (_flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite's wall is almost entirely XLA
# compiles of solver while_loops; repeat runs (local dev, CI retries) skip
# them.  A cold run still pays full compile — the slow-tier split below is
# what keeps THAT under budget.
from collocfem_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(
    os.path.join(os.path.dirname(__file__), ".jax_cache")
)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (multi-minute integration / Pallas "
        "interpret-mode walls); also enabled by RUN_SLOW=1",
    )


def pytest_collection_modifyitems(config, items):
    """Default suite stays under ~5 min on this box (round-2 verdict item
    4): the multi-minute tier is opt-in, not silently absent — ``pytest
    --runslow`` (or RUN_SLOW=1) runs everything."""
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: use --runslow / RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return devs[:8]
