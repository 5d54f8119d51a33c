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
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

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
