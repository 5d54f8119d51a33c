"""Debug-guard utilities (SURVEY.md §5 sanitizer tier) + profiling trace."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collocfem_tpu.utils import assert_all_finite, checkified, trace


def test_checkified_catches_nan():
    f = jax.jit(lambda x: jnp.log(x) * 2.0)
    err, _ = checkified(f)(jnp.asarray(-1.0))
    with pytest.raises(Exception):
        err.throw()


def test_checkified_clean_pass():
    f = jax.jit(lambda x: x * 3.0)
    err, out = checkified(f)(jnp.asarray(2.0))
    err.throw()
    assert float(out) == 6.0


def test_assert_all_finite():
    assert_all_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError, match="a"):
        assert_all_finite({"a": jnp.asarray([1.0, jnp.nan])})


def test_profiler_trace(tmp_path):
    logdir = os.path.join(tmp_path, "trace")
    with trace(logdir):
        y = jax.jit(lambda x: x + 1)(jnp.ones(8))
        jax.block_until_ready(y)
    # A trace directory with at least one event file was produced.
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "no profiler output written"
