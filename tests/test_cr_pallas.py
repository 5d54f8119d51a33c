"""Per-level Pallas CR kernels vs the XLA SoA path (interpret mode on CPU,
SURVEY.md §4 sanitizer tier)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collocfem_tpu.solve.blocktri import blocktri_solve_cr


def _system(rng, k, b, r, dtype=np.float64):
    A = rng.standard_normal((k, b, b)).astype(dtype)
    D = jnp.asarray(A @ A.transpose(0, 2, 1) + 4 * b * np.eye(b, dtype=dtype))
    E = jnp.asarray(0.25 * rng.standard_normal((k, b, b)).astype(dtype))
    G = jnp.asarray(rng.standard_normal((k, b, r)).astype(dtype))
    return D, E, G


# Interpret-mode per-level kernels cost minutes at K >= 256 on CPU; the
# fast tier keeps the smallest shape that still reaches two Pallas levels.
@pytest.mark.parametrize(
    "k,b,r",
    [
        pytest.param(256, 8, 3, marks=pytest.mark.slow),
        (130, 4, 1),
        pytest.param(1024, 8, 3, marks=pytest.mark.slow),
    ],
)
def test_pallas_cr_matches_xla_path(k, b, r):
    rng = np.random.default_rng(0)
    D, E, G = _system(rng, k, b, r)
    X_xla = blocktri_solve_cr(D, E, G, pallas=False)
    X_pl = blocktri_solve_cr(D, E, G, pallas=True, pallas_min=64)
    np.testing.assert_allclose(
        np.asarray(X_pl), np.asarray(X_xla), rtol=1e-9, atol=1e-10
    )


@pytest.mark.slow
def test_pallas_cr_residual():
    rng = np.random.default_rng(1)
    D, E, G = _system(rng, 512, 6, 2)
    X = blocktri_solve_cr(D, E, G, pallas=True, pallas_min=64)
    AX = jnp.einsum("kij,kjr->kir", D, X)
    AX = AX.at[:-1].add(jnp.einsum("kij,kjr->kir", E[:-1], X[1:]))
    AX = AX.at[1:].add(jnp.einsum("kji,kjr->kir", E[:-1], X[:-1]))
    np.testing.assert_allclose(np.asarray(AX), np.asarray(G), atol=1e-9)


@pytest.mark.parametrize(
    "pallas", [False, pytest.param(True, marks=pytest.mark.slow)]
)
def test_factor_apply_matches_one_shot(pallas):
    from collocfem_tpu.solve.blocktri import blocktri_cr_factor

    rng = np.random.default_rng(3)
    D, E, G = _system(rng, 300, 6, 2)
    X_ref = blocktri_solve_cr(D, E, G, pallas=False)
    apply = blocktri_cr_factor(D, E, pallas=pallas, pallas_min=64)
    X1 = apply(G)
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X_ref),
                               rtol=1e-9, atol=1e-10)
    # Second apply with a different RHS reuses the same factors.
    G2 = jnp.asarray(np.random.default_rng(4).standard_normal(G.shape))
    X2 = apply(G2)
    X2_ref = blocktri_solve_cr(D, E, G2, pallas=False)
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X2_ref),
                               rtol=1e-9, atol=1e-10)
