"""Unit tests for LGL basis/quadrature tables (SURVEY.md §4: quadrature
exactness up to degree 2d-1; differentiation matrix exact on degree <= d)."""

import numpy as np
import pytest

from collocfem_tpu.ops.basis import make_basis


@pytest.mark.parametrize("d", [1, 2, 3, 4, 5, 8, 12])
def test_nodes_are_lobatto(d):
    b = make_basis(d)
    assert b.nodes.shape == (d + 1,)
    assert b.nodes[0] == -1.0 and b.nodes[-1] == 1.0
    assert np.all(np.diff(b.nodes) > 0)
    # Symmetry of the LGL node set.
    np.testing.assert_allclose(b.nodes, -b.nodes[::-1], atol=1e-14)


@pytest.mark.parametrize("d", [2, 3, 4, 5, 8, 12])
def test_quadrature_exactness(d):
    b = make_basis(d)
    # Exact for all monomials up to degree 2d-1.
    for k in range(2 * d):
        exact = 0.0 if k % 2 == 1 else 2.0 / (k + 1)
        got = float(np.sum(b.weights * b.nodes**k))
        assert abs(got - exact) < 5e-13, (d, k)
    assert abs(np.sum(b.weights) - 2.0) < 1e-13


@pytest.mark.parametrize("d", [1, 2, 3, 4, 5, 8])
def test_diff_matrix_exact_on_polynomials(d):
    b = make_basis(d)
    rng = np.random.default_rng(0)
    coef = rng.standard_normal(d + 1)  # random degree-d polynomial
    vals = np.polyval(coef, b.nodes)
    dvals = np.polyval(np.polyder(coef), b.nodes)
    np.testing.assert_allclose(b.diff @ vals, dvals, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("d", [2, 4, 6])
def test_interp_rows(d):
    b = make_basis(d)
    rng = np.random.default_rng(1)
    coef = rng.standard_normal(d + 1)
    s = np.array([-1.0, -0.7, 0.0, 0.33, 1.0, b.nodes[1]])
    rows = b.interp_rows(s)
    np.testing.assert_allclose(
        rows @ np.polyval(coef, b.nodes), np.polyval(coef, s), rtol=1e-11, atol=1e-11
    )
    # Rows are a partition of unity.
    np.testing.assert_allclose(rows.sum(axis=1), 1.0, atol=1e-12)
    # Exact node hit -> one-hot.
    np.testing.assert_allclose(rows[-1], np.eye(d + 1)[1], atol=1e-12)
