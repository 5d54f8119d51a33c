"""Unit tests for the mesh/discretization layer (SURVEY.md §1 L2)."""

import numpy as np
import pytest

from collocfem_tpu.ops.mesh import refined_mesh, uniform_mesh


def test_sizes_and_indexing():
    m = uniform_mesh(0.0, 10.0, num_elements=7, degree=4)
    assert m.num_elements == 7
    assert m.num_nodes == 7 * 4 + 1
    assert m.num_blocks == 8
    assert m.num_padded_nodes == 8 * 4
    idx = m.elem_node_idx
    # Shared boundary DOFs: last node of element e == first node of e+1.
    np.testing.assert_array_equal(idx[1:, 0], idx[:-1, -1])
    assert idx.max() == m.num_nodes - 1


def test_node_times_monotone_and_boundaries():
    m = uniform_mesh(-1.0, 3.0, num_elements=5, degree=3)
    t = m.node_times
    assert t.shape == (m.num_nodes,)
    assert np.all(np.diff(t) > 0)
    assert t[0] == -1.0 and abs(t[-1] - 3.0) < 1e-14
    np.testing.assert_allclose(t[m.elem_node_idx][:, 0], m.breakpoints[:-1])


def test_locate_and_interp():
    m = uniform_mesh(0.0, 2.0, num_elements=4, degree=5)
    times = np.array([0.0, 0.12, 0.5, 0.5000001, 1.999, 2.0])
    e, tau = m.locate(times)
    assert e.tolist() == [0, 0, 1, 1, 3, 3]  # breakpoint hits go to the right element
    assert np.all(tau >= -1.0) and np.all(tau <= 1.0)
    # Interpolating t itself (a degree-1 polynomial in the state) is exact.
    elem, rows = m.interp_rows(times)
    node_t = m.node_times[m.elem_node_idx]  # (N, d+1)
    got = np.einsum("tj,tj->t", rows, node_t[elem])
    np.testing.assert_allclose(got, times, atol=1e-12)


def test_refined_mesh_density():
    dens = np.concatenate([np.full(50, 1.0), np.full(50, 9.0)])
    m = refined_mesh(0.0, 1.0, num_elements=10, degree=3, density=dens)
    h = m.widths
    assert m.breakpoints[0] == 0.0 and m.breakpoints[-1] == 1.0
    # Elements in the dense half must be much narrower.
    assert h[-1] < h[0] / 3


def test_bad_breakpoints_raise():
    from collocfem_tpu.ops.basis import make_basis
    from collocfem_tpu.ops.mesh import Mesh

    with pytest.raises(ValueError):
        Mesh(basis=make_basis(3), breakpoints=np.array([0.0, 0.0, 1.0]))
