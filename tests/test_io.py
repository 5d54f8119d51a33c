"""Measurement-data IO round trips (SURVEY.md §2a data-loading parity)."""

import os

import numpy as np
import pytest

from collocfem_tpu.utils import load_measurements, save_measurements


def test_npz_roundtrip(tmp_path):
    t = np.linspace(0, 1, 17)
    y = np.random.default_rng(0).standard_normal((17, 3))
    path = os.path.join(tmp_path, "m.npz")
    save_measurements(path, t, y)
    t2, y2 = load_measurements(path)
    np.testing.assert_array_equal(t2, t)
    np.testing.assert_array_equal(y2, y)


def test_csv_with_header_and_sorting(tmp_path):
    path = os.path.join(tmp_path, "flight.csv")
    with open(path, "w") as fh:
        fh.write("# t, alpha, q\n")
        fh.write("0.2,1.0,2.0\n0.0,3.0,4.0\n0.1,5.0,6.0\n")
    t, y = load_measurements(path, delimiter=",")
    np.testing.assert_allclose(t, [0.0, 0.1, 0.2])
    np.testing.assert_allclose(y[0], [3.0, 4.0])
    np.testing.assert_allclose(y[2], [1.0, 2.0])


def test_whitespace_dat(tmp_path):
    path = os.path.join(tmp_path, "d.dat")
    with open(path, "w") as fh:
        fh.write("0.0 1.5\n1.0 2.5\n")
    t, y = load_measurements(path)
    assert y.shape == (2, 1)
    np.testing.assert_allclose(y[:, 0], [1.5, 2.5])


def test_npz_missing_keys(tmp_path):
    path = os.path.join(tmp_path, "bad.npz")
    np.savez(path, a=np.zeros(3))
    with pytest.raises(ValueError):
        load_measurements(path)
