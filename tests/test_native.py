"""Native C++ loader vs the NumPy parser."""

import os
import time

import numpy as np
import pytest

from gp_ss_ak_tpu.data import read_data, write_data
from gp_ss_ak_tpu.native import loader

RNG = np.random.default_rng(41)


@pytest.fixture(scope="module")
def built():
    if loader._load() is None:
        pytest.skip("native loader could not be built")
    return True


class TestNativeLoader:
    def test_matches_numpy_parser(self, built, tmp_path):
        X = RNG.normal(size=(200, 4)) * 100
        y = RNG.normal(size=200)
        p = str(tmp_path / "d.txt")
        write_data(p, X, y)
        table = loader.parse_file(p)
        assert table.shape == (200, 5)
        np.testing.assert_allclose(table[:, :4], X, rtol=1e-9)
        np.testing.assert_allclose(table[:, 4], y, rtol=1e-9)

    def test_comments_and_mixed_delims(self, built, tmp_path):
        p = tmp_path / "m.txt"
        p.write_text("# header\n1,2,3\n# mid comment\n4\t5\t6\n")
        table = loader.parse_file(str(p))
        np.testing.assert_allclose(table, [[1, 2, 3], [4, 5, 6]])

    def test_short_rows_zero_filled(self, built, tmp_path):
        p = tmp_path / "s.txt"
        p.write_text("1,2,3\n4,5\n")
        table = loader.parse_file(str(p))
        np.testing.assert_allclose(table, [[1, 2, 3], [4, 5, 0]])

    def test_missing_file(self, built):
        assert loader.parse_file("/nonexistent/x.txt") is None

    def test_read_data_uses_native(self, built, tmp_path):
        X = RNG.normal(size=(50, 3))
        y = RNG.normal(size=50)
        p = str(tmp_path / "d.txt")
        write_data(p, X, y)
        X2, y2 = read_data(p)
        np.testing.assert_allclose(X2, X, rtol=1e-9)
        np.testing.assert_allclose(y2, y, rtol=1e-9)

    def test_faster_than_python_on_big_file(self, built, tmp_path):
        n = 20000
        X = RNG.normal(size=(n, 4))
        y = RNG.normal(size=n)
        p = str(tmp_path / "big.txt")
        write_data(p, X, y)
        t0 = time.perf_counter()
        loader.parse_file(p)
        t_native = time.perf_counter() - t0
        from gp_ss_ak_tpu.data.io import _parse_lines
        t0 = time.perf_counter()
        _parse_lines(open(p).read())
        t_python = time.perf_counter() - t0
        assert t_native < t_python  # typically 20-100x
