"""Standardization schemes, statistics file, and text IO."""

import numpy as np
import pytest

from gp_ss_ak_tpu.data import (
    MODE_MEANSTD,
    MODE_SYMMETRIC,
    MODE_ZERO_ONE,
    Statistics,
    apply,
    compute_statistics,
    prepare,
    read_data,
    unapply_var,
    unapply_x,
    unapply_y,
    write_data,
    write_predictions,
)

RNG = np.random.default_rng(3)


def make_data(n=50, d=4):
    X = RNG.normal(size=(n, d)) * np.array([100.0, 50.0, 10.0, 2.0][:d]) \
        + np.array([1000.0, -500.0, 30.0, 5.0][:d])
    y = RNG.uniform(0.1, 3.0, size=n)
    return X, y


class TestSymmetric:
    def test_first_three_columns_share_global_minmax(self):
        X, y = make_data()
        stats = compute_statistics(X, y, MODE_SYMMETRIC)
        gmin, gmax = X.min(), X.max()
        for j in range(3):
            assert stats.offset[1 + j] == pytest.approx(0.5 * (gmax + gmin))
            assert stats.scale[1 + j] == pytest.approx(0.5 * (gmax - gmin))
        # column 4 is per-column (Control.cpp:311-315)
        assert stats.offset[4] == pytest.approx(
            0.5 * (X[:, 3].max() + X[:, 3].min()))

    def test_range_in_unit_box(self):
        X, y = make_data()
        Xs, ys, _ = prepare(X, y, MODE_SYMMETRIC)
        assert Xs.min() >= -1 - 1e-12 and Xs.max() <= 1 + 1e-12
        assert ys.min() >= -1 - 1e-12 and ys.max() <= 1 + 1e-12

    def test_roundtrip(self):
        X, y = make_data()
        Xs, ys, stats = prepare(X, y, MODE_SYMMETRIC)
        np.testing.assert_allclose(unapply_x(stats, Xs), X, rtol=1e-12)
        np.testing.assert_allclose(unapply_y(stats, ys), y, rtol=1e-12)

    def test_variance_unscale(self):
        X, y = make_data()
        _, _, stats = prepare(X, y, MODE_SYMMETRIC)
        var = np.array([0.04, 1.0])
        # postData_var returns sqrt(var * scale^2) (Control.cpp:253-254)
        np.testing.assert_allclose(
            unapply_var(stats, var), np.sqrt(var) * stats.scale[0])


class TestOtherModes:
    def test_meanstd(self):
        X, y = make_data()
        Xs, ys, stats = prepare(X, y, MODE_MEANSTD)
        np.testing.assert_allclose(Xs.mean(0), 0.0, atol=1e-10)
        np.testing.assert_allclose(Xs.std(0, ddof=1), 1.0, rtol=1e-10)

    def test_zeroandone(self):
        X, y = make_data()
        stats = compute_statistics(X, y, MODE_ZERO_ONE)
        # offset = 0.5 min, scale = 0.5 (max - min) (Control.cpp:278-296)
        assert stats.offset[0] == pytest.approx(0.5 * y.min())
        assert stats.scale[0] == pytest.approx(0.5 * (y.max() - y.min()))

    def test_bad_mode_raises(self):
        X, y = make_data()
        with pytest.raises(ValueError):
            compute_statistics(X, y, 7)


class TestStatisticsFile:
    def test_roundtrip(self, tmp_path):
        X, y = make_data()
        stats = compute_statistics(X, y, MODE_SYMMETRIC)
        p = str(tmp_path / "m_Statistics.txt")
        stats.save(p)
        stats2 = Statistics.load(p)
        np.testing.assert_allclose(stats2.as_matrix(), stats.as_matrix())

    def test_six_columns(self, tmp_path):
        X, y = make_data(d=3)
        stats = compute_statistics(X, y, MODE_SYMMETRIC)
        p = str(tmp_path / "s.txt")
        stats.save(p)
        M = np.loadtxt(p, delimiter=",")
        assert M.shape == (4, 6)  # (1 + d) rows x 6 cols


class TestTextIO:
    def test_read_comma_and_tab(self, tmp_path):
        p = tmp_path / "d.txt"
        p.write_text("# header comment\n1,2,3,0.5\n4\t5\t6\t0.7\n")
        X, y = read_data(str(p))
        np.testing.assert_allclose(X, [[1, 2, 3], [4, 5, 6]])
        np.testing.assert_allclose(y, [0.5, 0.7])

    def test_write_read_roundtrip(self, tmp_path):
        X, y = make_data(10, 3)
        p = str(tmp_path / "d.txt")
        write_data(p, X, y)
        X2, y2 = read_data(p)
        np.testing.assert_allclose(X2, X, rtol=1e-9)
        np.testing.assert_allclose(y2, y, rtol=1e-9)

    def test_predictions_sorted_by_observed(self, tmp_path):
        X, y = make_data(8, 3)
        yh = y + 0.1
        std = np.full_like(y, 0.2)
        p = str(tmp_path / "pred.txt")
        order = write_predictions(p, y, yh, std, X)
        lines = open(p).read().splitlines()
        assert lines[0].startswith("# SampleNo, Y,")
        ys = [float(l.split("\t")[1]) for l in lines[1:] if l.strip()]
        assert ys == sorted(ys)
        assert len(order) == 8
