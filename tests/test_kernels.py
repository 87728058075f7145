"""Kernel math vs the independent NumPy oracle + structural checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from gp_ss_ak_tpu.kernels import (
    Bias,
    ExpAns,
    Exponential,
    RBF,
    Sum,
    White,
    make_kernel,
    rotation_matrix_3d,
    sq_euclidean,
)

import oracle

RNG = np.random.default_rng(0)


def rand_X(n, d):
    return RNG.normal(size=(n, d)) * 2.0 + 1.0


class TestRotation:
    def test_matches_oracle(self):
        a, b, t = 0.7, -0.3, 1.9
        R = np.asarray(rotation_matrix_3d(a, b, t))
        np.testing.assert_allclose(R, oracle.rotation(a, b, t), atol=1e-12)

    def test_orthogonal(self):
        R = np.asarray(rotation_matrix_3d(0.5, 1.1, -0.8))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-12)


class TestDistances:
    def test_sq_euclidean_matches_oracle(self):
        X1, X2 = rand_X(7, 3), rand_X(5, 3)
        got = np.asarray(sq_euclidean(jnp.asarray(X1), jnp.asarray(X2), 0.7))
        np.testing.assert_allclose(got, oracle.eucl_dist(X1, X2, 0.7),
                                   rtol=1e-10)

    def test_translation_invariance(self):
        X1, X2 = rand_X(6, 3), rand_X(4, 3)
        shift = np.array([1e5, -2e5, 3e5])
        a = np.asarray(sq_euclidean(jnp.asarray(X1), jnp.asarray(X2), 1.3))
        b = np.asarray(sq_euclidean(jnp.asarray(X1 + shift),
                                    jnp.asarray(X2 + shift), 1.3))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    def test_nonnegative(self):
        X = rand_X(8, 3)
        D2 = np.asarray(sq_euclidean(jnp.asarray(X), jnp.asarray(X), 0.5))
        assert (D2 >= 0).all()
        assert np.abs(np.diag(D2)).max() < 1e-8


class TestExpAns:
    def params(self):
        k = ExpAns()
        return k, k.init_params(jnp.float64)

    def test_matches_oracle_3d(self):
        k, p = self.params()
        X1, X2 = rand_X(9, 3), rand_X(6, 3)
        got = np.asarray(k.matrix(p, jnp.asarray(X1), jnp.asarray(X2)))
        want = oracle.expans_K(X1, X2, {n: float(v) for n, v in p.items()})
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_matches_oracle_4d(self):
        k, p = self.params()
        X1, X2 = rand_X(5, 4), rand_X(5, 4)
        got = np.asarray(k.matrix(p, jnp.asarray(X1), jnp.asarray(X2)))
        want = oracle.expans_K(X1, X2, {n: float(v) for n, v in p.items()})
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_1d_inputs_work(self):
        # the reference crashes for d not in {3,4}; we zero-pad to 3
        k, p = self.params()
        X = rand_X(10, 1)
        K = np.asarray(k.matrix(p, jnp.asarray(X), jnp.asarray(X), same=True))
        want = oracle.expans_K(X, X, {n: float(v) for n, v in p.items()})
        np.testing.assert_allclose(K, want, rtol=1e-10)

    def test_diag_equals_matrix_diag(self):
        k, p = self.params()
        X = rand_X(6, 3)
        K = np.asarray(k.matrix(p, jnp.asarray(X), jnp.asarray(X), same=True))
        d = np.asarray(k.diag(p, jnp.asarray(X)))
        np.testing.assert_allclose(np.diag(K), d, rtol=1e-10)

    def test_psd_with_noise(self):
        k, p = self.params()
        X = rand_X(20, 3)
        K = np.asarray(k.matrix(p, jnp.asarray(X), jnp.asarray(X), same=True))
        w = np.linalg.eigvalsh(K + 1e-8 * np.eye(20))
        assert w.min() > -1e-9

    def test_init_values_match_reference(self):
        # Kernel.cpp:763-773
        k = ExpAns()
        p = k.init_params(jnp.float64)
        assert float(p["AngleX"]) == pytest.approx(np.pi / 3.1)
        assert float(p["inverseWidthz"]) == 1.3
        assert float(p["Sigma"]) == 0.9
        assert float(p["inversewidthR"]) == 0.6


class TestStationary:
    def test_rbf_matches_oracle(self):
        k = RBF()
        p = k.init_params(jnp.float64)
        X1, X2 = rand_X(8, 3), rand_X(5, 3)
        got = np.asarray(k.matrix(p, jnp.asarray(X1), jnp.asarray(X2)))
        want = oracle.rbf_K(X1, X2, float(p["Hayper_Euc"]),
                            float(p["inverseWidth"]), float(p["Sigma"]))
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_exp_matches_oracle(self):
        k = Exponential()
        p = k.init_params(jnp.float64)
        X1, X2 = rand_X(8, 2), rand_X(5, 2)
        got = np.asarray(k.matrix(p, jnp.asarray(X1), jnp.asarray(X2)))
        want = oracle.exp_K(X1, X2, float(p["Hayper_Euc"]),
                            float(p["Sigma"]))
        np.testing.assert_allclose(got, want, rtol=1e-10)


class TestSimple:
    def test_bias_constant_not_squared(self):
        k = Bias()
        p = {"Sigma": jnp.asarray(0.37)}
        K = np.asarray(k.matrix(p, jnp.asarray(rand_X(4, 3)),
                                jnp.asarray(rand_X(6, 3))))
        np.testing.assert_allclose(K, 0.37)  # Kernel.cpp:362-367

    def test_white_same_only(self):
        k = White()
        p = {"Sigma": jnp.asarray(0.2)}
        X = jnp.asarray(rand_X(5, 3))
        K_same = np.asarray(k.matrix(p, X, X, same=True))
        K_cross = np.asarray(k.matrix(p, X, X, same=False))
        np.testing.assert_allclose(K_same, 0.2 * np.eye(5))
        np.testing.assert_allclose(K_cross, 0.0)


class TestComposite:
    def test_sum_and_packing(self):
        kern = Sum([ExpAns(), Bias()])
        params = kern.init_params(jnp.float64)
        assert kern.n_params == 9
        X = jnp.asarray(rand_X(6, 3))
        K = np.asarray(kern.matrix(params, X, X, same=True))
        K1 = np.asarray(kern.children[0].matrix(params[0], X, X, True))
        K2 = np.asarray(kern.children[1].matrix(params[1], X, X, True))
        np.testing.assert_allclose(K, K1 + K2, rtol=1e-12)

        flat = kern.pack(params)
        assert flat.shape == (9,)
        rt = kern.unpack(flat)
        for a, b in zip(params, rt):
            for n in a:
                assert float(a[n]) == pytest.approx(float(b[n]))

    def test_registry(self):
        for name in ["RBF", "ExpAns", "Exp", "Bias", "White",
                     "white", "White Noise", "ExpAn"]:
            make_kernel(name)
        with pytest.raises(ValueError):
            make_kernel("nope")
