"""HMC/NUTS correctness on known targets + GP hyperposterior smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_ss_ak_tpu.bayes import (
    BoxTransform,
    default_box,
    hmc_sample,
    make_log_posterior,
    nuts_sample,
    predictive_mixture,
    sample_hyperposterior,
)
from gp_ss_ak_tpu.model import default_model

RNG = np.random.default_rng(17)


class TestSamplersOnGaussian:
    """Both samplers must recover the moments of a correlated Gaussian."""

    def target(self):
        cov = np.array([[1.0, 0.6], [0.6, 2.0]])
        prec = jnp.asarray(np.linalg.inv(cov))

        def log_post(z):
            return -0.5 * z @ prec @ z

        return log_post, cov

    def test_hmc_moments(self):
        log_post, cov = self.target()
        samples, aps = hmc_sample(log_post, jnp.zeros(2),
                                  jax.random.PRNGKey(0),
                                  n_samples=2000, n_warmup=500,
                                  n_leapfrog=8)
        s = np.asarray(samples)
        assert float(np.mean(np.asarray(aps))) > 0.5
        np.testing.assert_allclose(s.mean(0), 0.0, atol=0.15)
        np.testing.assert_allclose(np.cov(s.T), cov, atol=0.35)

    def test_nuts_moments(self):
        log_post, cov = self.target()
        samples, aps = nuts_sample(log_post, jnp.zeros(2),
                                   jax.random.PRNGKey(1),
                                   n_samples=2000, n_warmup=500)
        s = np.asarray(samples)
        assert float(np.mean(np.asarray(aps))) > 0.5
        np.testing.assert_allclose(s.mean(0), 0.0, atol=0.15)
        np.testing.assert_allclose(np.cov(s.T), cov, atol=0.35)

    def test_nuts_explores_better_than_iid_start(self):
        # anisotropic target: NUTS should traverse the long axis
        def log_post(z):
            return -0.5 * (z[0] ** 2 / 100.0 + z[1] ** 2)

        samples, _ = nuts_sample(log_post, jnp.zeros(2),
                                 jax.random.PRNGKey(2), n_samples=1500,
                                 n_warmup=500)
        s = np.asarray(samples)
        assert s[:, 0].std() > 5.0  # true std 10


class TestBoxTransform:
    def test_roundtrip_and_jacobian(self):
        box = default_box(4)
        theta = jnp.asarray([0.001, 0.5, 3.0, 5.9])
        z = box.inverse(theta)
        np.testing.assert_allclose(np.asarray(box.forward(z)),
                                   np.asarray(theta), rtol=1e-6)
        # jacobian consistency: d theta/d z via jax
        J = jax.jacobian(box.forward)(z)
        logdet = float(jnp.linalg.slogdet(J)[1])
        assert float(box.log_det_jacobian(z)) == pytest.approx(
            logdet, rel=1e-6)


class TestGPHyperposterior:
    def test_smoke_and_predictive(self):
        n = 25
        X = np.linspace(-1, 1, n).reshape(-1, 1)
        y = np.sin(3 * X[:, 0]) + 0.1 * RNG.normal(size=n)
        model = default_model(input_dim=1)
        theta, aps = sample_hyperposterior(
            model, X, y, jax.random.PRNGKey(0), n_samples=60,
            n_warmup=60, n_chains=2, sampler="nuts")
        th = np.asarray(theta)
        assert th.shape == (2, 60, 10)
        assert np.isfinite(th).all()
        # samples respect the box
        assert th.min() >= 1e-4 - 1e-9 and th.max() <= 6.0 + 1e-9

        mu, var = predictive_mixture(model, X, y, X, theta, thin=10)
        assert np.isfinite(np.asarray(mu)).all()
        assert (np.asarray(var) >= 0).all()
        mse = float(np.mean((np.asarray(mu) - y) ** 2))
        assert mse < 0.5
