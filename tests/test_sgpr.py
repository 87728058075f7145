"""Sparse GP (Titsias) sanity: bound below exact evidence, tightness
when Z = X, predictive quality, trainability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_ss_ak_tpu.inference import nlml, predict as exact_predict, sgpr
from gp_ss_ak_tpu.model import default_model

RNG = np.random.default_rng(61)


def make_problem(n=80, d=2):
    X = RNG.uniform(-1, 1, size=(n, d))
    y = np.sin(2 * X[:, 0]) + 0.1 * RNG.normal(size=n)
    model = default_model(input_dim=d, dtype=jnp.float64)
    return model, jnp.asarray(X), jnp.asarray(y)


class TestSGPR:
    def test_elbo_is_lower_bound_on_evidence(self):
        model, X, y = make_problem()
        Z = sgpr.init_inducing(X, 20)
        bound = float(sgpr.elbo(model.kernel, model.kernel_params,
                                model.lik_hypers, X, y, Z))
        log_ev = -float(nlml(model.kernel, model.kernel_params,
                             model.lik_hypers, X, y))
        assert bound <= log_ev + 1e-6

    def test_tight_when_inducing_equals_data(self):
        model, X, y = make_problem(n=40)
        bound = float(sgpr.elbo(model.kernel, model.kernel_params,
                                model.lik_hypers, X, y, X,
                                jitter=1e-10))
        log_ev = -float(nlml(model.kernel, model.kernel_params,
                             model.lik_hypers, X, y))
        assert bound == pytest.approx(log_ev, abs=1e-3)

    def test_predictions_close_to_exact(self):
        model, X, y = make_problem(n=100)
        Z = sgpr.init_inducing(X, 70)
        Xs = jnp.asarray(RNG.uniform(-1, 1, size=(15, 2)))
        mu_s, var_s = sgpr.predict(model.kernel, model.kernel_params,
                                   model.lik_hypers, X, y, Z, Xs)
        mu_e, var_e = exact_predict(model.kernel, model.kernel_params,
                                    model.lik_hypers, X, y, Xs,
                                    model.likelihood)
        np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_e),
                                   atol=0.1)
        assert (np.asarray(var_s) >= 0).all()

    def test_gradients_flow_to_hypers_and_inducing(self):
        model, X, y = make_problem(n=50)
        Z = sgpr.init_inducing(X, 10)
        kern = model.kernel

        def obj(flat, Z):
            kp = kern.unpack(flat[:-1])
            return sgpr.neg_elbo(kern, kp, flat[-1:], X, y, Z)

        flat = jnp.concatenate([kern.pack(model.kernel_params),
                                model.lik_hypers])
        g_f, g_Z = jax.grad(obj, argnums=(0, 1))(flat, Z)
        assert np.isfinite(np.asarray(g_f)).all()
        assert np.isfinite(np.asarray(g_Z)).all()
        assert float(jnp.max(jnp.abs(g_Z))) > 0

    def test_scales_past_dense_memory(self):
        # n = 20000 with m = 50: the dense N x N matrix would be 3.2 GB
        # in f64; SGPR runs in O(n m)
        model, _, _ = make_problem(n=10)
        n = 20000
        X = jnp.asarray(RNG.uniform(-1, 1, size=(n, 2)))
        y = jnp.sin(2 * X[:, 0])
        Z = sgpr.init_inducing(X, 50)
        bound = float(sgpr.elbo(model.kernel, model.kernel_params,
                                model.lik_hypers, X, y, Z))
        assert np.isfinite(bound)
        mu, var = sgpr.predict(model.kernel, model.kernel_params,
                               model.lik_hypers, X, y, Z, X[:100])
        mse = float(jnp.mean((mu - y[:100]) ** 2))
        assert mse < 0.2


class TestFitSGPR:
    def test_joint_fit_improves_and_predicts(self):
        from gp_ss_ak_tpu.inference.sgpr import fit_sgpr, predict as spred

        model, X, y = make_problem(n=150)
        fitted, Z, res = fit_sgpr(model, X, y, m=24, iters=30)
        assert res.fun < res.trace[0] - 5.0
        mu, var = spred(fitted.kernel, fitted.kernel_params,
                        fitted.lik_hypers, X, y, Z, X[:20])
        mse = float(jnp.mean((mu - y[:20]) ** 2))
        assert mse < 0.1
        assert (np.asarray(var) >= 0).all()

    def test_fixed_z_fit_keeps_inducing_at_init(self):
        """optimize_z=False (the m-sweep ablation arm): Z must come
        back exactly at init_inducing's subset while hypers still
        move and the bound still improves."""
        from gp_ss_ak_tpu.inference import sgpr
        from gp_ss_ak_tpu.inference.sgpr import fit_sgpr

        model, X, y = make_problem(n=150)
        Z0 = sgpr.init_inducing(jnp.asarray(X), 24)
        fitted, Z, res = fit_sgpr(model, X, y, m=24, iters=20,
                                  optimize_z=False)
        np.testing.assert_array_equal(np.asarray(Z), np.asarray(Z0))
        assert res.fun < res.trace[0] - 1.0
        assert res.x.shape[0] == model.n_params   # hypers only
