"""Matrix-free iterative inference vs the dense exact path."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_ss_ak_tpu.inference import nlml
from gp_ss_ak_tpu.inference.iterative import (
    IterativeGP,
    cg_solve,
    grad_iterative,
    nlml_iterative,
    slq_logdet,
)
from gp_ss_ak_tpu.model import default_model
from gp_ss_ak_tpu.ops.fused import mapped_points
from gp_ss_ak_tpu.ops.matvec import MatvecOperator

RNG = np.random.default_rng(77)


def setup(n=384, d=3):
    model = default_model(d, dtype=jnp.float32)
    X = jnp.asarray(RNG.uniform(-1, 1, (n, d)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(X) @ np.arange(1.0, d + 1.0)),
                    jnp.float32)
    ep, bp = model.kernel_params
    Xm = mapped_points(model.kernel.children[0], ep, X)
    it_gp = IterativeGP(Xm=Xm, sigma=ep["Sigma"], bias=bp["Sigma"],
                        sn2=model.lik_hypers[0])
    return model, X, y, it_gp


def dense_A(model, X):
    K = model.kernel.matrix(model.kernel_params, X, X, same=True)
    return K + model.lik_hypers[0] * jnp.eye(X.shape[0], dtype=K.dtype)


class TestMatvecOperator:
    def test_matches_dense_matvec(self):
        model, X, y, it_gp = setup(n=300)
        op = MatvecOperator(it_gp.Xm, it_gp.sigma, it_gp.bias, it_gp.sn2,
                            tm=128, tn=128)
        A = dense_A(model, X)
        v = jnp.asarray(RNG.normal(size=300), jnp.float32)
        np.testing.assert_allclose(np.asarray(op(v)), np.asarray(A @ v),
                                   rtol=2e-4, atol=2e-4)

    def test_nontile_sizes(self):
        model, X, y, it_gp = setup(n=257)
        op = MatvecOperator(it_gp.Xm, it_gp.sigma, it_gp.bias, it_gp.sn2,
                            tm=128, tn=128)
        A = dense_A(model, X)
        v = jnp.asarray(RNG.normal(size=257), jnp.float32)
        np.testing.assert_allclose(np.asarray(op(v)), np.asarray(A @ v),
                                   rtol=2e-4, atol=2e-4)


class TestCG:
    def test_solves_spd_system(self):
        model, X, y, it_gp = setup(n=256)
        op = MatvecOperator(it_gp.Xm, it_gp.sigma, it_gp.bias, it_gp.sn2,
                            tm=128, tn=128)
        x, it, res = cg_solve(op, y, tol=1e-5, maxiter=2000)
        A = dense_A(model, X)
        ref = jnp.linalg.solve(A.astype(jnp.float64),
                               y.astype(jnp.float64))
        rel = float(jnp.linalg.norm(x - ref.astype(jnp.float32))
                    / jnp.linalg.norm(ref))
        assert rel < 5e-3


class TestSLQ:
    def test_logdet_within_tolerance(self):
        model, X, y, it_gp = setup(n=256)
        op = MatvecOperator(it_gp.Xm, it_gp.sigma, it_gp.bias, it_gp.sn2,
                            tm=128, tn=128)
        est = float(slq_logdet(op, 256, jax.random.PRNGKey(0),
                               probes=24, lanczos_iters=40))
        A = dense_A(model, X).astype(jnp.float64)
        true = float(jnp.linalg.slogdet(A)[1])
        assert est == pytest.approx(true, rel=0.05, abs=3.0)


class TestIterativeNLML:
    def test_matches_dense_nlml(self):
        model, X, y, it_gp = setup(n=256)
        val, alpha, iters = nlml_iterative(
            it_gp, y, jax.random.PRNGKey(1), probes=24,
            lanczos_iters=40, tm=128, tn=128)
        dense = float(nlml(model.kernel, model.kernel_params,
                           model.lik_hypers, X, y, model.likelihood))
        assert float(val) == pytest.approx(dense, rel=0.02, abs=5.0)

    def test_gradient_sign_agreement_with_dense(self):
        model, X, y, it_gp = setup(n=192)

        # dense gradient w.r.t. (sigma, bias, sn2)
        def dense_obj(sigma, bias, sn2):
            ep, bp = model.kernel_params
            ep = dict(ep, Sigma=sigma)
            bp = dict(bp, Sigma=bias)
            return nlml(model.kernel, (ep, bp), jnp.asarray([sn2]), X, y,
                        model.likelihood)

        gd = jax.grad(dense_obj, argnums=(0, 1, 2))(
            it_gp.sigma, it_gp.bias, it_gp.sn2)
        gi = grad_iterative(it_gp, y, jax.random.PRNGKey(2), probes=16,
                            chunk=64, tm=128, tn=128)
        g_sigma, g_bias, g_sn2, _ = gi
        # stochastic trace estimate: require sign + rough magnitude
        # Hutchinson trace estimates carry O(1/sqrt(probes)) noise:
        # require tight agreement only for large-magnitude gradients
        for got, want in [(g_sigma, gd[0]), (g_bias, gd[1]),
                          (g_sn2, gd[2])]:
            got, want = float(got), float(want)
            if abs(want) > 10.0:
                assert got * want > 0
                assert abs(got - want) / abs(want) < 0.5
            else:
                assert abs(got - want) < 5.0

