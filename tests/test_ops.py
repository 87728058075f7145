"""Pallas fused Gram kernels vs the XLA reference path (interpret
mode on CPU — identical kernel code to the TPU build)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_ss_ak_tpu.inference import Gaussian, nlml
from gp_ss_ak_tpu.kernels import Bias, ExpAns, Sum
from gp_ss_ak_tpu.model import default_model
from gp_ss_ak_tpu.ops import expans_bias_gram, fused_expans_bias_A, \
    fused_cross_gram, maybe_fused_A
from gp_ss_ak_tpu.ops.fused import mapped_points

RNG = np.random.default_rng(31)


def flagship(n=40, d=3):
    model = default_model(input_dim=d, dtype=jnp.float64)
    X = jnp.asarray(RNG.normal(size=(n, d)))
    y = jnp.asarray(np.sin(np.asarray(X)[:, 0]))
    return model, X, y


class TestFusedGram:
    def test_matches_xla_A(self):
        model, X, y = flagship(n=37)  # deliberately non-tile-multiple
        kern = model.kernel
        params = model.kernel_params
        sn2 = float(model.lik_hypers[0])
        A_f = maybe_fused_A(kern, params, sn2, X, fused=True)
        K = kern.matrix(params, X, X, same=True)
        A_x = K + sn2 * jnp.eye(X.shape[0], dtype=K.dtype)
        np.testing.assert_allclose(np.asarray(A_f), np.asarray(A_x),
                                   rtol=1e-9, atol=1e-11)

    def test_cross_gram_matches(self):
        model, X, y = flagship(n=33)
        Xs = jnp.asarray(RNG.normal(size=(17, 3)))
        kX_f = fused_cross_gram(model.kernel, model.kernel_params, X, Xs)
        kX_x = model.kernel.matrix(model.kernel_params, X, Xs)
        np.testing.assert_allclose(np.asarray(kX_f), np.asarray(kX_x),
                                   rtol=1e-9, atol=1e-11)

    def test_gradients_match_xla(self):
        model, X, y = flagship(n=24)
        flat0 = np.asarray(model.pack())
        flat0 = flat0 * (1 + 0.2 * RNG.normal(size=flat0.shape))
        flat0 = np.abs(flat0) + 0.05

        def obj(flat, fused):
            m = model.unpack(jnp.asarray(flat))
            return nlml(m.kernel, m.kernel_params, m.lik_hypers, X, y,
                        m.likelihood, fused=fused)

        g_f = jax.grad(lambda f: obj(f, True))(jnp.asarray(flat0))
        g_x = jax.grad(lambda f: obj(f, False))(jnp.asarray(flat0))
        v_f = float(obj(jnp.asarray(flat0), True))
        v_x = float(obj(jnp.asarray(flat0), False))
        assert v_f == pytest.approx(v_x, rel=1e-9)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                                   rtol=1e-6, atol=1e-9)

    def test_non_flagship_returns_none(self):
        kern = Sum([Bias()])
        out = maybe_fused_A(kern, kern.init_params(jnp.float64), 0.1,
                            jnp.zeros((8, 3)), fused=True)
        assert out is None

    def test_dispatch_off_tpu_defaults_none(self):
        model, X, y = flagship(n=600)
        out = maybe_fused_A(model.kernel, model.kernel_params, 0.1, X)
        assert out is None  # CPU backend -> XLA path
