"""Failure recovery, logging, profiling helpers, and the Predictor."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_ss_ak_tpu.inference import predict
from gp_ss_ak_tpu.model import default_model
from gp_ss_ak_tpu.serve import Predictor
from gp_ss_ak_tpu.utils import (
    FitLogger,
    cholesky_flops,
    gram_flops,
    is_spd_cholesky,
    robust_cholesky,
    timeit_fn,
)

RNG = np.random.default_rng(53)


class TestRobustCholesky:
    def test_spd_passes_without_nugget(self):
        B = RNG.normal(size=(20, 20))
        A = jnp.asarray(B @ B.T + 20 * np.eye(20))
        L, nug = robust_cholesky(A)
        assert bool(is_spd_cholesky(L))
        assert float(nug) == 0.0
        np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(A),
                                   rtol=1e-8)

    def test_near_singular_recovers_with_nugget(self):
        # rank-deficient PSD + tiny negative perturbation
        v = RNG.normal(size=(30, 3))
        A = jnp.asarray(v @ v.T - 1e-9 * np.eye(30))
        L, nug = robust_cholesky(A)
        assert bool(is_spd_cholesky(L))
        assert float(nug) > 0.0

    def test_hopeless_matrix_stays_nan(self):
        A = -jnp.eye(10)  # negative definite: no reasonable nugget
        L, _ = robust_cholesky(A, max_attempts=3)
        assert not bool(is_spd_cholesky(L))

    def test_jit_compatible(self):
        A = jnp.eye(8) * 4.0
        L, nug = jax.jit(robust_cholesky)(A)
        assert bool(is_spd_cholesky(L))


class TestFitLogger:
    def test_records_and_saves(self, tmp_path):
        p = str(tmp_path / "metrics.json")
        log = FitLogger(verbose=0, path=p)
        log(1, np.ones(3), 10.0)
        log(2, np.ones(3) * 2, 8.5)
        log.save()
        data = json.load(open(p))
        assert data["summary"]["iters"] == 2
        assert data["summary"]["nlml_final"] == 8.5
        assert len(data["trace"]) == 2
        assert data["trace"][0]["params"] == [1.0, 1.0, 1.0]


class TestProfilingHelpers:
    def test_flop_counts(self):
        assert gram_flops(10, 10, 3) == 2 * 10 * 10 * 3 + 8 * 100
        assert cholesky_flops(6) == 72

    def test_timeit(self):
        f = jax.jit(lambda x: x * 2)
        dt = timeit_fn(f, jnp.ones(8), reps=3)
        assert dt > 0


class TestPredictor:
    def make(self, n=50):
        X = RNG.normal(size=(n, 3))
        y = np.sin(X[:, 0])
        model = default_model(input_dim=3)
        return model, X, y

    def test_matches_one_shot_predict(self):
        model, X, y = self.make()
        Xs = RNG.normal(size=(12, 3))
        server = Predictor(model, X, y)
        mu_s, var_s = server(Xs)
        mu_d, var_d = predict(model.kernel, model.kernel_params,
                              model.lik_hypers, jnp.asarray(X),
                              jnp.asarray(y), jnp.asarray(Xs),
                              model.likelihood)
        np.testing.assert_allclose(mu_s, np.asarray(mu_d), rtol=1e-8)
        np.testing.assert_allclose(var_s, np.asarray(var_d), rtol=1e-8)

    def test_batched_equals_unbatched(self):
        model, X, y = self.make()
        Xs = RNG.normal(size=(53, 3))  # deliberately not a multiple
        server = Predictor(model, X, y)
        mu_a, var_a = server(Xs)
        mu_b, var_b = server(Xs, batch_size=16)
        np.testing.assert_allclose(mu_b, mu_a, rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(var_b, var_a, rtol=1e-4, atol=1e-8)

    def test_robust_mode_on_degenerate_duplicates(self):
        model, X, y = self.make(n=30)
        X[15:] = X[:15]  # exact duplicates + near-zero noise
        y[15:] = y[:15]
        import jax.numpy as jnp
        from dataclasses import replace

        model = replace(model, lik_hypers=jnp.asarray([1e-12]))
        server = Predictor(model, X, y, robust=True)
        mu, var = server(X[:5])
        assert np.isfinite(mu).all()
        assert np.isfinite(var).all()


def test_predictor_precomputed_inverse_matches_solve():
    import numpy as np
    import jax.numpy as jnp
    from gp_ss_ak_tpu.model import default_model
    from gp_ss_ak_tpu.serve import Predictor

    rng = np.random.default_rng(11)
    X = rng.uniform(-1, 1, (90, 3))
    y = np.sin(2 * X.sum(1))
    Xq = rng.uniform(-1, 1, (25, 3))
    model = default_model(3)
    fast = Predictor(model, X, y, precompute_inverse=True)
    slow = Predictor(model, X, y, precompute_inverse=False)
    assert fast.post.linv is not None and slow.post.linv is None
    mu_f, var_f = fast(Xq)
    mu_s, var_s = slow(Xq)
    np.testing.assert_allclose(mu_f, mu_s, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(var_f, var_s, rtol=1e-8, atol=1e-11)
    # auto mode precomputes at moderate n
    auto = Predictor(model, X, y)
    assert auto.post.linv is not None


class TestIterativePredictor:
    """Matrix-free server vs the dense Predictor (same model, same
    data): posterior mean/variance must agree to CG tolerance."""

    def make(self, n=384):
        rng = np.random.default_rng(7)
        X = rng.uniform(-1, 1, (n, 3))
        y = np.sin(X @ np.array([3.0, 1.0, 2.0]))
        model = default_model(input_dim=3, dtype=jnp.float32)
        return model, X, y

    def test_matches_dense_predictor(self):
        from gp_ss_ak_tpu.serve import IterativePredictor

        model, X, y = self.make()
        Xs = np.random.default_rng(8).uniform(-1, 1, (64, 3))
        dense = Predictor(model, X, y)
        it = IterativePredictor(model, X, y, precond_rank=64,
                                cg_tol=1e-6, chunk=128)
        mu_d, var_d = dense(Xs)
        mu_i, var_i = it(Xs, batch_size=64)
        np.testing.assert_allclose(mu_i, mu_d, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(var_i, var_d, rtol=5e-3, atol=5e-4)
        assert it.setup_cg_iters > 0
        assert it.last_cg_iters > 0

    def test_mean_only_and_batching(self):
        from gp_ss_ak_tpu.serve import IterativePredictor

        model, X, y = self.make(256)
        Xs = np.random.default_rng(9).uniform(-1, 1, (70, 3))
        it = IterativePredictor(model, X, y, precond_rank=32,
                                cg_tol=1e-6, chunk=128)
        mu1, var1 = it(Xs, batch_size=32)       # padded tail batch
        mu2, none = it(Xs, batch_size=128, mean_only=True)
        assert none is None
        np.testing.assert_allclose(mu1, mu2, rtol=1e-5, atol=1e-6)
        assert var1.shape == (70,)

    def test_train_points_reproduce_targets(self):
        # with tiny noise the posterior mean at train points ~ y
        from dataclasses import replace

        from gp_ss_ak_tpu.serve import IterativePredictor

        model, X, y = self.make(256)
        model = replace(model, lik_hypers=jnp.asarray([1e-3], jnp.float32))
        it = IterativePredictor(model, X, y, precond_rank=64,
                                cg_tol=1e-7, chunk=128)
        mu, _ = it(X[:50], batch_size=64, mean_only=True)
        np.testing.assert_allclose(mu, y[:50], atol=5e-2)

    def test_rejects_non_flagship(self):
        import pytest

        from gp_ss_ak_tpu.model import default_model as dm
        from gp_ss_ak_tpu.serve import IterativePredictor

        model = dm(3, kernel_names=["RBF"])
        X = np.zeros((8, 3))
        with pytest.raises(ValueError):
            IterativePredictor(model, X, np.zeros(8))

    def test_var_solve_column_chunking_is_invisible(self, monkeypatch):
        """SOLVE_COL_BLOCK (the streamed-matmat VMEM ceiling) must be
        a pure memory knob: chunked variance solves with a padded tail
        block == one whole-batch solve."""
        from gp_ss_ak_tpu.serve import IterativePredictor

        model, X, y = self.make(256)
        Xs = np.random.default_rng(12).uniform(-1, 1, (48, 3))
        it = IterativePredictor(model, X, y, precond_rank=32,
                                cg_tol=1e-8, chunk=128)
        _mu, var_whole = it(Xs, batch_size=64)
        monkeypatch.setattr(IterativePredictor, "SOLVE_COL_BLOCK", 20)
        _mu2, var_chunked = it(Xs, batch_size=64)  # 64 -> 4 blocks,
        # last padded from 4 to 20 zero columns
        # block-grouped CG stops per-block: agreement is at the f32
        # solve floor, not bitwise
        np.testing.assert_allclose(var_chunked, var_whole,
                                   rtol=1e-3, atol=1e-5)

    def test_warped_matches_dense_predict(self):
        """WarpedGaussian serving: the matrix-free route must agree
        with the dense Gauss-Hermite path (gaussian.predict) — the
        reference's warped posteriorMeanVar (GP_Utils.cpp:1044-1078)
        extended past the dense wall (VERDICT r4 #2)."""
        from dataclasses import replace

        from gp_ss_ak_tpu.inference.likelihoods import WarpedGaussian
        from gp_ss_ak_tpu.serve import IterativePredictor

        model, X, y = self.make(320)
        lik = WarpedGaussian(family="tanh1", n_triplets=1)
        model = replace(
            model, likelihood=lik,
            lik_hypers=jnp.asarray([0.2, 0.5, 0.1, -1.5], jnp.float32))
        # skewed positive targets — the regime the warp exists for
        y = np.exp(0.8 * y)
        Xs = np.random.default_rng(11).uniform(-1, 1, (48, 3))

        mu_d, var_d = predict(
            model.kernel, model.kernel_params, model.lik_hypers,
            jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(Xs, jnp.float32), model.likelihood)
        it = IterativePredictor(model, X, y, precond_rank=64,
                                cg_tol=1e-7, chunk=128)
        mu_i, var_i = it(Xs, batch_size=64)
        np.testing.assert_allclose(mu_i, np.asarray(mu_d),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(var_i, np.asarray(var_d),
                                   rtol=5e-3, atol=5e-4)
        # warped mean_only still mixes over the latent variance:
        # the mean must be identical to the full call's
        mu_o, none = it(Xs, batch_size=64, mean_only=True)
        assert none is None
        np.testing.assert_allclose(mu_o, mu_i, rtol=1e-6, atol=1e-7)


def test_blocked_linv_matches_single_shot():
    from gp_ss_ak_tpu.serve import blocked_linv

    rng = np.random.default_rng(3)
    A = rng.normal(size=(130, 130))
    L = np.linalg.cholesky(A @ A.T + 130 * np.eye(130))
    Ld = jnp.asarray(L)
    got = np.asarray(blocked_linv(Ld, block=48))  # uneven tail block
    ref = np.asarray(jax.scipy.linalg.solve_triangular(
        Ld, jnp.eye(130, dtype=Ld.dtype), lower=True))
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)
