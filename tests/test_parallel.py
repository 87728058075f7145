"""Distributed block Cholesky / NLML / prediction on a simulated
8-device CPU mesh — the same shard_map code paths that run on a TPU
slice (SURVEY.md §4.3)."""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from gp_ss_ak_tpu.inference import Gaussian, nlml as dense_nlml, predict
from gp_ss_ak_tpu.kernels import Bias, ExpAns, Sum
from gp_ss_ak_tpu.model import default_model
from gp_ss_ak_tpu.parallel import (
    ROW_AXIS,
    block_cholesky_local,
    make_dist_nlml_and_grad,
    make_dist_predict,
    make_mesh,
    shard_training_data,
    solve_chol_local,
    tri_solve_lower_local,
    tri_solve_upper_local,
)

RNG = np.random.default_rng(5)
NB = 8  # small block size for tests


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def spd_matrix(n):
    B = RNG.normal(size=(n, n))
    return B @ B.T + n * np.eye(n)


def row_shard(mesh, M):
    return jax.device_put(jnp.asarray(M), NamedSharding(mesh, P(ROW_AXIS)))


class TestBlockCholesky:
    def test_matches_dense(self, mesh):
        n = 64
        A = spd_matrix(n)

        def body(A_local):
            L, hld = block_cholesky_local(A_local, NB)
            return L, hld

        L, hld = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P(ROW_AXIS, None),),
            out_specs=(P(ROW_AXIS, None), P())))(row_shard(mesh, A))
        L_dense = np.linalg.cholesky(A)
        np.testing.assert_allclose(np.asarray(L), L_dense, rtol=1e-8,
                                   atol=1e-8)
        assert float(hld) == pytest.approx(
            np.log(np.diag(L_dense)).sum(), rel=1e-10)

    def test_solves_match_dense(self, mesh):
        n = 64
        A = spd_matrix(n)
        Bm = RNG.normal(size=(n, 5))

        def body(A_local, B_local):
            L, _ = block_cholesky_local(A_local, NB)
            Zl = tri_solve_lower_local(L, B_local, NB)
            Zu = tri_solve_upper_local(L, Zl, NB)
            Zc = solve_chol_local(L, B_local, NB)
            return Zl, Zu, Zc

        Zl, Zu, Zc = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(ROW_AXIS, None), P(ROW_AXIS, None)),
            out_specs=(P(ROW_AXIS, None),) * 3))(
                row_shard(mesh, A), row_shard(mesh, Bm))
        Ld = np.linalg.cholesky(A)
        Zl_d = np.linalg.solve(Ld, Bm)
        np.testing.assert_allclose(np.asarray(Zl), Zl_d, rtol=1e-7,
                                   atol=1e-8)
        Zfull = np.linalg.solve(A, Bm)
        np.testing.assert_allclose(np.asarray(Zu), Zfull, rtol=1e-7,
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(Zc), Zfull, rtol=1e-7,
                                   atol=1e-8)


class TestDistNLML:
    def make_problem(self, n=50, d=3):
        X = RNG.normal(size=(n, d))
        y = np.sin(X[:, 0]) + 0.1 * RNG.normal(size=n)
        model = default_model(input_dim=d, dtype=jnp.float64)
        return model, X.astype(np.float64), y.astype(np.float64)

    def test_value_and_grad_match_dense(self, mesh):
        model, X, y = self.make_problem()
        Xs, ys, n, n_pad = shard_training_data(mesh, X, y, nb=NB)
        f = make_dist_nlml_and_grad(model.kernel, model.likelihood, mesh,
                                    n=n, nb=NB)
        flat = model.pack()
        val, grad = f(flat, Xs, ys)

        # dense oracle through the single-device path
        from gp_ss_ak_tpu.optim import make_value_and_grad
        vg = make_value_and_grad(model, X, y)
        v_dense, g_dense = vg(np.asarray(flat))
        assert float(val) == pytest.approx(v_dense, rel=1e-8)
        np.testing.assert_allclose(np.asarray(grad), g_dense, rtol=1e-6,
                                   atol=1e-8)

    def test_fused_panel_matches_generic(self, mesh):
        """fused=True routes the row panel through the Pallas fused
        cross-Gram (interpret mode on CPU); value and grad must agree
        with the generic XLA panel build (VERDICT r1 #3)."""
        model, X, y = self.make_problem(n=40)
        Xs, ys, n, _ = shard_training_data(mesh, X, y, nb=NB)
        f_gen = make_dist_nlml_and_grad(model.kernel, model.likelihood,
                                        mesh, n=n, nb=NB, fused=False)
        f_fus = make_dist_nlml_and_grad(model.kernel, model.likelihood,
                                        mesh, n=n, nb=NB, fused=True)
        flat = model.pack()
        v1, g1 = f_gen(flat, Xs, ys)
        v2, g2 = f_fus(flat, Xs, ys)
        assert float(v1) == pytest.approx(float(v2), rel=1e-9)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-6, atol=1e-9)

    def test_fused_requires_flagship(self, mesh):
        from gp_ss_ak_tpu.kernels import RBF

        with pytest.raises(ValueError, match="flagship"):
            make_dist_nlml_and_grad(RBF(), Gaussian(), mesh, n=32,
                                    nb=NB, fused=True)

    def test_padding_invariance(self, mesh):
        # same answer for n=50 (padded to 64) and n=64-with-junk-rows
        model, X, y = self.make_problem(n=50)
        Xs, ys, n, n_pad = shard_training_data(mesh, X, y, nb=NB)
        assert n_pad == 64
        f = make_dist_nlml_and_grad(model.kernel, model.likelihood, mesh,
                                    n=50, nb=NB)
        v1, _ = f(model.pack(), Xs, ys)
        # poison the padded rows — they must not affect the result
        Xp = np.asarray(Xs).copy()
        Xp[50:] = 1e3
        Xs2 = jax.device_put(Xp, NamedSharding(mesh, P(ROW_AXIS)))
        v2, _ = f(model.pack(), Xs2, ys)
        assert float(v1) == pytest.approx(float(v2), rel=1e-10)

    def test_predict_matches_dense(self, mesh):
        model, X, y = self.make_problem(n=40)
        Xstar = RNG.normal(size=(7, 3))
        Xs, ys, n, _ = shard_training_data(mesh, X, y, nb=NB)
        fp = make_dist_predict(model.kernel, model.likelihood, mesh,
                               n=n, nb=NB)
        mu, var = fp(model.pack(), Xs, ys, jnp.asarray(Xstar))
        mu_d, var_d = predict(model.kernel, model.kernel_params,
                              model.lik_hypers, jnp.asarray(X),
                              jnp.asarray(y), jnp.asarray(Xstar),
                              model.likelihood)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_d),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(var), np.asarray(var_d),
                                   rtol=1e-6, atol=1e-9)


class TestMultiBlockPerDevice:
    """nb < n_local exercises nonzero in-shard block offsets — a
    different region of the owner-selection logic than 1 block/device."""

    def test_chol_solve_nlml_with_two_blocks_per_device(self, mesh):
        n = 128  # 8 devices x 16 rows, nb=8 -> 2 blocks each
        A = spd_matrix(n)
        Bm = RNG.normal(size=(n, 3))

        def body(A_local, B_local):
            L, hld = block_cholesky_local(A_local, 8)
            Z = solve_chol_local(L, B_local, 8)
            return L, hld, Z

        L, hld, Z = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(ROW_AXIS, None), P(ROW_AXIS, None)),
            out_specs=(P(ROW_AXIS, None), P(), P(ROW_AXIS, None))))(
                row_shard(mesh, A), row_shard(mesh, Bm))
        Ld = np.linalg.cholesky(A)
        np.testing.assert_allclose(np.asarray(L), Ld, atol=1e-9)
        np.testing.assert_allclose(np.asarray(Z), np.linalg.solve(A, Bm),
                                   atol=1e-9)

        model = default_model(input_dim=3, dtype=jnp.float64)
        X = RNG.normal(size=(100, 3))
        y = np.sin(X[:, 0])
        Xs, ys, ntrue, _ = shard_training_data(mesh, X, y, nb=8)
        f = make_dist_nlml_and_grad(model.kernel, model.likelihood, mesh,
                                    n=ntrue, nb=8)
        v, g = f(model.pack(), Xs, ys)
        from gp_ss_ak_tpu.optim import make_value_and_grad
        vd, gd = make_value_and_grad(model, X, y)(np.asarray(model.pack()))
        assert float(v) == pytest.approx(vd, rel=1e-10)
        np.testing.assert_allclose(np.asarray(g), gd, rtol=1e-8, atol=1e-10)


class TestFitDistributed:
    """End-to-end distributed training driver (VERDICT r1 #5)."""

    def test_converges_to_single_device_optimum(self, mesh):
        from gp_ss_ak_tpu.optim import fit
        from gp_ss_ak_tpu.parallel import fit_distributed

        n = 48
        X = np.linspace(-1, 1, n).reshape(-1, 1).astype(np.float64)
        y = np.sin(3 * X[:, 0])
        model = default_model(input_dim=1, dtype=jnp.float64)
        fitted_d, res_d = fit_distributed(model, X, y, mesh, nb=NB,
                                          iters=40)
        fitted_s, res_s = fit(model, X, y, iters=40)
        # identical objective + identical optimizer -> same optimum
        assert res_d.fun == pytest.approx(res_s.fun, rel=1e-5, abs=1e-5)
        np.testing.assert_allclose(np.asarray(fitted_d.pack()),
                                   np.asarray(fitted_s.pack()),
                                   rtol=1e-3, atol=1e-3)

    def _warped_model(self, family="tanh1"):
        from dataclasses import replace

        from gp_ss_ak_tpu.inference import WarpedGaussian

        model = default_model(input_dim=3, dtype=jnp.float64)
        wlik = WarpedGaussian(family=family, n_triplets=1)
        return replace(
            model, likelihood=wlik,
            lik_hypers=jnp.asarray(wlik.default_hypers(jnp.float64)))

    @pytest.mark.parametrize("family", ["tanh1", "rbf"])
    def test_warped_value_and_grad_match_dense(self, mesh, family):
        """WarpedGaussian is genuinely supported in the distributed
        objective (VERDICT r1 #5): value AND gradient (incl. the warp
        hypers, via alpha' dgy - sum dlog g') match the single-device
        path."""
        from gp_ss_ak_tpu.optim import make_value_and_grad

        wmodel = self._warped_model(family)
        n = 40
        X = RNG.normal(size=(n, 3))
        y = np.sin(X[:, 0]) + 0.1 * RNG.normal(size=n)
        Xs, ys, ntrue, _ = shard_training_data(mesh, X, y, nb=NB)
        f = make_dist_nlml_and_grad(wmodel.kernel, wmodel.likelihood,
                                    mesh, n=ntrue, nb=NB)
        flat = wmodel.pack()
        v, g = f(flat, Xs, ys)
        vg = make_value_and_grad(wmodel, X, y)
        v_d, g_d = vg(np.asarray(flat))
        assert float(v) == pytest.approx(v_d, rel=1e-8)
        np.testing.assert_allclose(np.asarray(g), g_d, rtol=1e-6,
                                   atol=1e-8)

    def test_warped_fit_distributed_runs(self, mesh):
        from gp_ss_ak_tpu.parallel import fit_distributed

        wmodel = self._warped_model()
        n = 32
        X = RNG.normal(size=(n, 3))
        y = np.sin(X[:, 0])
        fitted, res = fit_distributed(wmodel, X, y, mesh, nb=NB,
                                      iters=8)
        assert np.isfinite(res.fun)
        assert res.fun <= res.trace[0] + 1e-9


class TestTwoLevelMesh:
    """(chains x dp) mesh: independent hyper vectors per chain, kernel
    matrix row-sharded within a chain (parallel/multihost.py docs)."""

    def test_two_level_nlml_matches_per_chain_dense(self):
        from jax.sharding import Mesh

        from gp_ss_ak_tpu.optim import make_value_and_grad
        from gp_ss_ak_tpu.parallel import make_two_level_nlml_and_grad
        from gp_ss_ak_tpu.parallel.mesh import pad_rows

        devs = np.array(jax.devices()[:8]).reshape(2, 4)
        mesh2 = Mesh(devs, ("chains", ROW_AXIS))
        n, d = 36, 3
        X = RNG.normal(size=(n, d))
        y = np.sin(X[:, 0])
        model = default_model(input_dim=d, dtype=jnp.float64)

        n_pad = pad_rows(n, 4, NB)
        Xp = np.zeros((n_pad, d))
        Xp[:n] = X
        yp = np.zeros(n_pad)
        yp[:n] = y
        Xs = jax.device_put(jnp.asarray(Xp),
                            NamedSharding(mesh2, P(ROW_AXIS, None)))
        ys = jax.device_put(jnp.asarray(yp),
                            NamedSharding(mesh2, P(ROW_AXIS)))

        f2 = make_two_level_nlml_and_grad(model.kernel, model.likelihood,
                                          mesh2, n=n, nb=NB)
        flat0 = np.asarray(model.pack())
        flat1 = np.clip(flat0 * 1.3, 1e-4, 6.0)
        flats = jax.device_put(
            jnp.asarray(np.stack([flat0, flat1])),
            NamedSharding(mesh2, P("chains", None)))
        vals, grads = f2(flats, Xs, ys)

        vg = make_value_and_grad(model, X, y)
        for c, fl in enumerate([flat0, flat1]):
            v_d, g_d = vg(fl)
            assert float(vals[c]) == pytest.approx(v_d, rel=1e-8)
            np.testing.assert_allclose(np.asarray(grads[c]), g_d,
                                       rtol=1e-6, atol=1e-8)

    def test_two_level_warped_matches_per_chain_dense(self):
        """The two-level path must forward the likelihood: a
        WarpedGaussian chain gets the warped objective (warp +
        Jacobian + exp(2 theta) noise, GP_Utils.cpp:417-430), not a
        silent Gaussian fallback (VERDICT r2 weak #2)."""
        from dataclasses import replace

        from jax.sharding import Mesh

        from gp_ss_ak_tpu.inference import WarpedGaussian
        from gp_ss_ak_tpu.optim import make_value_and_grad
        from gp_ss_ak_tpu.parallel import make_two_level_nlml_and_grad
        from gp_ss_ak_tpu.parallel.mesh import pad_rows

        devs = np.array(jax.devices()[:8]).reshape(2, 4)
        mesh2 = Mesh(devs, ("chains", ROW_AXIS))
        n, d = 36, 3
        X = RNG.normal(size=(n, d))
        y = np.sin(X[:, 0]) + 0.1 * RNG.normal(size=n)
        model = default_model(input_dim=d, dtype=jnp.float64)
        wlik = WarpedGaussian(family="tanh1", n_triplets=1)
        wmodel = replace(
            model, likelihood=wlik,
            lik_hypers=jnp.asarray(wlik.default_hypers(jnp.float64)))

        n_pad = pad_rows(n, 4, NB)
        Xp = np.zeros((n_pad, d))
        Xp[:n] = X
        yp = np.zeros(n_pad)
        yp[:n] = y
        Xs = jax.device_put(jnp.asarray(Xp),
                            NamedSharding(mesh2, P(ROW_AXIS, None)))
        ys = jax.device_put(jnp.asarray(yp),
                            NamedSharding(mesh2, P(ROW_AXIS)))

        f2 = make_two_level_nlml_and_grad(
            wmodel.kernel, wmodel.likelihood, mesh2, n=n, nb=NB)
        flat0 = np.asarray(wmodel.pack())
        flat1 = np.clip(flat0 * 1.2, 1e-4, 6.0)
        flats = jax.device_put(
            jnp.asarray(np.stack([flat0, flat1])),
            NamedSharding(mesh2, P("chains", None)))
        vals, grads = f2(flats, Xs, ys)

        vg = make_value_and_grad(wmodel, X, y)
        for c, fl in enumerate([flat0, flat1]):
            v_d, g_d = vg(fl)
            assert float(vals[c]) == pytest.approx(v_d, rel=1e-8)
            np.testing.assert_allclose(np.asarray(grads[c]), g_d,
                                       rtol=1e-6, atol=1e-8)


class TestHutchinsonGrad:
    """grad_mode='hutchinson': m probe solves instead of the N-RHS
    Q = A^-1 build (VERDICT r1 #2/#4)."""

    def test_value_exact_grad_close_to_exact(self, mesh):
        n, d = 48, 3
        X = RNG.normal(size=(n, d))
        y = np.sin(X[:, 0])
        model = default_model(input_dim=d, dtype=jnp.float64)
        Xs, ys, ntrue, _ = shard_training_data(mesh, X, y, nb=NB)
        f_ex = make_dist_nlml_and_grad(model.kernel, model.likelihood,
                                       mesh, n=ntrue, nb=NB)
        f_hu = make_dist_nlml_and_grad(model.kernel, model.likelihood,
                                       mesh, n=ntrue, nb=NB,
                                       grad_mode="hutchinson",
                                       probes=256)
        flat = model.pack()
        v1, g1 = f_ex(flat, Xs, ys)
        v2, g2 = f_hu(flat, Xs, ys)
        # NLML itself is exact in both modes
        assert float(v1) == pytest.approx(float(v2), rel=1e-10)
        # probe gradient: stochastic but deterministic per seed; with
        # 256 probes at n=48 the relative error is small
        g1, g2 = np.asarray(g1), np.asarray(g2)
        scale = np.maximum(np.abs(g1), 1.0)
        assert np.max(np.abs(g1 - g2) / scale) < 0.15

    def test_deterministic_per_seed(self, mesh):
        n = 32
        X = RNG.normal(size=(n, 3))
        y = np.sin(X[:, 0])
        model = default_model(input_dim=3, dtype=jnp.float64)
        Xs, ys, ntrue, _ = shard_training_data(mesh, X, y, nb=NB)
        f = make_dist_nlml_and_grad(model.kernel, model.likelihood,
                                    mesh, n=ntrue, nb=NB,
                                    grad_mode="hutchinson", probes=16)
        _, ga = f(model.pack(), Xs, ys)
        _, gb = f(model.pack(), Xs, ys)
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


class TestRing:
    """parallel/ring.py — ppermute ring matvec/CG: nothing larger than
    an (n_local, n_local) tile ever exists (long-context analogue,
    SURVEY.md §5)."""

    def _dense_A(self, model, X):
        K = model.kernel.matrix(model.kernel_params, jnp.asarray(X),
                                jnp.asarray(X), same=True)
        sn2 = float(np.asarray(model.lik_hypers)[0])
        return np.asarray(K) + sn2 * np.eye(X.shape[0])

    def test_matvec_matches_dense(self, mesh):
        from gp_ss_ak_tpu.parallel.ring import make_ring_matvec

        n = 50
        X = RNG.normal(size=(n, 3))
        v = RNG.normal(size=n)
        model = default_model(input_dim=3, dtype=jnp.float64)
        Xs, vs, ntrue, n_pad = shard_training_data(mesh, X, v, nb=NB)
        mv = make_ring_matvec(model.kernel, mesh, n=ntrue)
        q = np.asarray(mv(model.pack(), Xs, vs))[:n]
        A = self._dense_A(model, X)
        np.testing.assert_allclose(q, A @ v, rtol=1e-9, atol=1e-9)

    def test_matvec_padding_is_identity(self, mesh):
        from gp_ss_ak_tpu.parallel.ring import make_ring_matvec

        n = 50
        X = RNG.normal(size=(n, 3))
        v = RNG.normal(size=n)
        model = default_model(input_dim=3, dtype=jnp.float64)
        Xs, vs, ntrue, n_pad = shard_training_data(mesh, X, v, nb=NB)
        # poison the padding slots of v: they must pass through as-is
        vp = np.asarray(vs).copy()
        vp[n:] = 7.25
        vs2 = jax.device_put(vp, NamedSharding(mesh, P(ROW_AXIS)))
        mv = make_ring_matvec(model.kernel, mesh, n=ntrue)
        q = np.asarray(mv(model.pack(), Xs, vs2))
        np.testing.assert_allclose(q[n:], 7.25)
        A = self._dense_A(model, X)
        np.testing.assert_allclose(q[:n], A @ v, rtol=1e-9, atol=1e-9)

    def test_cg_matches_dense_solve(self, mesh):
        from gp_ss_ak_tpu.parallel.ring import make_ring_cg_solve

        n = 40
        X = RNG.normal(size=(n, 3))
        y = np.sin(X[:, 0])
        model = default_model(input_dim=3, dtype=jnp.float64)
        Xs, ys, ntrue, _ = shard_training_data(mesh, X, y, nb=NB)
        cg = make_ring_cg_solve(model.kernel, mesh, n=ntrue, tol=1e-10)
        x, it, res = cg(model.pack(), Xs, ys)
        A = self._dense_A(model, X)
        np.testing.assert_allclose(np.asarray(x)[:n],
                                   np.linalg.solve(A, y),
                                   rtol=1e-6, atol=1e-8)
        assert int(it) < 1000

    def test_posterior_mean_matches_dense(self, mesh):
        from gp_ss_ak_tpu.parallel.ring import make_ring_posterior_mean

        n, m = 40, 6
        X = RNG.normal(size=(n, 3))
        y = np.sin(X[:, 0])
        Xq = RNG.normal(size=(m, 3))
        model = default_model(input_dim=3, dtype=jnp.float64)
        Xs, ys, ntrue, _ = shard_training_data(mesh, X, y, nb=NB)
        pm = make_ring_posterior_mean(model.kernel, mesh, n=ntrue,
                                      tol=1e-10)
        mu, it, res = pm(model.pack(), Xs, ys, jnp.asarray(Xq))
        mu_d, _ = predict(model.kernel, model.kernel_params,
                          model.lik_hypers, jnp.asarray(X),
                          jnp.asarray(y), jnp.asarray(Xq),
                          model.likelihood)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_d),
                                   rtol=1e-6, atol=1e-8)


class TestRingPivchol:
    """The two ring preconditioner builds must agree: the gathered
    (replicated, latency-free) build is the default inside the budget,
    the per-step distributed build is the fallback past it — a silent
    divergence between them would make the preconditioner (and hence
    every CG trip count) depend on the memory budget."""

    def test_gathered_matches_distributed(self, mesh):
        from gp_ss_ak_tpu.parallel.ring import (
            _mapped_local,
            _ring_pivoted_chol,
            _ring_pivoted_chol_gathered,
        )
        from gp_ss_ak_tpu.parallel.mesh import ROW_AXIS as AX

        n, rank = 53, 12
        X = RNG.normal(size=(n, 3))
        y = np.zeros(n)
        model = default_model(input_dim=3, dtype=jnp.float64)
        Xs, _ys, ntrue, n_pad = shard_training_data(mesh, X, y, nb=NB)
        flat = model.pack()
        nk = model.kernel.n_params
        kernel = model.kernel

        def body(which, flat, X_local):
            params = kernel.unpack(flat[:nk])
            ep, bp = params
            sigma, bias = ep["Sigma"], bp["Sigma"]
            Xm, g, rv = _mapped_local(kernel, params, X_local, ntrue,
                                      AX)
            fn = (_ring_pivoted_chol_gathered if which == "g"
                  else _ring_pivoted_chol)
            return fn(Xm, rv, g, sigma, bias, rank, n_pad, AX)

        outs = {}
        for which in ("g", "d"):
            mapped = jax.shard_map(
                functools.partial(body, which), mesh=mesh,
                in_specs=(P(), P(ROW_AXIS)), out_specs=P(ROW_AXIS))
            outs[which] = np.asarray(jax.jit(mapped)(flat, Xs))
        np.testing.assert_allclose(outs["g"], outs["d"],
                                   rtol=1e-9, atol=1e-10)
        # and both reconstruct K on the valid block reasonably
        K = np.asarray(kernel.matrix(model.kernel_params,
                                     jnp.asarray(X), jnp.asarray(X),
                                     same=True))
        L = outs["g"][:n]
        assert np.linalg.norm(K - L @ L.T) / np.linalg.norm(K) < 0.5


class TestRingTraining:
    """make_ring_nlml_and_grad / fit_ring — the training route past
    the row-panel wall (VERDICT r2 #4): value from ring PCG +
    preconditioned SLQ, gradient differentiated through the ring tile
    build."""

    def test_ring_nlml_value_matches_dense_2k(self, mesh):
        from gp_ss_ak_tpu.optim import make_value_and_grad
        from gp_ss_ak_tpu.parallel import make_ring_nlml_and_grad

        n = 2048
        rng = np.random.default_rng(42)
        X = rng.normal(size=(n, 3))
        y = np.sin(X[:, 0]) + 0.1 * rng.normal(size=n)
        model = default_model(input_dim=3, dtype=jnp.float64)
        Xs, ys, ntrue, _ = shard_training_data(mesh, X, y, nb=NB)
        f = make_ring_nlml_and_grad(model.kernel, mesh, n=ntrue,
                                    precond_rank=64, probes=8,
                                    slq_probes=32, lanczos_iters=32,
                                    cg_tol=1e-8, cg_maxiter=800)
        v, g = f(model.pack(), Xs, ys)
        vg = make_value_and_grad(model, X, y)
        v_d, _g_d = vg(np.asarray(model.pack()))
        # fit term exact (tight CG); logdet via preconditioned SLQ —
        # the estimator lands within 1% of the dense NLML
        assert abs(float(v) - v_d) / abs(v_d) < 0.01, (float(v), v_d)
        assert np.isfinite(np.asarray(g)).all()

    def test_pick_chunk_divides(self):
        from gp_ss_ak_tpu.parallel.ring import _pick_chunk

        # tile panels must align exactly: chunk | n_local, chunk <= want
        for n_local, want in ((65536, 4096), (100096, 4096),
                              (12512, 4096), (8, 4096), (391, 100)):
            c = _pick_chunk(n_local, want)
            assert n_local % c == 0 and c <= max(want, 1) \
                and c >= 1, (n_local, want, c)
        assert _pick_chunk(100096, 4096) == 3128    # 2^3 * 17 * 23 * 32

    def test_ring_chunked_tiles_match_unchunked(self, mesh):
        """tile_chunk must be a pure memory knob: value, grad, AND
        stats identical (same program math) whether the visiting
        block is processed whole or in panels."""
        from gp_ss_ak_tpu.parallel import make_ring_nlml_and_grad

        n = 96
        X = RNG.normal(size=(n, 3))
        y = np.sin(X[:, 0])
        model = default_model(input_dim=3, dtype=jnp.float64)
        Xs, ys, ntrue, _ = shard_training_data(mesh, X, y, nb=NB)
        outs = []
        for chunk in (None, 4):        # n_local = 16 -> 4 panels
            f = make_ring_nlml_and_grad(
                model.kernel, mesh, n=ntrue, precond_rank=16,
                probes=4, slq_probes=8, lanczos_iters=16,
                cg_tol=1e-10, cg_maxiter=400, with_stats=True,
                tile_chunk=chunk)
            v, g, st = f(model.pack(), Xs, ys)
            outs.append((float(v), np.asarray(g), np.asarray(st)))
        (v0, g0, s0), (v1, g1, s1) = outs
        np.testing.assert_allclose(v1, v0, rtol=1e-12)
        np.testing.assert_allclose(g1, g0, rtol=1e-9, atol=1e-11)
        assert s1[0] == s0[0]                      # same CG trip count
        # achieved residual: accumulation ORDER differs between the
        # panel loop and the whole-tile matmul, and both solves bottom
        # out at the fp floor (~1e-10 here) where relative wiggle is
        # pure noise — check both converged far past tolerance and
        # agree to within the floor's jitter
        assert s0[1] < 1e-8 and s1[1] < 1e-8
        np.testing.assert_allclose(s1[1], s0[1], rtol=0.25)

    def test_ring_grad_matches_dense_small(self, mesh):
        from gp_ss_ak_tpu.optim import make_value_and_grad
        from gp_ss_ak_tpu.parallel import make_ring_nlml_and_grad

        n = 96
        rng = np.random.default_rng(42)
        X = rng.normal(size=(n, 3))
        y = np.sin(X[:, 0])
        model = default_model(input_dim=3, dtype=jnp.float64)
        Xs, ys, ntrue, _ = shard_training_data(mesh, X, y, nb=NB)
        f = make_ring_nlml_and_grad(model.kernel, mesh, n=ntrue,
                                    precond_rank=48, probes=256,
                                    slq_probes=16, lanczos_iters=24,
                                    cg_tol=1e-10, cg_maxiter=2000)
        _v, g = f(model.pack(), Xs, ys)
        vg = make_value_and_grad(model, X, y)
        _vd, g_d = vg(np.asarray(model.pack()))
        g = np.asarray(g)
        # Hutchinson trace estimator: 256 probes -> small relative
        # error on every component (same contract as
        # TestHutchinsonGrad.test_value_exact_grad_close_to_exact)
        scale = np.maximum(np.abs(g_d), 1.0)
        assert np.max(np.abs(g - g_d) / scale) < 0.15, (g, g_d)

    def test_ring_grad_deterministic_per_seed(self, mesh):
        from gp_ss_ak_tpu.parallel import make_ring_nlml_and_grad

        n = 48
        rng = np.random.default_rng(42)
        X = rng.normal(size=(n, 3))
        y = np.sin(X[:, 0])
        model = default_model(input_dim=3, dtype=jnp.float64)
        Xs, ys, ntrue, _ = shard_training_data(mesh, X, y, nb=NB)
        f = make_ring_nlml_and_grad(model.kernel, mesh, n=ntrue,
                                    precond_rank=16, probes=8,
                                    slq_probes=8, lanczos_iters=16)
        v1, g1 = f(model.pack(), Xs, ys)
        v2, g2 = f(model.pack(), Xs, ys)
        assert float(v1) == float(v2)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))

    def test_fit_ring_improves_objective(self, mesh):
        from gp_ss_ak_tpu.parallel import fit_ring

        n = 64
        rng = np.random.default_rng(42)
        X = rng.normal(size=(n, 3))
        y = np.sin(X[:, 0])
        model = default_model(input_dim=3, dtype=jnp.float64)
        fitted, res = fit_ring(model, X, y, mesh, nb=NB, iters=6,
                               precond_rank=16, probes=8, slq_probes=8,
                               lanczos_iters=16)
        assert np.isfinite(res.fun)
        assert res.fun <= res.trace[0] + 1e-9
        assert fitted.num_data == n


class TestMultihost:
    def test_initialize_noop_without_coordinator(self, monkeypatch):
        from gp_ss_ak_tpu.parallel import multihost

        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        assert multihost.initialize() is None  # single-process no-op

    def test_two_level_mesh_shape(self):
        from gp_ss_ak_tpu.parallel.multihost import two_level_mesh

        mesh = two_level_mesh(rows_per_host=4)
        assert mesh.axis_names == ("chains", "dp")
        assert mesh.devices.shape == (2, 4)  # 8 sim devices / 4


class TestWarpedDistPredict:
    def test_matches_dense_warped_prediction(self, mesh):
        from dataclasses import replace

        from gp_ss_ak_tpu.inference import WarpedGaussian

        model = default_model(input_dim=3, dtype=jnp.float64)
        wlik = WarpedGaussian(family="tanh1", n_triplets=1)
        wmodel = replace(
            model, likelihood=wlik,
            lik_hypers=jnp.asarray(wlik.default_hypers(jnp.float64)))
        n, m = 40, 5
        X = RNG.normal(size=(n, 3))
        y = np.sin(X[:, 0]) + 0.1 * RNG.normal(size=n)
        Xq = RNG.normal(size=(m, 3))
        Xs, ys, ntrue, _ = shard_training_data(mesh, X, y, nb=NB)
        fp = make_dist_predict(wmodel.kernel, wmodel.likelihood, mesh,
                               n=ntrue, nb=NB)
        mu, var = fp(wmodel.pack(), Xs, ys, jnp.asarray(Xq))
        mu_d, var_d = predict(wmodel.kernel, wmodel.kernel_params,
                              wmodel.lik_hypers, jnp.asarray(X),
                              jnp.asarray(y), jnp.asarray(Xq),
                              wmodel.likelihood)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_d),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(var), np.asarray(var_d),
                                   rtol=1e-5, atol=1e-8)


class TestRingPredict:
    def test_mean_and_var_match_dense(self, mesh):
        """make_ring_predict: panel-free mean AND variance via one
        ring batched PCG — k** - kX' A^-1 kX equals the whitened-solve
        variance (GP_Utils.cpp:973-1004) without any factorization."""
        from gp_ss_ak_tpu.parallel import make_ring_predict

        rng = np.random.default_rng(42)
        n, m = 48, 7
        X = rng.normal(size=(n, 3))
        y = np.sin(X[:, 0])
        Xq = rng.normal(size=(m, 3))
        model = default_model(input_dim=3, dtype=jnp.float64)
        Xs, ys, ntrue, _ = shard_training_data(mesh, X, y, nb=NB)
        fp = make_ring_predict(model.kernel, mesh, n=ntrue, tol=1e-11,
                               maxiter=3000, precond_rank=16)
        mu, var = fp(model.pack(), Xs, ys, jnp.asarray(Xq))
        mu_d, var_d = predict(model.kernel, model.kernel_params,
                              model.lik_hypers, jnp.asarray(X),
                              jnp.asarray(y), jnp.asarray(Xq),
                              model.likelihood)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_d),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(var), np.asarray(var_d),
                                   rtol=1e-5, atol=1e-7)


class TestTwoLevelRing:
    def test_matches_per_chain_single_level_ring(self):
        """Two-level ring (chains x dp): each chain's value/grad must
        equal the single-level ring on the dp-sized mesh with the same
        probe seed — the chain axis adds no collectives to the ring."""
        from jax.sharding import Mesh

        from gp_ss_ak_tpu.parallel import (
            make_ring_nlml_and_grad,
            make_two_level_ring_nlml_and_grad,
        )
        from gp_ss_ak_tpu.parallel.mesh import pad_rows

        rng = np.random.default_rng(11)
        n, d = 40, 3
        X = rng.normal(size=(n, d))
        y = np.sin(X[:, 0])
        model = default_model(input_dim=d, dtype=jnp.float64)
        opts = dict(precond_rank=16, probes=8, slq_probes=8,
                    lanczos_iters=16, cg_tol=1e-10, cg_maxiter=2000)

        devs = np.array(jax.devices()[:8]).reshape(2, 4)
        mesh2 = Mesh(devs, ("chains", ROW_AXIS))
        n_pad = pad_rows(n, 4, NB)
        Xp = np.zeros((n_pad, d))
        Xp[:n] = X
        yp = np.zeros(n_pad)
        yp[:n] = y
        Xs2 = jax.device_put(jnp.asarray(Xp),
                             NamedSharding(mesh2, P(ROW_AXIS, None)))
        ys2 = jax.device_put(jnp.asarray(yp),
                             NamedSharding(mesh2, P(ROW_AXIS)))
        f2 = make_two_level_ring_nlml_and_grad(model.kernel, mesh2,
                                               n=n, **opts)
        flat0 = np.asarray(model.pack())
        flat1 = np.clip(flat0 * 1.25, 1e-4, 6.0)
        flats = jax.device_put(
            jnp.asarray(np.stack([flat0, flat1])),
            NamedSharding(mesh2, P("chains", None)))
        vals, grads = f2(flats, Xs2, ys2)

        mesh1 = make_mesh(4)
        Xs1, ys1, ntrue, _ = shard_training_data(mesh1, X, y, nb=NB)
        f1 = make_ring_nlml_and_grad(model.kernel, mesh1, n=ntrue,
                                     **opts)
        for c, fl in enumerate([flat0, flat1]):
            v1, g1 = f1(jnp.asarray(fl), Xs1, ys1)
            assert float(vals[c]) == pytest.approx(float(v1),
                                                   rel=1e-10)
            np.testing.assert_allclose(np.asarray(grads[c]),
                                       np.asarray(g1),
                                       rtol=1e-9, atol=1e-12)
