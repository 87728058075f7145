"""Blocked MXU Cholesky (ops/chol.py) vs the XLA factorization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_ss_ak_tpu.ops.chol import DEFAULT_BLOCK, blocked_cholesky, cholesky


def _spd(n, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, max(n // 4, 3)))
    A = X @ X.T + n * np.eye(n)
    return jnp.asarray(A, dtype)


@pytest.mark.parametrize("n,block", [
    (96, 128),     # passthrough (n <= block)
    (256, 128),    # exact multiple
    (300, 128),    # identity-padded tail
    (1040, 256),   # multi-block + pad
])
def test_blocked_matches_xla(n, block):
    A = _spd(n)
    L = blocked_cholesky(A, block=block)
    Lref = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lref),
                               rtol=1e-10, atol=1e-9)
    # strictly lower result: upper triangle is exactly zero
    assert not np.any(np.triu(np.asarray(L), 1))


def test_blocked_under_jit_and_reconstruction():
    A = _spd(520, seed=3)
    L = jax.jit(lambda a: blocked_cholesky(a, block=128))(A)
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(A),
                               rtol=1e-9, atol=1e-8)


def test_nan_propagation_on_indefinite():
    A = _spd(260, seed=1) - 10_000.0 * jnp.eye(260)  # indefinite
    L = blocked_cholesky(A, block=128)
    # the reference's Chol_fail protocol: failure surfaces as NaN
    assert np.isnan(np.asarray(L)).any()
    assert np.isnan(float(jnp.sum(jnp.log(jnp.diagonal(L)))))


def test_gradients_match_xla_cholesky():
    # The two factorizations distribute the cotangent differently
    # between the triangles (blocked reads only the lower panel); the
    # SYMMETRIZED gradient — the only part that matters, since every A
    # in the framework is a symmetric function of the hypers — must
    # match exactly.
    A = _spd(272, seed=2)

    def half_logdet(chol_fn, A):
        return jnp.sum(jnp.log(jnp.diagonal(chol_fn(A))))

    g_blk = jax.grad(lambda a: half_logdet(
        lambda m: blocked_cholesky(m, block=128), a))(A)
    g_ref = jax.grad(lambda a: half_logdet(jnp.linalg.cholesky, a))(A)
    sym = lambda g: (np.asarray(g) + np.asarray(g).T) / 2
    np.testing.assert_allclose(sym(g_blk), sym(g_ref),
                               rtol=1e-8, atol=1e-10)

    # end-to-end: NLML hyper-gradient is finite & finite-diff-consistent
    # through the dispatcher path
    from gp_ss_ak_tpu.inference.gaussian import nlml
    from gp_ss_ak_tpu.model import default_model

    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.uniform(-1, 1, (60, 3)))
    y = jnp.asarray(np.sin(2 * np.asarray(X).sum(1)))
    m = default_model(3)
    g = jax.grad(lambda kp: nlml(m.kernel, kp, m.lik_hypers, X, y))(
        m.kernel_params)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(g))


def test_dispatcher_cpu_uses_xla():
    A = _spd(64)
    np.testing.assert_allclose(np.asarray(cholesky(A)),
                               np.asarray(jnp.linalg.cholesky(A)))
    assert DEFAULT_BLOCK >= 128
