"""Serving: factor once, predict many (batched, HBM-bandwidth path).

The reference's test mode rebuilds alpha/chol from scratch on every
invocation (gp_ss_ak.cpp:382-395). The Predictor here factors the
training posterior ONCE, keeps (alpha, L) on device, and serves
posterior mean/variance for arbitrary batches of query points — each
batch is one cross-Gram (fused Pallas kernel on TPU) + one triangular
solve, both streaming at memory bandwidth for large N.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gp_ss_ak_tpu.inference import gaussian
from gp_ss_ak_tpu.model import GPModel

class Predictor:
    """Posterior server for one trained model + training set."""

    #: above this training size the one-time L^-1 (an extra n x n
    #: buffer + one n-RHS triangular solve) is not precomputed by
    #: default — pass precompute_inverse=True to override.
    PRECOMPUTE_MAX_N = 16384

    def __init__(self, model: GPModel, X, y, jitter: float = 0.0,
                 robust: bool = False, fused: bool = None,
                 precompute_inverse: Optional[bool] = None):
        self.model = model
        dtype = jnp.result_type(model.pack())
        self.X = jnp.asarray(X, dtype)
        self.y = jnp.asarray(y, dtype)
        # single assembly path: gaussian.factorize owns the fused-A /
        # warp / jitter-retry logic (robust=True adds the escalating
        # diagonal nugget instead of propagating NaN)
        self.post = gaussian.factorize(
            model.kernel, model.kernel_params, model.lik_hypers,
            self.X, self.y, model.likelihood, jitter, fused,
            robust=robust)
        self.nugget = (self.post.nugget if self.post.nugget is not None
                       else jnp.zeros((), dtype))

        if precompute_inverse is None:
            precompute_inverse = self.X.shape[0] <= self.PRECOMPUTE_MAX_N
        if precompute_inverse:
            # one-time L^-1 so each serving batch's whitened solve is a
            # single MXU GEMM instead of a triangular solve
            eye = jnp.eye(self.X.shape[0], dtype=dtype)
            with jax.default_matmul_precision("highest"):
                linv = jax.scipy.linalg.solve_triangular(
                    self.post.chol, eye, lower=True)
            self.post = self.post._replace(linv=linv)

        self._predict = jax.jit(
            lambda Xs: gaussian.posterior_mean_var(
                model.kernel, model.kernel_params, model.lik_hypers,
                self.X, self.post, Xs, model.likelihood))

    def __call__(self, Xstar, batch_size: Optional[int] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
        dtype = self.X.dtype
        Xs = np.asarray(Xstar)
        if batch_size is None or Xs.shape[0] <= batch_size:
            mu, var = self._predict(jnp.asarray(Xs, dtype))
            return np.asarray(mu), np.asarray(var)
        mus, vars_ = [], []
        # fixed-size batches (pad the tail) so one compiled program
        # serves every chunk
        m = Xs.shape[0]
        for start in range(0, m, batch_size):
            chunk = Xs[start : start + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(
                    chunk[-1:], pad, axis=0)])
            mu, var = self._predict(jnp.asarray(chunk, dtype))
            take = batch_size - pad
            mus.append(np.asarray(mu)[:take])
            vars_.append(np.asarray(var)[:take])
        return np.concatenate(mus), np.concatenate(vars_)
