"""Batched multi-deposit GP ensembles (BASELINE.json config 5).

Hundreds of INDEPENDENT GPs (one per ore deposit / domain) share one
compiled program: fitting is `vmap` of the fully-jittable L-BFGS
(optim/jax_lbfgs.py) over a leading batch axis, prediction is vmap of
the exact posterior. Sharding the batch axis over a mesh spreads
deposits across the pod — no cross-GP communication exists, so
scaling is embarrassingly linear.

All GPs must share (n, d, m) shapes — pad ragged deposits upstream
with repeated rows + zero-weight targets if needed.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gp_ss_ak_tpu.inference import gaussian
from gp_ss_ak_tpu.model import GPModel
from gp_ss_ak_tpu.optim import jax_lbfgs
from gp_ss_ak_tpu.optim.api import flat_nlml_fn
from gp_ss_ak_tpu.optim.lbfgsb import DEFAULT_LOWER, DEFAULT_UPPER


class EnsembleFit(NamedTuple):
    flat: jnp.ndarray      # (B, p) fitted hypers per deposit
    fun: jnp.ndarray       # (B,) final NLML
    n_iters: jnp.ndarray   # (B,)
    converged: jnp.ndarray


def fit_ensemble(model: GPModel, Xb, yb, maxiter: int = 100,
                 lower: Optional[np.ndarray] = None,
                 upper: Optional[np.ndarray] = None,
                 mesh=None) -> EnsembleFit:
    """Fit B independent GPs: Xb (B, n, d), yb (B, n)."""
    dtype = jnp.result_type(model.pack())
    Xb = jnp.asarray(Xb, dtype)
    yb = jnp.asarray(yb, dtype)
    p = model.n_params
    lb = jnp.asarray(lower if lower is not None
                     else np.full(p, DEFAULT_LOWER), dtype)
    ub = jnp.asarray(upper if upper is not None
                     else np.full(p, DEFAULT_UPPER), dtype)
    f = flat_nlml_fn(model)
    flat0 = model.pack()

    def fit_one(X, y):
        vg = jax.value_and_grad(lambda t: f(t, X, y))
        res = jax_lbfgs.minimize(vg, flat0, lb, ub, maxiter=maxiter)
        return res.x, res.fun, res.n_iters, res.converged

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ax = mesh.axis_names[0]
        sh = NamedSharding(mesh, P(ax))
        Xb = jax.device_put(Xb, sh)
        yb = jax.device_put(yb, sh)
    xs, funs, its, conv = jax.jit(jax.vmap(fit_one))(Xb, yb)
    return EnsembleFit(xs, funs, its, conv)


def predict_ensemble(model: GPModel, fit: EnsembleFit, Xb, yb, Xstar_b):
    """Posterior mean/var per deposit: Xstar_b (B, m, d) ->
    mu (B, m), var (B, m)."""
    dtype = jnp.result_type(model.pack())
    Xb = jnp.asarray(Xb, dtype)
    yb = jnp.asarray(yb, dtype)
    Xs = jnp.asarray(Xstar_b, dtype)
    kernel = model.kernel
    nk = kernel.n_params
    nl = int(np.size(model.lik_hypers))

    def one(flat, X, y, Xstar):
        kp = kernel.unpack(flat[:nk])
        lh = flat[nk : nk + nl]
        return gaussian.predict(kernel, kp, lh, X, y, Xstar,
                                model.likelihood)

    return jax.jit(jax.vmap(one))(fit.flat, Xb, yb, Xs)
