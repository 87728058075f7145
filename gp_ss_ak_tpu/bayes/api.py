"""High-level Bayesian interface: sample GP hyperposteriors and mix
predictions over the samples (BASELINE.json config 4).

Chains are vmapped; on a multi-device mesh the chain axis is sharded
(jax.device_put with a 1-D NamedSharding) so each device integrates
its own chains — the embarrassingly-parallel axis of MCMC. At large N
the per-leapfrog NLML inside the target is itself the distributed
pipeline (parallel.make_dist_nlml_and_grad), giving two-level
parallelism: chains across hosts, the kernel matrix across a host's
chips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gp_ss_ak_tpu.bayes import hmc as _hmc
from gp_ss_ak_tpu.bayes.priors import BoxTransform, default_box, \
    make_log_posterior
from gp_ss_ak_tpu.inference import gaussian
from gp_ss_ak_tpu.model import GPModel
from gp_ss_ak_tpu.optim.api import flat_nlml_fn


def sample_hyperposterior(
    model: GPModel,
    X,
    y,
    key,
    n_samples: int = 300,
    n_warmup: int = 300,
    n_chains: int = 4,
    sampler: str = "nuts",
    init_jitter: float = 0.5,
    box: Optional[BoxTransform] = None,
    log_prior=None,
    mesh=None,
    nlml_fn=None,
    nlml_value_and_grad=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (samples, accept_stats): samples has shape
    (n_chains, n_samples, n_params) in CONSTRAINED theta space.

    `nlml_fn` (flat_theta -> scalar NLML) overrides the dense
    objective with something jax.grad can differentiate.

    `nlml_value_and_grad` (flat_theta -> (NLML, grad)) is the hook for
    objectives whose gradient is computed EXPLICITLY — pass
    parallel.make_dist_nlml_and_grad's function (closed over the
    sharded X, y) to run every leapfrog's O(N^3) on the mesh pipeline,
    or parallel.make_ring_nlml_and_grad's (same contract) for N past
    the row-panel wall.
    It is wrapped in a custom VJP, so the sampler's
    jax.value_and_grad never reverse-differentiates the fori_loop
    block Cholesky (which would be both wrong-memory and slow).
    Chains then run SEQUENTIALLY (the mesh is busy with the data
    axis); `mesh=` chain sharding and this hook are mutually
    exclusive.
    """
    dtype = jnp.result_type(model.pack())
    Xd = jnp.asarray(X, dtype)
    yd = jnp.asarray(y, dtype)
    p = model.n_params
    box = box or default_box(p, dtype)
    sequential = False
    if nlml_value_and_grad is not None:
        if nlml_fn is not None:
            raise ValueError("pass nlml_fn or nlml_value_and_grad, "
                             "not both")
        if mesh is not None:
            raise ValueError("nlml_value_and_grad occupies the mesh "
                             "with the data axis; chain sharding "
                             "(mesh=) cannot be combined with it")
        sequential = True

        @jax.custom_vjp
        def _nlml_cv(t):
            v, _ = nlml_value_and_grad(t)
            return v

        def _cv_fwd(t):
            v, g = nlml_value_and_grad(t)
            return v, g

        def _cv_bwd(g, ct):
            return (ct * g,)

        _nlml_cv.defvjp(_cv_fwd, _cv_bwd)
        nlml_fn = _nlml_cv
    elif nlml_fn is None:
        f = flat_nlml_fn(model)
        nlml_fn = lambda t: f(t, Xd, yd)  # noqa: E731
    log_post = make_log_posterior(nlml_fn, box, log_prior)

    z_map = box.inverse(model.pack())
    keys = jax.random.split(key, n_chains + 1)
    z0 = z_map[None, :] + init_jitter * jax.random.normal(
        keys[0], (n_chains, p), dtype)

    run = _hmc.nuts_sample if sampler == "nuts" else _hmc.hmc_sample
    if sequential:
        # one chain at a time: each leapfrog already spans the mesh
        zs, aps_l = [], []
        for c in range(n_chains):
            z_s, ap = run(log_post, z0[c], keys[1 + c],
                          n_samples=n_samples, n_warmup=n_warmup)
            zs.append(z_s)
            aps_l.append(ap)
        z_samps = jnp.stack(zs)
        aps = jnp.stack(aps_l)
    else:
        chain = jax.jit(jax.vmap(
            lambda z, k: run(log_post, z, k, n_samples=n_samples,
                             n_warmup=n_warmup)))
        ck = keys[1:]
        n_run = n_chains
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ax = mesh.axis_names[0]
            n_dev = int(np.prod(mesh.devices.shape))
            # the sharded chain axis must tile the mesh: pad with
            # extra (discarded) chains rather than erroring out
            n_run = -(-n_chains // n_dev) * n_dev
            if n_run != n_chains:
                extra = jax.random.split(keys[0], 2 * (n_run - n_chains))
                z_extra = z_map[None, :] + init_jitter * jax.random.normal(
                    extra[0], (n_run - n_chains, p), dtype)
                z0 = jnp.concatenate([z0, z_extra])
                ck = jnp.concatenate([ck, extra[n_run - n_chains:]])
            z0 = jax.device_put(z0, NamedSharding(mesh, P(ax)))
            ck = jax.device_put(ck, NamedSharding(mesh, P(ax)))
        z_samps, aps = chain(z0, ck)
        if n_run != n_chains:
            z_samps = z_samps[:n_chains]
            aps = jax.tree.map(lambda a: a[:n_chains], aps)
    theta = jax.vmap(jax.vmap(box.forward))(z_samps)
    return theta, aps


def predictive_mixture(model: GPModel, X, y, Xstar, theta_samples,
                       thin: int = 1):
    """Posterior-predictive mean/variance mixed over hyper samples:
    mu = E_s[mu_s], var = E_s[var_s + mu_s^2] - mu^2 (law of total
    variance). theta_samples: (chains, samples, p) or (samples, p)."""
    dtype = jnp.result_type(model.pack())
    Xd = jnp.asarray(X, dtype)
    yd = jnp.asarray(y, dtype)
    Xs = jnp.asarray(Xstar, dtype)
    th = jnp.asarray(theta_samples, dtype)
    if th.ndim == 3:
        th = th.reshape(-1, th.shape[-1])
    th = th[::thin]
    kernel = model.kernel
    nk = kernel.n_params
    nl = int(np.size(model.lik_hypers))

    def one(flat):
        kp = kernel.unpack(flat[:nk])
        lh = flat[nk : nk + nl]
        mu, var = gaussian.predict(kernel, kp, lh, Xd, yd, Xs,
                                   model.likelihood)
        return mu, var

    mus, vars_ = jax.lax.map(one, th)   # sequential: each is O(N^3)
    mu_bar = jnp.mean(mus, axis=0)
    var_bar = jnp.mean(vars_ + mus ** 2, axis=0) - mu_bar ** 2
    return mu_bar, jnp.maximum(var_bar, 0.0)
