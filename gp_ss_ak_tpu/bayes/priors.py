"""Priors + box reparameterization for Bayesian hyperparameters.

The reference point-estimates hypers inside a hard box [1e-4, 6]
(Opt_pars.cpp:184-189). The Bayesian path (new capability,
BASELINE.json config 4) keeps that box as the support: samplers run in
unconstrained z-space with theta = lb + (ub - lb) * sigmoid(z) and the
log-Jacobian added to the target, so HMC/NUTS never step outside the
region where the optimizers live.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gp_ss_ak_tpu.optim.lbfgsb import DEFAULT_LOWER, DEFAULT_UPPER


class BoxTransform(NamedTuple):
    lower: jnp.ndarray
    upper: jnp.ndarray

    def forward(self, z):
        """z (unconstrained) -> theta in (lower, upper)."""
        return self.lower + (self.upper - self.lower) * jax.nn.sigmoid(z)

    def inverse(self, theta):
        u = (theta - self.lower) / (self.upper - self.lower)
        u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
        return jnp.log(u) - jnp.log1p(-u)

    def log_det_jacobian(self, z):
        # d theta/d z = (ub - lb) * sigmoid(z) * (1 - sigmoid(z))
        return jnp.sum(
            jnp.log(self.upper - self.lower)
            + jax.nn.log_sigmoid(z) + jax.nn.log_sigmoid(-z))


def default_box(p: int, dtype=jnp.float64) -> BoxTransform:
    return BoxTransform(
        jnp.full((p,), DEFAULT_LOWER, dtype),
        jnp.full((p,), DEFAULT_UPPER, dtype),
    )


def uniform_box_log_prior(theta, box: BoxTransform):
    """Flat prior over the box (constant; zero inside)."""
    return jnp.zeros(())


def lognormal_log_prior(theta, mu=0.0, sigma=1.0):
    """Independent log-normal on every hyper — a weakly-informative
    choice for scales/widths."""
    lt = jnp.log(theta)
    return jnp.sum(-0.5 * ((lt - mu) / sigma) ** 2 - lt)


def make_log_posterior(nlml_flat, box: BoxTransform, log_prior=None):
    """Unconstrained-space target: z -> log p(z | data).

    nlml_flat: flat theta -> NLML (the jitted objective from
    optim.flat_nlml_fn or parallel.make_dist_nlml_and_grad's value).
    """
    log_prior = log_prior or (lambda t: uniform_box_log_prior(t, box))

    def log_post(z):
        theta = box.forward(z)
        return (-nlml_flat(theta) + log_prior(theta)
                + box.log_det_jacobian(z))

    return log_post
