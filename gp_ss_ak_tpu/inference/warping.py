"""Warping functions for the warped-Gaussian likelihood.

Three families, each parameterized by m = n_lik_hypers // 3 triplets
(theta[i], theta[i+m], theta[i+2m]) exactly as the reference
(GP_Utils.cpp:434-649):

- tanh1:  g(y) = y + sum_i a_i tanh(b_i (y + c_i)),
          a_i = exp(t0_i), b_i = exp(t1_i), c_i = t2_i
          (GP_Utils.cpp:438-465)
- rbf:    g(y) = y + sum_i a_i^2 exp(-(y - c_i)^2 / s_i^2),
          a_i = exp(t0_i), s_i = exp(t1_i),
          c_i = max(max(y_train), exp(-t2_i))  — the centre is pushed
          past the training targets (GP_Utils.cpp:467-495)
- srbf:   erfc-modulated rbf with *direct* (non-exp) hypers
          (GP_Utils.cpp:497-544)

Each returns (g(y), log g'(y)).

`inverse` solves g(y) = z by monotone bracketing + bisection + Newton
(GP_Utils.cpp:651-763). The reference's bisection writes the midpoint
into `ylow` on both sign branches (GP_Utils.cpp:723-727) — a bug noted
in SURVEY.md; we implement the correct update. All loops are
lax.while_loop / fori_loop so the whole path jits.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

TANH1 = "tanh1"
RBFW = "rbf"
SRBF = "srbf"
FAMILIES = (TANH1, RBFW, SRBF)


def _triplets(theta: jnp.ndarray):
    m = theta.shape[0] // 3
    return theta[:m], theta[m : 2 * m], theta[2 * m : 3 * m]


def warp(family: str, theta: jnp.ndarray, y: jnp.ndarray,
         y_train_max=None):
    """g(y), log g'(y). ``y_train_max`` feeds the rbf family's centre
    clamp (the reference uses yTarg.max() even for new data,
    GP_Utils.cpp:591)."""
    if family == TANH1:
        t0, t1, t2 = _triplets(theta)
        a = jnp.exp(t0)
        b = jnp.exp(t1)
        c = t2
        t = jnp.tanh((y[..., None] + c) * b)            # (..., m)
        gy = y + jnp.sum(a * t, axis=-1)
        gpy = 1.0 + jnp.sum(a * b * (1.0 - t * t), axis=-1)
        return gy, jnp.log(gpy)
    if family == RBFW:
        t0, t1, t2 = _triplets(theta)
        a = jnp.exp(t0)
        s = jnp.exp(t1)
        c = jnp.maximum(y_train_max, jnp.exp(-t2))
        d = y[..., None] - c
        t = (a * a) * jnp.exp(-(d * d) / (s * s))
        gy = y + jnp.sum(t, axis=-1)
        gpy = 1.0 + jnp.sum((-2.0 / (s * s)) * d * t, axis=-1)
        return gy, jnp.log(gpy)
    if family == SRBF:
        a, s, c = _triplets(theta)  # direct hypers (GP_Utils.cpp:512-514)
        d = y[..., None] - c
        d2 = d * d
        base = (a * a) * jnp.exp(-d2 / (s * s))
        erfc_term = jax.scipy.special.erfc(-jnp.abs(d))
        t = base * erfc_term
        gy = y + jnp.sum(t, axis=-1)
        # derivative pieces per GP_Utils.cpp:522-531
        dti = jnp.exp(-d2) * (-2.0 / math.sqrt(math.pi)) * base
        dti = jnp.where(d > 0, -dti, dti)
        dti2 = (d * (-2.0 / (s * s))) * base * erfc_term
        gpy = 1.0 + jnp.sum(dti + dti2, axis=-1)
        return gy, jnp.log(gpy)
    raise ValueError(f"unknown warp family {family!r}")


@partial(jax.jit, static_argnames=("family", "max_expand"))
def inverse(family: str, theta: jnp.ndarray, z: jnp.ndarray,
            y_train_max=0.0, max_expand: int = 64):
    """Solve g(y) = z elementwise.

    tanh1/rbf: bracket by stepping +-max|z| (the reference's dz,
    GP_Utils.cpp:674-705), 12 bisection rounds, then 12 clipped Newton
    rounds (GP_Utils.cpp:706-759). srbf: reference's closed-form chain
    (GP_Utils.cpp:765-791).
    """
    if family == SRBF:
        # replicate the reference's sequential transform; only the last
        # triplet effectively survives, as in the C++ loop.
        m = theta.shape[0] // 3
        g = z
        for i in range(m):
            a = jnp.exp(theta[i])
            s = jnp.exp(theta[i + m])
            c = jnp.maximum(y_train_max, jnp.exp(-theta[i + 2 * m]))
            lny = jnp.log(z / (a * a))
            g = jnp.sqrt(-(s * s) * lny) + c
        return g

    def residual(y):
        gy, _ = warp(family, theta, y, y_train_max)
        return gy - z

    # floor the bracket step: dz = 0 (all-zero z) would loop forever
    dz = jnp.maximum(jnp.max(jnp.abs(z)), 1.0)

    def lower_cond(state):
        y, r = state
        return jnp.any(r > 0)

    def lower_body(state):
        y, r = state
        y = jnp.where(r > 0, y - dz, y)
        return y, residual(y)

    y0 = z
    r0 = residual(y0)
    ylow, _ = lax.while_loop(lower_cond, lower_body, (y0, r0))

    def upper_cond(state):
        y, r = state
        return jnp.any(r < 0)

    def upper_body(state):
        y, r = state
        y = jnp.where(r < 0, y + dz, y)
        return y, residual(y)

    yup, _ = lax.while_loop(upper_cond, upper_body, (y0, r0))

    def bisect_body(_, state):
        ylow, yup = state
        mid = 0.5 * (ylow + yup)
        r = residual(mid)
        ylow = jnp.where(r < 0, mid, ylow)
        yup = jnp.where(r > 0, mid, yup)
        return ylow, yup

    ylow, yup = lax.fori_loop(0, 12, bisect_body, (ylow, yup))
    y = 0.5 * (ylow + yup)

    def newton_body(_, y):
        gy, lgpy = warp(family, theta, y, y_train_max)
        step = (gy - z) / jnp.exp(lgpy)
        y = y - step
        return jnp.clip(y, ylow, yup)

    y = lax.fori_loop(0, 12, newton_body, y)
    return y
