"""Fully-jittable bound-constrained L-BFGS (for vmapped ensembles).

Same contract as optim/lbfgsb.py (box projection, NaN rejection,
best-so-far), but every control decision is lax-traced so the whole fit
compiles into one XLA program and vmaps across hundreds of independent
GPs (the multi-deposit ensemble path, BASELINE.json:11). Fixed-shape
memory: the m correction pairs live in rolling (m, p) buffers with
validity masks instead of Python lists.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class JaxOptResult(NamedTuple):
    x: jnp.ndarray
    fun: jnp.ndarray
    n_iters: jnp.ndarray
    converged: jnp.ndarray


def _two_loop(g, S, Y, valid):
    """Masked two-loop recursion over rolling (m, p) buffers."""
    m = S.shape[0]
    sy = jnp.sum(S * Y, axis=1)                      # (m,)
    rho = jnp.where(valid & (sy > 1e-12), 1.0 / jnp.where(sy == 0, 1.0, sy),
                    0.0)

    def bwd(carry, i):
        q = carry
        idx = m - 1 - i
        a = rho[idx] * jnp.dot(S[idx], q)
        q = q - a * Y[idx]
        return q, a

    q, alphas = lax.scan(bwd, g, jnp.arange(m))
    yy_last = jnp.sum(Y[m - 1] * Y[m - 1])
    gamma = jnp.where(valid[m - 1] & (yy_last > 0),
                      sy[m - 1] / jnp.where(yy_last == 0, 1.0, yy_last), 1.0)
    q = q * gamma

    def fwd(carry, i):
        q = carry
        b = rho[i] * jnp.dot(Y[i], q)
        a = alphas[m - 1 - i]
        q = q + S[i] * (a - b)
        return q, None

    q, _ = lax.scan(fwd, q, jnp.arange(m))
    return q


class _State(NamedTuple):
    it: jnp.ndarray
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    S: jnp.ndarray
    Y: jnp.ndarray
    valid: jnp.ndarray
    best_x: jnp.ndarray
    best_f: jnp.ndarray
    done: jnp.ndarray


@partial(jax.jit, static_argnames=("value_and_grad", "maxiter", "memory",
                                   "max_backtracks"))
def minimize(value_and_grad: Callable, x0: jnp.ndarray,
             lower: jnp.ndarray, upper: jnp.ndarray,
             maxiter: int = 100, memory: int = 6,
             gtol: float = 1e-6, ftol: float = 1e-9,
             max_backtracks: int = 20) -> JaxOptResult:
    p = x0.shape[0]
    dtype = x0.dtype
    x0 = jnp.clip(x0, lower, upper)
    f0, g0 = value_and_grad(x0)

    init = _State(
        it=jnp.asarray(0),
        x=x0, f=f0, g=g0,
        S=jnp.zeros((memory, p), dtype),
        Y=jnp.zeros((memory, p), dtype),
        valid=jnp.zeros((memory,), bool),
        best_x=x0, best_f=f0,
        done=jnp.asarray(False),
    )

    def cond(st: _State):
        return (st.it < maxiter) & (~st.done)

    def body(st: _State):
        pg = st.x - jnp.clip(st.x - st.g, lower, upper)
        kkt = jnp.max(jnp.abs(pg)) < gtol

        d = -_two_loop(st.g, st.S, st.Y, st.valid)
        at_lo = st.x <= lower + 1e-12
        at_hi = st.x >= upper - 1e-12
        bad = (at_lo & (d < 0)) | (at_hi & (d > 0))
        d = jnp.where(bad, -st.g, d)
        d = jnp.where((at_lo & (st.g > 0)) | (at_hi & (st.g < 0)), 0.0, d)
        descent = jnp.dot(d, st.g) < 0
        d = jnp.where(descent, d, -st.g)

        def ls_cond(c):
            t, accepted, *_ = c
            return (~accepted) & (t > 2.0 ** (-max_backtracks))

        def ls_body(c):
            t, accepted, bx, bf, bg = c
            cand = jnp.clip(st.x + t * d, lower, upper)
            fc, gc = value_and_grad(cand)
            ok = jnp.isfinite(fc) & (fc < st.f)
            return (t * 0.5, accepted | ok,
                    jnp.where(ok, cand, bx),
                    jnp.where(ok, fc, bf),
                    jnp.where(ok, gc, bg))

        t0 = jnp.asarray(1.0, dtype)
        _, accepted, x_new, f_new, g_new = lax.while_loop(
            ls_cond, ls_body,
            (t0, jnp.asarray(False), st.x, st.f, st.g))

        s = x_new - st.x
        yv = g_new - st.g
        sy = jnp.dot(s, yv)
        good_pair = accepted & (sy > 1e-10 * jnp.linalg.norm(s) *
                                jnp.linalg.norm(yv))
        S = jnp.where(good_pair, jnp.roll(st.S, -1, axis=0).at[-1].set(s),
                      st.S)
        Y = jnp.where(good_pair, jnp.roll(st.Y, -1, axis=0).at[-1].set(yv),
                      st.Y)
        valid = jnp.where(good_pair,
                          jnp.roll(st.valid, -1).at[-1].set(True), st.valid)

        improved = f_new < st.best_f
        small_change = accepted & (jnp.abs(st.f - f_new) <=
                                   ftol * (1.0 + jnp.abs(f_new)))
        return _State(
            it=st.it + 1,
            x=x_new, f=f_new, g=g_new,
            S=S, Y=Y, valid=valid,
            best_x=jnp.where(improved, x_new, st.best_x),
            best_f=jnp.where(improved, f_new, st.best_f),
            done=kkt | (~accepted) | small_change,
        )

    st = lax.while_loop(cond, body, init)
    return JaxOptResult(st.best_x, st.best_f, st.it, st.done)
