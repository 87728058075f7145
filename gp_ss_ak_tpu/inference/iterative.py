"""Matrix-free iterative inference: CG solves + stochastic Lanczos
logdet — exact-GP NLML and gradients at N where the kernel matrix
cannot exist in memory (GPyTorch's BBMM recipe, rebuilt TPU-first).

Compute structure per NLML evaluation:
  alpha    : CG on A v = y           (matvecs via the Pallas
                                      streaming kernel, ops/matvec.py)
  logdet A : m-probe stochastic Lanczos quadrature — k Lanczos steps
             per Rademacher probe, logdet ~ mean_z ||z||^2 e1' log(T) e1
  gradient : Hutchinson trace + fit-term contractions,
             d/dtheta [ sum_z w_z' A(theta) z / m - alpha' A(theta)
             alpha / 2 ...] with w_z = A^-1 z held fixed — one
             jax.grad through a CHUNKED differentiable matvec
             (lax.map over row blocks, O(chunk x N) memory).

Everything is f32; CG tolerance and probe/step counts trade accuracy
for time explicitly. For N <= a few thousand prefer the dense path
(inference/gaussian.py) — this module exists for the 10^4..10^5+
single-chip regime (BASELINE config 3 without a pod).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from gp_ss_ak_tpu.kernels.distance import gram_sqdist


# ---------------------------------------------------------------------------
# conjugate gradients
# ---------------------------------------------------------------------------

def cg_solve(matvec: Callable, b: jnp.ndarray, tol: float = 1e-5,
             maxiter: int = 500, x0=None):
    """Plain CG on SPD A. Returns (x, n_iters, final residual norm)."""
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    p = r
    rs = jnp.dot(r, r)
    bnorm = jnp.sqrt(jnp.dot(b, b))
    thresh = (tol * bnorm) ** 2

    def cond(state):
        x, r, p, rs, it = state
        return (rs > thresh) & (it < maxiter)

    def body(state):
        x, r, p, rs, it = state
        Ap = matvec(p)
        alpha = rs / jnp.dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.dot(r, r)
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, it + 1

    x, r, p, rs, it = lax.while_loop(
        cond, body, (x, r, p, rs, jnp.asarray(0)))
    return x, it, jnp.sqrt(rs)


# ---------------------------------------------------------------------------
# stochastic Lanczos quadrature for logdet
# ---------------------------------------------------------------------------

def _lanczos(matvec: Callable, v0: jnp.ndarray, k: int):
    """k-step Lanczos with full orthogonalization skipped (standard for
    SLQ). Returns (alphas (k,), betas (k-1,))."""
    n = v0.shape[0]
    v = v0 / jnp.linalg.norm(v0)

    def body(carry, _):
        v_prev, v_cur, beta_prev = carry
        w = matvec(v_cur) - beta_prev * v_prev
        alpha = jnp.dot(w, v_cur)
        w = w - alpha * v_cur
        beta = jnp.linalg.norm(w)
        v_next = jnp.where(beta > 1e-10, w / jnp.where(beta > 0, beta, 1.0),
                           jnp.zeros_like(w))
        return (v_cur, v_next, beta), (alpha, beta)

    (_, _, _), (alphas, betas) = lax.scan(
        body, (jnp.zeros_like(v), v, jnp.asarray(0.0, v.dtype)), None,
        length=k)
    return alphas, betas[:-1]


def slq_logdet(matvec: Callable, n: int, key, probes: int = 16,
               lanczos_iters: int = 32):
    """E_z [ z' log(A) z ] with Rademacher probes via Gauss quadrature
    on the Lanczos tridiagonal (eigendecomposition of the k x k T)."""
    keys = jax.random.split(key, probes)

    def one(kk):
        z = jax.random.rademacher(kk, (n,), jnp.float32).astype(jnp.float32)
        alphas, betas = _lanczos(matvec, z, lanczos_iters)
        T = (jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1))
        w, V = jnp.linalg.eigh(T)
        w = jnp.maximum(w, 1e-12)
        # z' log(A) z ~ ||z||^2 * sum_i (V[0,i]^2 log w_i)
        return jnp.asarray(float(n), jnp.float32) * jnp.sum(
            (V[0, :] ** 2) * jnp.log(w))

    vals = lax.map(one, keys)
    return jnp.mean(vals)


# ---------------------------------------------------------------------------
# chunked differentiable matvec (for gradient contractions)
# ---------------------------------------------------------------------------

def chunked_matvec(params_to_A_row_chunk: Callable, v: jnp.ndarray,
                   n_chunks: int):
    """y = A v with A produced chunk-of-rows at a time (differentiable;
    O(chunk x N) live memory under jax.remat)."""
    chunks = jnp.arange(n_chunks)

    def one(c):
        A_chunk = params_to_A_row_chunk(c)          # (chunk, n)
        return A_chunk @ v

    ys = lax.map(jax.remat(one), chunks)
    return ys.reshape(-1)


class IterativeGP(NamedTuple):
    """Factory bundle for the matrix-free flagship (ExpAns+Bias)."""

    Xm: jnp.ndarray        # metric-mapped recentred points (n, d)
    sigma: jnp.ndarray
    bias: jnp.ndarray
    sn2: jnp.ndarray


def _flagship_operator(it_gp: IterativeGP, tm=512, tn=512,
                       interpret=None):
    from gp_ss_ak_tpu.ops.matvec import MatvecOperator

    return MatvecOperator(it_gp.Xm, it_gp.sigma, it_gp.bias, it_gp.sn2,
                          tm=tm, tn=tn, interpret=interpret)


def nlml_iterative(it_gp: IterativeGP, y, key, cg_tol: float = 1e-4,
                   cg_maxiter: int = 800, probes: int = 16,
                   lanczos_iters: int = 32, tm: int = 512, tn: int = 512,
                   interpret=None):
    """Matrix-free NLML: 1/2 y'alpha + 1/2 slq_logdet + n/2 log 2pi.
    Returns (value, alpha, cg_iters)."""
    y = jnp.asarray(y, jnp.float32)
    n = y.shape[0]
    op = _flagship_operator(it_gp, tm, tn, interpret)
    alpha, it, _ = cg_solve(op, y, tol=cg_tol, maxiter=cg_maxiter)
    half_logdet = 0.5 * slq_logdet(op, n, key, probes, lanczos_iters)
    val = 0.5 * jnp.dot(y, alpha) + half_logdet \
        + 0.5 * n * math.log(2.0 * math.pi)
    return val, alpha, it


def grad_iterative(it_gp: IterativeGP, y, key, alpha=None,
                   probes: int = 8, cg_tol: float = 1e-4,
                   cg_maxiter: int = 800, chunk: int = 1024,
                   tm: int = 512, tn: int = 512, interpret=None):
    """d NLML / d (sigma, bias, sn2, Xm) via Hutchinson + fit term:

      grad = 1/2 E_z [ (A^-1 z)' dA z ]  -  1/2 alpha' dA alpha

    with the A-dependence differentiated through a chunked dense row
    build (kernel math identical to the Pallas forward)."""
    y = jnp.asarray(y, jnp.float32)
    n = y.shape[0]
    op = _flagship_operator(it_gp, tm, tn, interpret)
    if alpha is None:
        alpha, _, _ = cg_solve(op, y, tol=cg_tol, maxiter=cg_maxiter)
    keys = jax.random.split(key, probes)
    zs = jax.vmap(lambda k: jax.random.rademacher(
        k, (n,), jnp.float32).astype(jnp.float32))(keys)
    ws = jax.vmap(lambda z: cg_solve(op, z, tol=cg_tol,
                                     maxiter=cg_maxiter)[0])(zs)
    ws = lax.stop_gradient(ws)
    zs = lax.stop_gradient(zs)
    alpha = lax.stop_gradient(alpha)

    npad = ((n + chunk - 1) // chunk) * chunk
    Xp = jnp.zeros((npad, it_gp.Xm.shape[1]), jnp.float32
                   ).at[:n].set(it_gp.Xm)
    valid = (jnp.arange(npad) < n)

    def contraction(theta):
        sigma, bias, sn2, Xm_ = theta
        Xp_ = jnp.zeros_like(Xp).at[:n].set(Xm_)

        def row_chunk(c):
            start = c * chunk
            rows = lax.dynamic_slice_in_dim(Xp_, start, chunk)  # (chunk, d)
            d2 = gram_sqdist(rows, Xp_)
            g0 = start + jnp.arange(chunk)
            on_diag = g0[:, None] == jnp.arange(npad)[None, :]
            r = jnp.sqrt(jnp.where(on_diag, 1.0, jnp.maximum(d2, 1e-30)))
            k = sigma * sigma * jnp.where(on_diag, 1.0, jnp.exp(-r))
            k = k + bias + sn2 * on_diag
            mask = lax.dynamic_slice_in_dim(valid, start, chunk)[:, None] \
                & valid[None, :]
            return jnp.where(mask, k, 0.0)

        def mv(v):
            vp = jnp.zeros((npad,), jnp.float32).at[:n].set(v)
            ys = lax.map(
                jax.remat(lambda c: row_chunk(c) @ vp),
                jnp.arange(npad // chunk))
            return ys.reshape(-1)[:n]

        tr_term = jnp.mean(jax.vmap(
            lambda w, z: jnp.dot(w, mv(z)))(ws, zs))
        fit_term = jnp.dot(alpha, mv(alpha))
        return 0.5 * tr_term - 0.5 * fit_term

    theta0 = (it_gp.sigma, it_gp.bias, it_gp.sn2, it_gp.Xm)
    return jax.grad(contraction)(theta0)
