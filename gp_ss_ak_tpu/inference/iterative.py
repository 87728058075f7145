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
# pivoted-Cholesky preconditioner (GPyTorch/BBMM recipe)
# ---------------------------------------------------------------------------

def pivoted_cholesky(Xm: jnp.ndarray, sigma, bias, rank: int):
    """Rank-`rank` pivoted Cholesky of K = sigma^2 exp(-||xi-xj||) + bias
    WITHOUT ever building K: greedy max-diagonal pivoting, one kernel
    COLUMN (O(n d)) per step. Returns L (n, rank) with L L^T ~ K.

    The flagship kernel has a constant diagonal (sigma^2 + bias), so
    the first pivot is arbitrary and convergence is governed by the
    eigendecay of K — fast for smooth kernels, which is exactly the
    ill-conditioned (small sn2) regime where CG needs the help.
    """
    n = Xm.shape[0]
    s2 = sigma * sigma

    def column(i):
        xi = lax.dynamic_slice_in_dim(Xm, i, 1, 0)         # (1, d)
        d2 = jnp.sum((Xm - xi) ** 2, axis=1)
        r = jnp.sqrt(jnp.maximum(d2, 0.0))
        c = s2 * jnp.exp(-r) + bias
        return c.at[i].set(s2 + bias)                       # exact diag

    def body(j, carry):
        L, d = carry
        i = jnp.argmax(d)
        c = column(i)
        Li = jnp.take(L, i, axis=0)                         # (rank,)
        l = (c - L @ Li) / jnp.sqrt(jnp.maximum(d[i], 1e-30))
        l = jnp.where(d[i] > 1e-30, l, jnp.zeros_like(l))
        L = L.at[:, j].set(l)
        d = jnp.maximum(d - l * l, 0.0)
        d = d.at[i].set(0.0)
        return (L, d)

    L0 = jnp.zeros((n, rank), Xm.dtype)
    d0 = jnp.full((n,), s2 + bias, Xm.dtype)
    L, _ = lax.fori_loop(0, rank, body, (L0, d0))
    return L


def woodbury_preconditioner(L: jnp.ndarray, sn2):
    """P^-1 for P = L L^T + sn2 I via the Woodbury identity:
    P^-1 v = (v - L M^-1 L^T v) / sn2,  M = sn2 I_k + L^T L."""
    k = L.shape[1]
    M = sn2 * jnp.eye(k, dtype=L.dtype) + jnp.matmul(
        L.T, L, precision=jax.lax.Precision.HIGHEST)
    cho = jax.scipy.linalg.cho_factor(M, lower=True)

    def pinv(v):
        Ltv = jnp.matmul(L.T, v[:, None],
                         precision=jax.lax.Precision.HIGHEST)[:, 0]
        w = jax.scipy.linalg.cho_solve(cho, Ltv)
        return (v - jnp.matmul(L, w[:, None],
                               precision=jax.lax.Precision.HIGHEST)[:, 0]
                ) / sn2

    return pinv


def pcg_solve(matvec: Callable, b: jnp.ndarray, pinv: Callable,
              tol: float = 1e-5, maxiter: int = 500, x0=None):
    """Preconditioned CG. Returns (x, n_iters, final residual norm)."""
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = pinv(r)
    p = z
    rz = jnp.dot(r, z)
    bnorm2 = jnp.dot(b, b)
    thresh = (tol ** 2) * bnorm2

    def cond(state):
        _x, r, _z, _p, _rz, it = state
        return (jnp.dot(r, r) > thresh) & (it < maxiter)

    def body(state):
        x, r, z, p, rz, it = state
        Ap = matvec(p)
        a = rz / jnp.dot(p, Ap)
        x = x + a * p
        r = r - a * Ap
        z = pinv(r)
        rz_new = jnp.dot(r, z)
        p = z + (rz_new / rz) * p
        return x, r, z, p, rz_new, it + 1

    x, r, _z, _p, _rz, it = lax.while_loop(
        cond, body, (x, r, z, p, rz, jnp.asarray(0)))
    return x, it, jnp.sqrt(jnp.dot(r, r))


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


def make_preconditioner(it_gp: IterativeGP, rank: int):
    """rank-`rank` pivoted-Cholesky Woodbury preconditioner for
    A = K + sn2 I (None when rank == 0)."""
    if not rank:
        return None
    L = pivoted_cholesky(it_gp.Xm, it_gp.sigma, it_gp.bias, rank)
    return woodbury_preconditioner(L, it_gp.sn2)


def _solve(op, b, pinv, tol, maxiter):
    if pinv is None:
        return cg_solve(op, b, tol=tol, maxiter=maxiter)
    return pcg_solve(op, b, pinv, tol=tol, maxiter=maxiter)


def nlml_iterative(it_gp: IterativeGP, y, key, cg_tol: float = 1e-4,
                   cg_maxiter: int = 800, probes: int = 16,
                   lanczos_iters: int = 32, tm: int = 512, tn: int = 512,
                   interpret=None, precond_rank: int = 64):
    """Matrix-free NLML: 1/2 y'alpha + 1/2 slq_logdet + n/2 log 2pi.
    Returns (value, alpha, cg_iters).

    `precond_rank` > 0 runs the solves as PCG with a rank-k
    pivoted-Cholesky Woodbury preconditioner (the BBMM recipe): at the
    reference's small default noise (sn2 = 0.016) plain CG needs
    O(sqrt(kappa)) ~ hundreds of iterations, the preconditioned solve
    tens. The SLQ logdet still probes the raw A (its Lanczos depth is
    fixed, not residual-driven)."""
    y = jnp.asarray(y, jnp.float32)
    n = y.shape[0]
    op = _flagship_operator(it_gp, tm, tn, interpret)
    pinv = make_preconditioner(it_gp, precond_rank)
    alpha, it, _ = _solve(op, y, pinv, cg_tol, cg_maxiter)
    half_logdet = 0.5 * slq_logdet(op, n, key, probes, lanczos_iters)
    val = 0.5 * jnp.dot(y, alpha) + half_logdet \
        + 0.5 * n * math.log(2.0 * math.pi)
    return val, alpha, it


def grad_iterative(it_gp: IterativeGP, y, key, alpha=None,
                   probes: int = 8, cg_tol: float = 1e-4,
                   cg_maxiter: int = 800, chunk: int = 1024,
                   tm: int = 512, tn: int = 512, interpret=None,
                   precond_rank: int = 64):
    """d NLML / d (sigma, bias, sn2, Xm) via Hutchinson + fit term:

      grad = 1/2 E_z [ (A^-1 z)' dA z ]  -  1/2 alpha' dA alpha

    with the A-dependence differentiated through a chunked dense row
    build (kernel math identical to the Pallas forward)."""
    y = jnp.asarray(y, jnp.float32)
    n = y.shape[0]
    op = _flagship_operator(it_gp, tm, tn, interpret)
    pinv = make_preconditioner(it_gp, precond_rank)
    if alpha is None:
        alpha, _, _ = _solve(op, y, pinv, cg_tol, cg_maxiter)
    keys = jax.random.split(key, probes)
    zs = jax.vmap(lambda k: jax.random.rademacher(
        k, (n,), jnp.float32).astype(jnp.float32))(keys)
    ws = jax.vmap(lambda z: _solve(op, z, pinv, cg_tol,
                                   cg_maxiter)[0])(zs)
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
