"""Differentiable fused Gram build + automatic dispatch.

Forward: the Pallas tiled kernel (ops/pairwise.py) — D2 never touches
HBM. Backward: a custom VJP with the closed-form cotangents (the
distance matrix is recomputed with plain XLA once per backward pass;
reverse-mode never runs through the Pallas kernel itself):

  A = s^2 exp(-r) + b + sn2 I,  r = ||xi - xj||
  dA/ds       -> 2 s sum(G exp(-r))
  dA/db       -> sum(G)
  dA/dsn2     -> tr(G)
  dA/dXm_i    -> 2 [ (sum_j Wsym_ij) x_i - (Wsym X)_i ],
                 W = G . s^2 exp(-r) . (-1/(2r)), zero where r = 0

The `maybe_fused_A` dispatcher recognizes the CLI's flagship model
(Sum([ExpAns, Bias]) + Gaussian noise, gp_ss_ak.cpp:146-190) and
routes its A = K + sn2 I build through the fused kernel on TPU;
everything else takes the generic XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gp_ss_ak_tpu.kernels.anisotropic import ExpAns
from gp_ss_ak_tpu.kernels.composite import Sum
from gp_ss_ak_tpu.kernels.distance import gram_sqdist, pad_to_3d, safe_sqrt
from gp_ss_ak_tpu.kernels.simple import Bias
from gp_ss_ak_tpu.ops.pairwise import _on_tpu, expans_bias_gram


@jax.custom_vjp
def fused_expans_bias_A(Xm, sigma, bias, sn2):
    """A = sigma^2 exp(-||xi-xj||) + bias + sn2 I over mapped points."""
    return expans_bias_gram(Xm, sigma, bias, sn2)


def _fwd(Xm, sigma, bias, sn2):
    return fused_expans_bias_A(Xm, sigma, bias, sn2), (Xm, sigma, bias)


def _bwd(res, G):
    Xm, sigma, bias = res
    d2 = gram_sqdist(Xm, Xm, same=True)
    r = safe_sqrt(d2)
    E = jnp.exp(-r)
    s2 = sigma * sigma
    grad_sigma = 2.0 * sigma * jnp.sum(G * E)
    grad_bias = jnp.sum(G)
    grad_sn2 = jnp.trace(G)
    inv2r = jnp.where(r > 0, -0.5 / jnp.where(r > 0, r, 1.0), 0.0)
    W = G * (s2 * E * inv2r)
    Wsym = W + W.T
    grad_Xm = 2.0 * (jnp.sum(Wsym, axis=1, keepdims=True) * Xm
                     - jnp.matmul(Wsym, Xm,
                                  precision=jax.lax.Precision.HIGHEST))
    return grad_Xm, grad_sigma, grad_bias, grad_sn2


fused_expans_bias_A.defvjp(_fwd, _bwd)


@jax.custom_vjp
def fused_expans_bias_cross(Xmi, Xmj, sigma, bias):
    """K = sigma^2 exp(-||xi - xj||) + bias over two mapped point sets
    (no diagonal term) — the row-block build for the mesh-sharded NLML
    (parallel/nlml.py) and serving cross-Grams, differentiable."""
    return expans_bias_gram(Xmi, sigma, bias, None, Xm2=Xmj)


def _cross_fwd(Xmi, Xmj, sigma, bias):
    return fused_expans_bias_cross(Xmi, Xmj, sigma, bias), (
        Xmi, Xmj, sigma)


def _cross_bwd(res, G):
    Xmi, Xmj, sigma = res
    d2 = gram_sqdist(Xmi, Xmj, same=False)
    r = safe_sqrt(d2)
    E = jnp.exp(-r)
    s2 = sigma * sigma
    grad_sigma = 2.0 * sigma * jnp.sum(G * E)
    grad_bias = jnp.sum(G)
    inv2r = jnp.where(r > 0, -0.5 / jnp.where(r > 0, r, 1.0), 0.0)
    W = G * (s2 * E * inv2r)     # (ni, nj)
    prec = jax.lax.Precision.HIGHEST
    grad_Xmi = 2.0 * (jnp.sum(W, axis=1, keepdims=True) * Xmi
                      - jnp.matmul(W, Xmj, precision=prec))
    grad_Xmj = 2.0 * (jnp.sum(W, axis=0)[:, None] * Xmj
                      - jnp.matmul(W.T, Xmi, precision=prec))
    return grad_Xmi, grad_Xmj, grad_sigma, grad_bias


fused_expans_bias_cross.defvjp(_cross_fwd, _cross_bwd)


def _is_flagship(kernel) -> bool:
    return (isinstance(kernel, Sum) and len(kernel.children) == 2
            and isinstance(kernel.children[0], ExpAns)
            and isinstance(kernel.children[1], Bias))


def mapped_points(expans: ExpAns, params, X):
    """Recentre + metric-map X so Euclidean distance equals the
    reference's MahaDist (Kernel.cpp:1391-1427)."""
    Xp = pad_to_3d(X)
    c = jnp.mean(Xp, axis=0)
    M = expans.metric(params, Xp.shape[-1])
    return jnp.matmul(Xp - c, M, precision=jax.lax.Precision.HIGHEST)


def maybe_fused_A(kernel, params, sn2, X, jitter: float = 0.0,
                  fused: bool = None):
    """A = K + sn2 I via the fused path when it applies, else None."""
    if fused is None:
        fused = _on_tpu() and X.shape[0] >= 512
    if not fused or not _is_flagship(kernel):
        return None
    expans_params, bias_params = params
    Xm = mapped_points(kernel.children[0], expans_params, X)
    A = fused_expans_bias_A(Xm, expans_params["Sigma"],
                            bias_params["Sigma"], sn2 + jitter)
    return A


def fused_cross_gram(kernel, params, X, Xstar):
    """Fused cross-covariance for serving (forward-only)."""
    if not _is_flagship(kernel):
        return None
    expans_params, bias_params = params
    expans = kernel.children[0]
    Xp = pad_to_3d(X)
    Xsp = pad_to_3d(Xstar)
    c = (jnp.sum(Xp, axis=0) + jnp.sum(Xsp, axis=0)) / (
        Xp.shape[0] + Xsp.shape[0])
    M = expans.metric(expans_params, Xp.shape[-1])
    prec = jax.lax.Precision.HIGHEST
    Xm = jnp.matmul(Xp - c, M, precision=prec)
    Xsm = jnp.matmul(Xsp - c, M, precision=prec)
    return expans_bias_gram(Xm, expans_params["Sigma"],
                            bias_params["Sigma"], None, Xm2=Xsm)
