"""Mesh-sharded exact GP: NLML + gradient + prediction at large N.

Composition (all per-device code under jax.shard_map over mesh axis
"dp", rows contiguous):

  X is row-sharded; one all-gather replicates it (N x d is tiny);
  each device builds its ROW BLOCK of A = K + sn2 I with the fused
  Gram math (MXU) — the N x N matrix never exists on one chip;
  distributed block Cholesky + substitutions (parallel/pchol.py)
  produce alpha, the half log-determinant and posterior solves.

Gradients use the same algebra as the reference's `dhyp`/QW machinery
(GP_Utils.cpp:1164-1220) rather than differentiating through the
factorization:  dNLML/dtheta = 1/2 tr[(A^-1 - alpha alpha^T) dA/dtheta].
Each device materializes its row block of Q = A^-1 (distributed solves
against identity columns), forms QW = Q - alpha alpha^T, and contracts
it against dA/dtheta via jax.grad of the LOCAL Gram build — so the
650-line hand-derived kernel gradients of Kernel.cpp:886-1263 reduce
to one vjp of a 30-line function, and the O(N^3) path stays
fori_loop-based (no reverse-through-Cholesky memory blowup).

Padding: rows beyond the true N are identity rows (unit diagonal,
zero y), which leave logdet/solves unchanged (parallel/mesh.pad_rows).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gp_ss_ak_tpu.parallel.mesh import ROW_AXIS, pad_rows
from gp_ss_ak_tpu.parallel.pchol import (
    block_cholesky_local,
    solve_chol_local,
    tri_solve_lower_local,
)

_PREC = lax.Precision.HIGHEST


def _build_A_local(kernel, params, sn2, X_local, X_all, g, n_valid):
    """Row block of A = K + sn2 I with identity padding rows."""
    N = X_all.shape[0]
    cols = jnp.arange(N)
    K_local = kernel.matrix(params, X_local, X_all, same=False)
    vr = (g < n_valid)[:, None]
    vc = (cols < n_valid)[None, :]
    eye_local = (cols[None, :] == g[:, None]).astype(K_local.dtype)
    diag_val = jnp.where(g < n_valid, sn2, 1.0)[:, None]
    return jnp.where(vr & vc, K_local, 0.0) + eye_local * diag_val


def make_dist_nlml_and_grad(kernel, likelihood, mesh: Mesh, n: int,
                            n_devices: int = None, nb: int = 128,
                            axis: str = ROW_AXIS) -> Callable:
    """Returns jitted (flat_hypers, X_padded, y_padded) -> (nlml, grad).

    `n` is the true (unpadded) number of rows; inputs must be padded to
    pad_rows(n, P, nb) and sharded with P(axis) on rows. Gaussian
    likelihood only (the warped path warps y upstream)."""
    P_sz = n_devices or len(mesh.devices)
    nk = kernel.n_params

    def body(flat, X_local, y_local):
        n_local = X_local.shape[0]
        p = lax.axis_index(axis)
        g = p * n_local + jnp.arange(n_local)
        N = n_local * P_sz

        params = kernel.unpack(flat[:nk])
        sn2 = flat[nk]
        X_all = lax.all_gather(X_local, axis, tiled=True)

        A_local = _build_A_local(kernel, params, sn2, X_local, X_all, g, n)
        L_local, half_logdet = block_cholesky_local(A_local, nb, axis)
        alpha = solve_chol_local(L_local, y_local[:, None], nb, axis)[:, 0]
        fit = 0.5 * lax.psum(jnp.dot(y_local, alpha), axis)
        value = fit + half_logdet + 0.5 * n * math.log(2.0 * math.pi)

        # --- gradient via the QW contraction --------------------------
        cols = jnp.arange(N)
        I_local = (cols[None, :] == g[:, None]).astype(A_local.dtype)
        Q_local = solve_chol_local(L_local, I_local, nb, axis)   # A^-1 rows
        alpha_all = lax.all_gather(alpha, axis, tiled=True)
        QW = Q_local - jnp.outer(alpha, alpha_all)
        QW = lax.stop_gradient(QW)

        def contraction(flat_):
            params_ = kernel.unpack(flat_[:nk])
            sn2_ = flat_[nk]
            A_ = _build_A_local(kernel, params_, sn2_, X_local, X_all, g, n)
            return 0.5 * jnp.sum(QW * A_)

        # NOTE: no explicit psum — flat is replicated (P()), and under
        # shard_map jax inserts the cross-device reduction for the
        # cotangent of an axis-invariant input automatically.
        grad = jax.grad(contraction)(flat)
        return value, grad

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped)


def make_dist_predict(kernel, likelihood, mesh: Mesh, n: int,
                      n_devices: int = None, nb: int = 128,
                      axis: str = ROW_AXIS) -> Callable:
    """Returns jitted (flat, X_pad, y_pad, Xstar) -> (mu, var).

    Xstar is replicated (serve in chunks); mu/var come back replicated.
    Mirrors posteriorMeanVar (GP_Utils.cpp:943-1043): cross-kernel,
    kX^T alpha, whitened triangular solve, clamp, + sn2.
    """
    P_sz = n_devices or len(mesh.devices)
    nk = kernel.n_params

    def body(flat, X_local, y_local, Xstar):
        n_local = X_local.shape[0]
        p = lax.axis_index(axis)
        g = p * n_local + jnp.arange(n_local)

        params = kernel.unpack(flat[:nk])
        sn2 = flat[nk]
        X_all = lax.all_gather(X_local, axis, tiled=True)

        A_local = _build_A_local(kernel, params, sn2, X_local, X_all, g, n)
        L_local, _ = block_cholesky_local(A_local, nb, axis)
        alpha = solve_chol_local(L_local, y_local[:, None], nb, axis)[:, 0]

        kX_local = kernel.matrix(params, X_local, Xstar, same=False)
        kX_local = jnp.where((g < n)[:, None], kX_local, 0.0)
        mu = lax.psum(
            jnp.matmul(kX_local.T, alpha[:, None], precision=_PREC)[:, 0],
            axis)

        v_local = tri_solve_lower_local(L_local, kX_local, nb, axis)
        ssq = lax.psum(jnp.sum(v_local * v_local, axis=0), axis)
        kdiag = kernel.diag(params, Xstar)
        var = jnp.maximum(kdiag - ssq, 0.0) + sn2
        return mu, var

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped)


def shard_training_data(mesh: Mesh, X: np.ndarray, y: np.ndarray,
                        nb: int = 128, axis: str = ROW_AXIS):
    """Pad to (devices x nb) multiples and device_put with row sharding.
    Returns (X_sharded, y_sharded, n_true, n_padded)."""
    n, d = X.shape
    P_sz = len(mesh.devices)
    n_pad = pad_rows(n, P_sz, nb)
    Xp = np.zeros((n_pad, d), X.dtype)
    Xp[:n] = X
    yp = np.zeros((n_pad,), y.dtype)
    yp[:n] = y
    row = NamedSharding(mesh, P(axis))
    return (jax.device_put(Xp, row), jax.device_put(yp, row), n, n_pad)
