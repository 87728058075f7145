"""Ring-rotation distributed Gram matvec + CG — the long-context
analogue (SURVEY.md §5): structurally ring attention, with the N x N
kernel matrix in the role of the attention matrix.

The exact-NLML pipeline (parallel/nlml.py) materializes each device's
(n_local, N) ROW PANEL of A. At N ~ 10^5-10^6 even the panel is too
big (100k x 1M f32 = 400 GB/device at P=10). Here NOTHING bigger than
an (n_local, n_local) tile ever exists:

  each device holds an X block and a v block; blocks rotate around
  the mesh ring via lax.ppermute; at each of the P steps a device
  computes one tile K(X_local, X_visiting) @ v_visiting and
  accumulates — compute overlaps with the ICI transfer of the next
  block, exactly the ring-attention schedule.

Built for the flagship Sum([ExpAns, Bias]) + Gaussian model (the same
restriction as the single-chip matrix-free engine,
optim/iterative_fit.py): A = sigma^2 exp(-||xm_i - xm_j||) + bias
+ sn2 I over metric-mapped points. Padding rows act as identity rows
(A_pad = blockdiag(A, I)), so CG and solves ignore them.

Reference surface being scaled: the mvmK hot path
(GP_Utils.cpp:180-227, 394) and posterior solves (GP_Utils.cpp:943-1004).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from gp_ss_ak_tpu.parallel.mesh import ROW_AXIS

_PREC = lax.Precision.HIGHEST


def _ring_perm(P_sz: int):
    # send to the next device, receive from the previous
    return [(i, (i + 1) % P_sz) for i in range(P_sz)]


def _mapped_local(kernel, params, X_local, n, axis):
    """Metric-map the LOCAL block with a globally consistent centre
    (mean over the true rows, psum-reduced — every device computes the
    same c, so cross-block distances agree)."""
    from gp_ss_ak_tpu.kernels.distance import pad_to_3d

    ep, _bp = params
    expans = kernel.children[0]
    Xp = pad_to_3d(X_local)
    n_local = Xp.shape[0]
    p = lax.axis_index(axis)
    g = p * n_local + jnp.arange(n_local)
    valid = (g < n)[:, None]
    csum = lax.psum(jnp.sum(jnp.where(valid, Xp, 0.0), axis=0), axis)
    c = csum / n
    M = expans.metric(ep, Xp.shape[-1])
    Xm = jnp.matmul(Xp - c, M, precision=_PREC)
    return Xm, g, valid[:, 0]


def _tile(Xm_rows, Xm_cols, sigma, bias):
    d2 = (jnp.sum(Xm_rows * Xm_rows, axis=1)[:, None]
          + jnp.sum(Xm_cols * Xm_cols, axis=1)[None, :]
          - 2.0 * jnp.matmul(Xm_rows, Xm_cols.T, precision=_PREC))
    d2 = jnp.maximum(d2, 0.0)
    return sigma * sigma * jnp.exp(-jnp.sqrt(d2)) + bias


def make_ring_matvec(kernel, mesh: Mesh, n: int, n_devices: int = None,
                     axis: str = ROW_AXIS) -> Callable:
    """Returns jitted (flat, X_pad, v_pad) -> A v (row-sharded), where
    A = K + sn2 I with identity padding rows and K never exists —
    not even as a row panel."""
    from gp_ss_ak_tpu.ops.fused import _is_flagship

    if not _is_flagship(kernel):
        raise ValueError("ring matvec supports the flagship "
                         "Sum([ExpAns, Bias]) kernel only")
    P_sz = n_devices or len(mesh.devices)
    nk = kernel.n_params

    def body(flat, X_local, v_local):
        params = kernel.unpack(flat[:nk])
        ep, bp = params
        sn2 = flat[nk]
        sigma, bias = ep["Sigma"], bp["Sigma"]
        Xm, g, row_valid = _mapped_local(kernel, params, X_local, n, axis)
        n_local = Xm.shape[0]
        p = lax.axis_index(axis)

        vz = jnp.where((g < n), v_local, 0.0)
        q0 = jnp.zeros_like(v_local)
        perm = _ring_perm(P_sz)

        def step(k, carry):
            Xb, vb, src, q = carry
            # the visiting block's global column ids
            gc = src * n_local + jnp.arange(n_local)
            Kt = _tile(Xm, Xb, sigma, bias)
            Kt = jnp.where(row_valid[:, None] & (gc < n)[None, :], Kt, 0.0)
            q = q + jnp.matmul(Kt, vb, precision=_PREC)
            Xb = lax.ppermute(Xb, axis, perm)
            vb = lax.ppermute(vb, axis, perm)
            src = lax.ppermute(src, axis, perm)
            return (Xb, vb, src, q)

        _, _, _, q = lax.fori_loop(0, P_sz, step, (Xm, vz, p, q0))
        # diagonal: + sn2 v on true rows, identity on padding rows
        return jnp.where(g < n, q + sn2 * v_local, v_local)

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return jax.jit(mapped)


def make_ring_cg_solve(kernel, mesh: Mesh, n: int, n_devices: int = None,
                       axis: str = ROW_AXIS, tol: float = 1e-6,
                       maxiter: int = 1000) -> Callable:
    """Returns jitted (flat, X_pad, b_pad) -> (x, iters, residual):
    CG on A x = b where every matvec is one ring pass and every inner
    product is a psum — the kernel matrix never exists anywhere."""
    from gp_ss_ak_tpu.ops.fused import _is_flagship

    if not _is_flagship(kernel):
        raise ValueError("ring CG supports the flagship kernel only")
    P_sz = n_devices or len(mesh.devices)
    nk = kernel.n_params

    def body(flat, X_local, b_local):
        params = kernel.unpack(flat[:nk])
        ep, bp = params
        sn2 = flat[nk]
        sigma, bias = ep["Sigma"], bp["Sigma"]
        Xm, g, row_valid = _mapped_local(kernel, params, X_local, n, axis)
        n_local = Xm.shape[0]
        p = lax.axis_index(axis)
        perm = _ring_perm(P_sz)

        def matvec(v):
            vz = jnp.where(g < n, v, 0.0)

            def step(k, carry):
                Xb, vb, src, q = carry
                gc = src * n_local + jnp.arange(n_local)
                Kt = _tile(Xm, Xb, sigma, bias)
                Kt = jnp.where(row_valid[:, None] & (gc < n)[None, :],
                               Kt, 0.0)
                q = q + jnp.matmul(Kt, vb, precision=_PREC)
                Xb = lax.ppermute(Xb, axis, perm)
                vb = lax.ppermute(vb, axis, perm)
                src = lax.ppermute(src, axis, perm)
                return (Xb, vb, src, q)

            _, _, _, q = lax.fori_loop(
                0, P_sz, step, (Xm, vz, p, jnp.zeros_like(v)))
            return jnp.where(g < n, q + sn2 * v, v)

        def pdot(a, b):
            return lax.psum(jnp.dot(a, b, precision=_PREC), axis)

        b = jnp.where(g < n, b_local, 0.0)
        x = jnp.zeros_like(b)
        r = b
        pvec = r
        rs = pdot(r, r)
        thresh = (tol ** 2) * pdot(b, b)

        def cond(state):
            _x, _r, _p, rs, it = state
            return (rs > thresh) & (it < maxiter)

        def step(state):
            x, r, pv, rs, it = state
            Ap = matvec(pv)
            alpha = rs / pdot(pv, Ap)
            x = x + alpha * pv
            r = r - alpha * Ap
            rs_new = pdot(r, r)
            pv = r + (rs_new / rs) * pv
            return (x, r, pv, rs_new, it + 1)

        x, r, _pv, rs, it = lax.while_loop(
            cond, step, (x, r, pvec, rs, jnp.zeros((), jnp.int32)))
        return x, it, jnp.sqrt(rs)

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(axis), P(), P()),
    )
    return jax.jit(mapped)


def make_ring_posterior_mean(kernel, mesh: Mesh, n: int,
                             n_devices: int = None,
                             axis: str = ROW_AXIS, tol: float = 1e-6,
                             maxiter: int = 1000) -> Callable:
    """Returns jitted (flat, X_pad, y_pad, Xstar) -> posterior mean at
    Xstar: alpha by ring CG, then mu = kX^T alpha accumulated by one
    psum over the devices' local cross-tiles (Xstar replicated).

    Mirrors _postMean (GP_Utils.cpp:958-972) at panel-free scale."""
    cg = make_ring_cg_solve(kernel, mesh, n, n_devices, axis, tol,
                            maxiter)
    P_sz = n_devices or len(mesh.devices)
    nk = kernel.n_params

    def body(flat, X_local, alpha_local, Xstar):
        from gp_ss_ak_tpu.kernels.distance import pad_to_3d

        params = kernel.unpack(flat[:nk])
        ep, bp = params
        Xm, g, row_valid = _mapped_local(kernel, params, X_local, n, axis)
        # map the queries with the same centre
        expans = kernel.children[0]
        Xp = pad_to_3d(X_local)
        n_local = Xp.shape[0]
        csum = lax.psum(
            jnp.sum(jnp.where(row_valid[:, None], Xp, 0.0), axis=0), axis)
        c = csum / n
        M = expans.metric(ep, Xp.shape[-1])
        Xsm = jnp.matmul(pad_to_3d(Xstar) - c, M, precision=_PREC)
        kX = _tile(Xm, Xsm, ep["Sigma"], bp["Sigma"])      # (n_local, m)
        kX = jnp.where(row_valid[:, None], kX, 0.0)
        mu = lax.psum(
            jnp.matmul(kX.T, alpha_local[:, None], precision=_PREC)[:, 0],
            axis)
        return mu

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=P(),
    )
    mapped = jax.jit(mapped)

    def run(flat, X_pad, y_pad, Xstar):
        alpha, it, res = cg(flat, X_pad, y_pad)
        return mapped(flat, X_pad, alpha, Xstar), it, res

    return run
