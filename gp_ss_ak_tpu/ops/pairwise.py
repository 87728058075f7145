"""Pallas fused Gram-matrix kernels — the hot op of the whole engine.

The reference's training loop spends its O(N^2 d) time in
MahaDist + exp (Kernel.cpp:1370-1435, 856-882, SURVEY.md §3.1 "HOT").
The XLA path materializes the squared-distance matrix D2 in HBM
between the matmul and the exp — at N=100k that is an extra 40 GB of
HBM traffic each way. These kernels compute, per (TM, TN) VMEM tile:

    cross = Xi @ Xj^T              (MXU, full f32)
    d2    = |Xi|^2 + |Xj|^2 - 2 cross,  clamped >= 0
    A     = sigma^2 * exp(-sqrt(d2)) + bias [+ sn2 on the diagonal]

so D2 never leaves VMEM and the exp/sqrt run on the VPU while the
next tile's operands stream in. The metric mapping X -> X M (tiny
O(N d^2)) happens once outside.

`interpret=True` is selected automatically off-TPU so the exact same
kernel code runs in unit tests on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gram_kernel(scal_ref, xi_ref, xj_ref, out_ref, *,
                 tm: int, tn: int, with_diag: bool):
    """One (tm, tn) tile of A = s2 exp(-sqrt(d2)) + bias (+ sn2 I).

    Row norms are recomputed per tile from the VMEM operands (a few
    hundred VPU flops) — passing them as 1-D operands trips Mosaic's
    layout verifier against XLA's 1-D tiling."""
    s2 = scal_ref[0]
    bias = scal_ref[1]
    sn2 = scal_ref[2]
    xi = xi_ref[...]                       # (tm, dpad)
    xj = xj_ref[...]                       # (tn, dpad)
    acc_dtype = jnp.promote_types(xi.dtype, jnp.float32)
    cross = jax.lax.dot_general(
        xi, xj, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc_dtype,
        precision=jax.lax.Precision.HIGHEST)
    ni = jnp.sum(xi.astype(acc_dtype) ** 2, axis=1, keepdims=True)
    nj = jnp.sum(xj.astype(acc_dtype) ** 2, axis=1, keepdims=True)
    d2 = ni + nj.T - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    k = s2 * jnp.exp(-jnp.sqrt(d2)) + bias
    if with_diag:
        i = pl.program_id(0)
        j = pl.program_id(1)
        rows = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
        cols = j * tn + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
        on_diag = rows == cols
        # exact zero distance on the diagonal: k there is s2 + bias
        k = jnp.where(on_diag, s2 + bias + sn2, k)
    out_ref[...] = k.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("with_diag", "tm", "tn",
                                             "interpret"))
def _fused_gram(Xi, Xj, scalars, with_diag: bool, tm: int,
                tn: int, interpret: bool):
    n, dpad = Xi.shape
    m = Xj.shape[0]
    grid = (n // tm, m // tn)
    kern = functools.partial(_gram_kernel, tm=tm, tn=tn,
                             with_diag=with_diag)
    flops = 2 * n * m * dpad + 8 * n * m
    # under shard_map the output must declare its varying mesh axes and
    # every operand must carry the SAME vma (pallas kernels don't
    # auto-promote) — pvary all inputs to the union
    try:
        vma = jax.typeof(Xi).vma | jax.typeof(Xj).vma \
            | jax.typeof(scalars).vma
    except Exception:
        vma = frozenset()
    if interpret and vma:
        # the pallas HLO interpreter mixes its internal (invariant)
        # grid indices with varying operands and trips check_vma; off
        # TPU compute the identical tile math in plain jnp instead —
        # the compiled pallas path still runs whenever a real TPU is
        # the backend
        acc = jnp.promote_types(Xi.dtype, jnp.float32)
        cross = jax.lax.dot_general(
            Xi, Xj, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc,
            precision=jax.lax.Precision.HIGHEST)
        ni = jnp.sum(Xi.astype(acc) ** 2, axis=1, keepdims=True)
        nj = jnp.sum(Xj.astype(acc) ** 2, axis=1, keepdims=True)
        d2 = jnp.maximum(ni + nj.T - 2.0 * cross, 0.0)
        k = scalars[0] * jnp.exp(-jnp.sqrt(d2)) + scalars[1]
        if with_diag:
            rows = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
            k = jnp.where(rows == cols,
                          scalars[0] + scalars[1] + scalars[2], k)
        return k.astype(Xi.dtype)
    if vma:
        from gp_ss_ak_tpu.utils.vma import pvary_to
        Xi = pvary_to(Xi, vma - jax.typeof(Xi).vma)
        Xj = pvary_to(Xj, vma - jax.typeof(Xj).vma)
        scalars = pvary_to(scalars, vma - jax.typeof(scalars).vma)
    out_shape = (jax.ShapeDtypeStruct((n, m), Xi.dtype, vma=vma)
                 if vma else jax.ShapeDtypeStruct((n, m), Xi.dtype))
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scalars (3,)
            pl.BlockSpec((tm, dpad), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, dpad), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * (n * m + (n + m) * dpad),
            transcendentals=n * m),
        interpret=interpret,
    )(scalars, Xi, Xj)


def expans_bias_gram(Xm: jnp.ndarray, sigma: jnp.ndarray,
                     bias: jnp.ndarray, sn2=None,
                     Xm2: jnp.ndarray = None,
                     tm: int = 256, tn: int = 256,
                     interpret: bool = None) -> jnp.ndarray:
    """Fused A = sigma^2 exp(-||xi - xj||) + bias [+ sn2 I].

    Xm: metric-mapped, recentred points (N, d) — i.e. (X - c) @ M for
    ExpAns (kernels/anisotropic.py) so plain Euclidean distance here
    equals the reference's MahaDist. Pass Xm2 for a cross Gram (no
    diagonal terms). Pads rows to tile multiples and the feature dim
    to the f32 lane minimum; padding rows are sliced away on return.
    """
    if interpret is None:
        interpret = not _on_tpu()
    dtype = Xm.dtype
    same = Xm2 is None
    X2 = Xm if same else Xm2
    n, d = Xm.shape
    m = X2.shape[0]
    tm_eff = min(tm, _round_up(n, 8))
    tn_eff = min(tn, _round_up(m, 128))
    npad = _round_up(n, tm_eff)
    mpad = _round_up(m, tn_eff)
    dpad = _round_up(d, 128)

    Xi = jnp.zeros((npad, dpad), dtype).at[:n, :d].set(Xm)
    Xj = Xi if same and npad == mpad else \
        jnp.zeros((mpad, dpad), dtype).at[:m, :d].set(X2)
    sn2v = jnp.asarray(0.0, dtype) if sn2 is None else jnp.asarray(
        sn2, dtype)
    scalars = jnp.stack([
        jnp.asarray(sigma, dtype) * jnp.asarray(sigma, dtype),
        jnp.asarray(bias, dtype),
        sn2v,
    ])
    A = _fused_gram(Xi, Xj, scalars,
                    with_diag=bool(same and sn2 is not None),
                    tm=tm_eff, tn=tn_eff, interpret=interpret)
    return A[:n, :m]
