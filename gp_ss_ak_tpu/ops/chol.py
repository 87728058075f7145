"""Single-chip blocked Cholesky tuned for the TPU MXU.

XLA expands `lax.linalg.cholesky` into a while-loop blocked algorithm
with a small fixed block, and its trailing updates run at ~13% of f32
peak on v5e (measured in benchmarks/results.json). This module
implements the same right-looking factorization as an UNROLLED Python
loop over large block columns, so that

  * every trailing update is one big static-shape GEMM at
    `Precision.HIGHEST` (MXU-bound, where ~all the N^3/3 FLOPs live),
  * the panel solve is one triangular solve against a small b x b
    diagonal block (O(N b^2) — cheap),
  * only the b x b diagonal blocks go through XLA's slow expander.

It is pure JAX (differentiable: reverse-mode decomposes into the same
blocked GEMM/trsm structure, replacing XLA's full-size triangular-solve
JVPs), NaN-propagating on indefinite input (the reference's Chol_fail
-> NaN protocol, GP_Utils.cpp:884-915), and exact — no approximation.

`cholesky()` is the dispatcher used by the inference core: blocked on
TPU above a size threshold, `jnp.linalg.cholesky` everywhere else.
Opt out with GP_TPU_BLOCKED_CHOL=0.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

_PREC = jax.lax.Precision.HIGHEST

#: default block-column width; 512 keeps the trailing GEMMs large
#: enough to saturate the MXU while the diagonal-block expander cost
#: stays O(n/b * b^3) = O(n b^2) — ~3% of total FLOPs at n=4096.
DEFAULT_BLOCK = 512

#: below this size a single XLA cholesky is faster than the unrolled
#: loop's fixed overhead.
MIN_BLOCKED_N = 1024


def blocked_cholesky(A: jnp.ndarray, block: int = DEFAULT_BLOCK) -> jnp.ndarray:
    """Lower Cholesky factor of symmetric PD `A` via right-looking
    block factorization with static (unrolled) block steps.

    Pads to a multiple of `block` with an identity tail (the factor of
    blockdiag(A, I) is blockdiag(L, I); padding never mixes into the
    result) and slices back.
    """
    n = A.shape[-1]
    if n <= block:
        return jnp.linalg.cholesky(A)
    pad = (-n) % block
    if pad:
        Ap = jnp.zeros((n + pad, n + pad), A.dtype)
        Ap = Ap.at[:n, :n].set(A)
        Ap = Ap.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
        A = Ap
    m = n + pad
    nb = m // block
    L = jnp.zeros_like(A)
    for k in range(nb):
        i0, i1 = k * block, (k + 1) * block
        Lkk = jnp.linalg.cholesky(A[i0:i1, i0:i1])
        L = L.at[i0:i1, i0:i1].set(Lkk)
        if k + 1 < nb:
            # panel: rows below the diagonal block, P <- P Lkk^{-T}
            P = solve_triangular(Lkk, A[i1:, i0:i1].T,
                                 lower=True, trans=0).T
            L = L.at[i1:, i0:i1].set(P)
            # trailing syrk: one big MXU GEMM
            A = A.at[i1:, i1:].add(
                -jnp.matmul(P, P.T, precision=_PREC))
    return L[:n, :n] if pad else L


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def _enabled() -> bool:
    # Off by default: measured on a v5e chip (serialized on-device
    # chain, N=4096 f32), XLA's expander runs at 3.56 ms (6.4 TF/s)
    # vs 4.2 ms for this implementation — the functional whole-matrix
    # .at[] updates add O(n_blocks * N^2) HBM copies that outweigh the
    # larger trailing GEMMs. Kept as an opt-in (GP_TPU_BLOCKED_CHOL=1)
    # for chips/sizes where the balance differs.
    return os.environ.get("GP_TPU_BLOCKED_CHOL", "0") == "1"


def cholesky(A: jnp.ndarray, block: int = DEFAULT_BLOCK) -> jnp.ndarray:
    """Dispatch: blocked factorization on TPU for large n, XLA's
    expander otherwise. Semantics identical to jnp.linalg.cholesky
    (including NaN propagation on indefinite input)."""
    n = A.shape[-1]
    if A.ndim == 2 and n >= MIN_BLOCKED_N and _on_tpu() and _enabled():
        return blocked_cholesky(A, block)
    return jnp.linalg.cholesky(A)
