"""Varying-manual-axes plumbing shared by the shard_map bodies.

Under `jax.shard_map`, pallas calls and fori_loop carries require every
operand to declare the same varying mesh-axis set (vma). `pvary_to`
promotes a device-invariant value to vary over `axes` — the transpose
of this cast is the psum that folds per-device cotangents back onto a
replicated input, which custom_vjp boundaries would otherwise drop.

Uses `lax.pcast(..., to='varying')`; `lax.pvary` is deprecated.
"""

from __future__ import annotations

import jax
from jax import lax


def pvary_to(x, axes):
    """Cast x to additionally vary over `axes` (no-op if empty)."""
    axes = tuple(axes)
    if not axes:
        return x
    return lax.pcast(x, axes, to="varying")


def vma_of(x):
    """The varying-manual-axes set of x, or empty outside shard_map."""
    try:
        return jax.typeof(x).vma
    except Exception:
        return frozenset()


def pvary_like(x, ref):
    """Promote x's vma to include ref's (fori_loop carry alignment)."""
    return pvary_to(x, vma_of(ref) - vma_of(x))
