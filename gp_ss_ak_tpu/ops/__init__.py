"""Pallas TPU kernels for the hot ops (fused Gram build)."""

from gp_ss_ak_tpu.ops.fused import (
    fused_cross_gram,
    fused_expans_bias_A,
    maybe_fused_A,
)
from gp_ss_ak_tpu.ops.pairwise import expans_bias_gram

__all__ = [
    "expans_bias_gram",
    "fused_expans_bias_A",
    "fused_cross_gram",
    "maybe_fused_A",
]
