"""Utilities: failure recovery, structured logging, profiling."""

from gp_ss_ak_tpu.utils.logging import FitLogger
from gp_ss_ak_tpu.utils.profiling import (
    achieved_tflops,
    cholesky_flops,
    gram_flops,
    solve_flops,
    chain_timeit,
    timeit_fn,
    trace,
)
from gp_ss_ak_tpu.utils.psd import is_spd_cholesky, robust_cholesky

__all__ = [
    "FitLogger",
    "robust_cholesky",
    "is_spd_cholesky",
    "trace",
    "chain_timeit",
    "timeit_fn",
    "gram_flops",
    "cholesky_flops",
    "solve_flops",
    "achieved_tflops",
]
