"""Profiling helpers (SURVEY.md §5 "tracing / profiling").

- `trace(dir)`: context manager around jax.profiler for Perfetto/
  TensorBoard traces of the TPU timeline.
- `timeit_fn`: wall-clock a jitted callable with proper
  block_until_ready fencing and warmup.
- flop estimators for the two hot phases (Gram build, Cholesky) so
  benchmarks report achieved vs speed-of-light TFLOP/s — the
  BASELINE.md headline metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit_fn(fn: Callable, *args, reps: int = 10,
              warmup: int = 1) -> float:
    """Median-free simple average seconds per call, fenced."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def gram_flops(n: int, m: int, d: int) -> int:
    """2nmd matmul + ~8 VPU ops per element (sq-dist assembly, sqrt,
    exp, adds)."""
    return 2 * n * m * d + 8 * n * m


def cholesky_flops(n: int) -> int:
    return n ** 3 // 3


def solve_flops(n: int, rhs: int) -> int:
    return 2 * n * n * rhs


def achieved_tflops(flops: int, seconds: float) -> float:
    return flops / seconds / 1e12
