"""Serving throughput: posterior mean/var predictions/s vs batch size.

One trained flagship model at N training points; the Predictor factors
once and serves batches of M query points. At n_train <= 8192 the
whitened solve per batch is a single MXU GEMM against a precomputed
L^-1; above, L^-1 is built block-by-block (serve.blocked_linv — the
single n-RHS solve's XLA lowering needs ~64 GB of temporaries at
n=16384, measured OOM) and serving stays on the GEMM path to 32k.
This is the HBM-bandwidth path BASELINE.md's prediction-throughput
row asks about.

Timing is elision-proof: chain_timeit runs serially-dependent batches
inside one device program and subtracts the measured null-dispatch
round-trip (required over the tunnel transport).

Usage (TPU host, run ALONE — the remote compile service serializes):
  python benchmarks/serving_sweep.py [--n-train 16384]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # repo root, for direct-script runs
RESULTS = os.path.join(HERE, "results.json")

N_TRAIN = 4096
BATCHES = [256, 1024, 4096, 16384]
#: L^-1 precompute ceiling (blocked above 8k — serve.blocked_linv)
PRECOMPUTE_MAX_N = 32768


def _one_batch(jax, jnp, rng, model, Xd, post, m):
    from gp_ss_ak_tpu.inference import gaussian
    from gp_ss_ak_tpu.utils.profiling import chain_timeit

    Xq0 = jnp.asarray(rng.uniform(-1, 1, (m, 3)), jnp.float32)
    # big arrays ride as ARGUMENTS — closure constants are embedded in
    # the remote-compile request and a GB-size factor trips its limit
    post_leaves, post_def = jax.tree.flatten(post)

    def step(z, s, Xd_, *leaves):
        post_ = jax.tree.unflatten(post_def, leaves)
        # serial dependence: each batch is perturbed by the running
        # scalar, so successive iterations can't be elided/pipelined
        zq = z + s * jnp.float32(1e-6)
        mu, var = gaussian.posterior_mean_var(
            model.kernel, model.kernel_params, model.lik_hypers,
            Xd_, post_, zq, model.likelihood)
        return (jnp.sum(mu) + jnp.sum(var)) * jnp.float32(1e-6)

    dt = chain_timeit(step, Xq0, reps=10,
                      args=(Xd, *post_leaves))
    return {
        "batch": m,
        "ms_per_batch": round(1e3 * dt, 3),
        "preds_per_s": round(m / dt) if dt > 0 else None,
    }


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from gp_ss_ak_tpu.inference import gaussian
    from gp_ss_ak_tpu.model import default_model

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=N_TRAIN,
                    help="training-set size (the whitened solve per "
                         "batch is O(n_train^2 m); > PRECOMPUTE_MAX_N "
                         "skips the L^-1 precompute and uses "
                         "triangular solves)")
    args = ap.parse_args()
    n_train = args.n_train

    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (n_train, 3)).astype(np.float32)
    y = np.sin(X @ np.array([3.0, 1.0, 2.0], np.float32))
    model = default_model(input_dim=3, dtype=jnp.float32)
    Xd, yd = jnp.asarray(X), jnp.asarray(y)

    from gp_ss_ak_tpu.serve import blocked_linv

    post = gaussian.factorize(model.kernel, model.kernel_params,
                              model.lik_hypers, Xd, yd, model.likelihood)
    if n_train <= PRECOMPUTE_MAX_N:
        if n_train <= 8192:
            eye = jnp.eye(n_train, dtype=jnp.float32)
            with jax.default_matmul_precision("highest"):
                linv = jax.scipy.linalg.solve_triangular(
                    post.chol, eye, lower=True)
        else:
            linv = blocked_linv(post.chol)
        post = post._replace(linv=linv)

    rows = []
    for m in BATCHES:
        try:
            row = _one_batch(jax, jnp, rng, model, Xd, post, m)
        except Exception as e:  # noqa: BLE001 - record per-batch OOMs
            row = {"batch": m, "error": str(e)[:200],
                   "diagnosis": "per-batch cross-Gram + triangular "
                   "solve exceeded HBM at this (n_train, batch); "
                   "smaller batches still serve"}
            jax.clear_caches()
        rows.append(row)
        print(row, flush=True)

    data = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            data = json.load(f)
    key = ("serving_batch_sweep" if n_train == N_TRAIN
           else f"serving_batch_sweep_n{n_train}")
    data[key] = {
        "backend": jax.default_backend(),
        "n_train": n_train,
        "note": (("Predictor path with precomputed L^-1; "
                  if n_train <= PRECOMPUTE_MAX_N
                  else "Predictor path, triangular solves (no L^-1 "
                       "precompute at this n_train); ")
                 + "chain-timed (serialized dependent batches, "
                   "null-dispatch subtracted)"),
        "rows": rows,
        "ts": time.strftime("%F %T"),
    }
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {key} -> {RESULTS}")


if __name__ == "__main__":
    main()
