"""A/B the distributed gradient modes on the real chip (VERDICT r1 #4).

make_dist_nlml_and_grad's "exact" gradient materializes this device's
row block of Q = A^-1 via a distributed N-RHS solve — ~6x the
factorization FLOPs per evaluation (parallel/nlml.py). The
"hutchinson" mode replaces it with m probe solves (m << N RHS). This
script times both at N=4096 on a 1-device mesh on the real TPU (the
same shard_map program that runs per-device on a pod), checks the
gradient agreement, and writes `dist_grad_ab_n4096_tpu` into
benchmarks/results.json. The winner sets the `grad_mode="auto"`
threshold in parallel/nlml.py.

Usage (on the TPU host): python benchmarks/dist_grad_ab.py [--n 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # repo root, for direct-script runs
RESULTS = os.path.join(HERE, "results.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--nb", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gp_ss_ak_tpu.model import default_model
    from gp_ss_ak_tpu.parallel import (
        make_dist_nlml_and_grad,
        make_mesh,
        shard_training_data,
    )

    n = args.n
    rng = np.random.default_rng(0)
    X = rng.uniform(-1.0, 1.0, size=(n, 3)).astype(np.float32)
    y = (np.sin(X @ np.array([3.0, 1.0, 2.0], np.float32))
         + 0.1 * rng.standard_normal(n).astype(np.float32))
    model = default_model(3, dtype=jnp.float32)
    mesh = make_mesh(1)
    Xs, ys, n_true, _ = shard_training_data(mesh, X, y, nb=args.nb)
    flat = jnp.asarray(model.pack(), jnp.float32)

    out = {"n": n, "nb": args.nb, "backend": jax.default_backend(),
           "reps": args.reps}
    grads = {}
    for mode, probes in [("exact", 0), ("hutchinson", 32),
                         ("hutchinson", 16)]:
        f = make_dist_nlml_and_grad(model.kernel, model.likelihood,
                                    mesh, n=n_true, nb=args.nb,
                                    grad_mode=mode, probes=probes or 32)
        key = mode if mode == "exact" else f"{mode}{probes}"
        t0 = time.perf_counter()
        v, g = jax.block_until_ready(f(flat, Xs, ys))
        compile_s = time.perf_counter() - t0

        # chain-timed: reps serially-dependent evals in ONE device
        # program with null-dispatch subtraction — per-call wall
        # timing over the tunnel transport is elision-prone (observed
        # sub-ms "timings" for full N-RHS solves)
        from gp_ss_ak_tpu.utils import chain_timeit

        def step(fl, s):
            v_, g_ = f(fl * (1.0 + s * 1e-12), Xs, ys)
            return v_ * jnp.float32(1e-6) \
                + jnp.sum(g_) * jnp.float32(1e-9)

        dt = chain_timeit(step, flat, reps=args.reps)
        grads[key] = np.asarray(g, np.float64)
        out[key] = {
            "nlml": float(v),
            "compile_s": round(compile_s, 2),
            "eval_ms_chain": round(1e3 * dt, 2),
        }
        print(key, json.dumps(out[key]))

    ge = grads["exact"]
    for key, g in grads.items():
        if key == "exact":
            continue
        cos = float(np.dot(g, ge)
                    / (np.linalg.norm(g) * np.linalg.norm(ge)))
        out[key]["grad_cos_vs_exact"] = round(cos, 5)
        out[key]["grad_rel_err_vs_exact"] = round(
            float(np.linalg.norm(g - ge) / np.linalg.norm(ge)), 5)
        out[key]["speedup_vs_exact"] = round(
            out["exact"]["eval_ms_chain"] / out[key]["eval_ms_chain"],
            2)
        print(key, "cos", out[key]["grad_cos_vs_exact"], "relerr",
              out[key]["grad_rel_err_vs_exact"], "speedup",
              out[key]["speedup_vs_exact"])

    data = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            data = json.load(fh)
    data[f"dist_grad_ab_n{n}_tpu"] = out
    with open(RESULTS, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"wrote dist_grad_ab_n{n}_tpu -> {RESULTS}")


if __name__ == "__main__":
    main()
