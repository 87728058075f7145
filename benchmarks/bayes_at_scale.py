"""At-scale Bayesian datapoint (VERDICT r3 next-round #9; BASELINE
config 4's measured cost anchor).

Samples the flagship hyperposterior at N = 16384 on the real chip with
every leapfrog's NLML+gradient running through the matrix-free engine
(optim/iterative_fit's traceable hook -> bayes.sample_hyperposterior's
nlml_value_and_grad custom-VJP path — the same plumbing the ring/dist
hooks use, tests/test_bayes.py).

Two short runs:
  hmc   fixed n_leapfrog=16 — the leapfrog count is exact, so
        seconds/leapfrog = wall / (transitions * (16 + 1)) is a clean
        cost anchor (the +1 is the initial energy evaluation).
  nuts  a few adaptive transitions — seconds/transition + acceptance
        (leaf counts vary; the HMC row carries the per-leapfrog rate).

Writes results.json["bayes_at_scale_n16384"].

Usage (TPU host, run alone): python benchmarks/bayes_at_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
RESULTS = os.path.join(HERE, "results.json")

N = 16384
HMC_WARMUP = 24
HMC_SAMPLES = 24
HMC_LEAPFROG = 16
NUTS_WARMUP = 12
NUTS_SAMPLES = 12
NUTS_MAX_DEPTH = 8   # nuts_sample default (not overridable via the api)


def main():
    import jax
    import jax.numpy as jnp

    from gp_ss_ak_tpu.bayes.api import sample_hyperposterior
    from gp_ss_ak_tpu.model import default_model
    from gp_ss_ak_tpu.optim.iterative_fit import (
        make_iterative_value_and_grad,
    )

    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    y = (np.sin(X @ np.array([3.0, 1.0, 2.0], np.float32))
         + 0.1 * rng.standard_normal(N).astype(np.float32))
    model = default_model(3, dtype=jnp.float32)
    vg = make_iterative_value_and_grad(model, X, y)
    hook = vg.traceable

    out = {"backend": jax.default_backend(), "n": N,
           "nlml_engine": "iterative (auto mode -> materialized chol "
                          "at this N; exact value, Hutchinson grad)"}

    # --- HMC: exact leapfrog accounting -------------------------------
    t0 = time.perf_counter()
    theta, aps = sample_hyperposterior(
        model, X, y, jax.random.PRNGKey(0), n_samples=HMC_SAMPLES,
        n_warmup=HMC_WARMUP, n_chains=1, sampler="hmc",
        init_jitter=0.05, nlml_value_and_grad=hook)
    wall = time.perf_counter() - t0
    transitions = HMC_WARMUP + HMC_SAMPLES
    evals = transitions * (HMC_LEAPFROG + 1)
    out["hmc"] = {
        "transitions": transitions,
        "n_leapfrog_per_transition": HMC_LEAPFROG,
        "wall_s": round(wall, 1),
        "s_per_leapfrog": round(wall / evals, 3),
        "mean_accept": float(np.mean(np.asarray(aps))),
        "theta_finite": bool(np.isfinite(np.asarray(theta)).all()),
    }
    print(json.dumps(out["hmc"]), flush=True)

    # --- NUTS: a few adaptive transitions -----------------------------
    t0 = time.perf_counter()
    theta_n, aps_n = sample_hyperposterior(
        model, X, y, jax.random.PRNGKey(1), n_samples=NUTS_SAMPLES,
        n_warmup=NUTS_WARMUP, n_chains=1, sampler="nuts",
        init_jitter=0.05, nlml_value_and_grad=hook)
    wall_n = time.perf_counter() - t0
    out["nuts"] = {
        "transitions": NUTS_WARMUP + NUTS_SAMPLES,
        "max_depth": NUTS_MAX_DEPTH,
        "wall_s": round(wall_n, 1),
        "s_per_transition": round(
            wall_n / (NUTS_WARMUP + NUTS_SAMPLES), 2),
        "mean_accept_stat": float(np.mean(np.asarray(aps_n))),
        "theta_finite": bool(np.isfinite(np.asarray(theta_n)).all()),
    }
    print(json.dumps(out["nuts"]), flush=True)
    out["ts"] = time.strftime("%F %T")

    data = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            data = json.load(fh)
    data["bayes_at_scale_n16384"] = out
    with open(RESULTS, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"wrote bayes_at_scale_n16384 -> {RESULTS}")


if __name__ == "__main__":
    main()
