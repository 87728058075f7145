"""At-scale Bayesian datapoint (VERDICT r3 next-round #9; BASELINE
config 4's measured cost anchor).

Samples the flagship hyperposterior at N = 16384 on the real chip with
every leapfrog's NLML+gradient running through the matrix-free engine
(optim/iterative_fit's traceable hook — the same custom-VJP plumbing
bayes.sample_hyperposterior's nlml_value_and_grad path uses,
tests/test_bayes.py).

Transitions are HOST-PACED: one jitted HMC/NUTS transition per
dispatch (~2-3 s of device time at this N) — the all-transitions
lax.scan that bayes.hmc compiles is a single multi-minute dispatch,
which the tunneled TPU worker does not survive (same failure mode the
segmented fit driver works around, optim/segmented.py). The math is
identical: _hmc_transition/_nuts_transition + dual-averaging warmup.

  hmc   fixed n_leapfrog=16 — seconds/leapfrog = wall /
        (transitions * (16 + 1)) is a clean cost anchor.
  nuts  adaptive trees, max_depth=6 (64-leapfrog dispatch ceiling);
        seconds/transition + acceptance reported.

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
HMC_WARMUP = 20
HMC_SAMPLES = 20
HMC_LEAPFROG = 16
NUTS_WARMUP = 10
NUTS_SAMPLES = 10
NUTS_MAX_DEPTH = 6
HMC_EPS = 0.05


def main():
    import jax
    import jax.numpy as jnp

    from gp_ss_ak_tpu.bayes import hmc as H
    from gp_ss_ak_tpu.bayes.priors import default_box, \
        make_log_posterior
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

    # the custom-VJP wrapper bayes.api builds around an explicit
    # (value, grad) objective — reverse-mode never enters the engine
    @jax.custom_vjp
    def nlml_cv(t):
        v, _ = hook(t)
        return v

    nlml_cv.defvjp(lambda t: hook(t), lambda g, ct: (ct * g,))

    p = model.n_params
    box = default_box(p, jnp.float32)
    log_post = make_log_posterior(nlml_cv, box, None)
    lp_grad = jax.value_and_grad(log_post)

    def log_post_grad(z):
        v, g = lp_grad(z)
        v = jnp.where(jnp.isnan(v), -jnp.inf, v)
        g = jnp.where(jnp.isnan(g), 0.0, g)
        return v, g

    inv_mass = jnp.ones((p,), jnp.float32)
    z0 = box.inverse(model.pack())

    out = {"backend": jax.default_backend(), "n": N,
           "nlml_engine": "iterative (auto mode -> materialized chol "
                          "at this N; exact value, Hutchinson grad)",
           "dispatch": "host-paced, one transition per dispatch"}

    # --- HMC: exact leapfrog accounting -------------------------------
    # FIXED step size chosen by a short scan (20-transition dual
    # averaging is too short to settle and can collapse eps to 0 —
    # measured); eps rides as a traced ARGUMENT so every phase reuses
    # one compiled transition program
    hmc_step = jax.jit(lambda z, key, e: H._hmc_transition(
        log_post_grad, z, key, e, HMC_LEAPFROG, inv_mass))
    walls = []
    scan_keys = jax.random.split(jax.random.PRNGKey(7), 6)
    chosen, scan_rows = None, []
    for eps_try in (0.05, 0.0125, 0.003125, 0.0008):
        aps_try = []
        z = z0
        for key in scan_keys:
            t1 = time.perf_counter()
            z, ap = jax.block_until_ready(
                hmc_step(z, key, jnp.float32(eps_try)))
            walls.append(time.perf_counter() - t1)
            aps_try.append(float(ap))
        scan_rows.append({"eps": eps_try,
                          "accept": round(float(np.mean(aps_try)), 3)})
        print(scan_rows[-1], flush=True)
        if chosen is None and np.mean(aps_try) >= 0.5:
            chosen = eps_try
    chosen = chosen or 0.0008
    keys = jax.random.split(jax.random.PRNGKey(0), HMC_SAMPLES)
    z = z0
    aps = []
    t0 = time.perf_counter()
    for key in keys:
        t1 = time.perf_counter()
        z, ap = jax.block_until_ready(
            hmc_step(z, key, jnp.float32(chosen)))
        walls.append(time.perf_counter() - t1)
        aps.append(float(ap))
    wall = time.perf_counter() - t0
    steady = float(np.median(walls[1:]))
    out["hmc"] = {
        "transitions": HMC_SAMPLES,
        "n_leapfrog_per_transition": HMC_LEAPFROG,
        "eps_scan": scan_rows,
        "step_size": chosen,
        "wall_s": round(wall, 1),
        "compile_s": round(walls[0] - steady, 1),
        "s_per_transition_steady": round(steady, 2),
        "s_per_leapfrog": round(steady / (HMC_LEAPFROG + 1), 3),
        "mean_accept": float(np.mean(aps)),
        "theta_finite": bool(np.isfinite(
            np.asarray(box.forward(z))).all()),
    }
    eps = jnp.float32(chosen)
    print(json.dumps(out["hmc"]), flush=True)

    # --- NUTS: a few adaptive transitions -----------------------------
    nuts_step = jax.jit(lambda z, key: H._nuts_transition(
        log_post_grad, z, key, eps, inv_mass, NUTS_MAX_DEPTH))
    keys = jax.random.split(jax.random.PRNGKey(1),
                            NUTS_WARMUP + NUTS_SAMPLES)
    z = z0
    aps_n = []
    t0 = time.perf_counter()
    for t, key in enumerate(keys):
        z, ap = jax.block_until_ready(nuts_step(z, key))
        if t >= NUTS_WARMUP:
            aps_n.append(float(ap))
    wall_n = time.perf_counter() - t0
    out["nuts"] = {
        "transitions": NUTS_WARMUP + NUTS_SAMPLES,
        "max_depth": NUTS_MAX_DEPTH,
        "step_size": float(eps),
        "wall_s": round(wall_n, 1),
        "s_per_transition": round(
            wall_n / (NUTS_WARMUP + NUTS_SAMPLES), 2),
        "mean_accept_stat": float(np.mean(aps_n)),
        "theta_finite": bool(np.isfinite(
            np.asarray(box.forward(z))).all()),
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
