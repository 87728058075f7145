"""A delivered hyperposterior at N=16384 (VERDICT r4 #3; BASELINE
config 4) — not a stopwatch anchor.

What bayes_at_scale.py measured was COST (s/leapfrog at a scanned
fixed step). This driver delivers the POSTERIOR:

  warmup   host-paced dual averaging (bayes.hmc._da_update — the same
           recipe the monolithic lax.scan warmup compiles) in two
           phases: (1) adapt eps under identity mass while estimating
           a diagonal mass matrix from the second half, (2) re-adapt
           eps under the new mass. One jitted transition program
           serves every phase (eps and inv_mass ride as traced args).
  sample   >= 2 chains x SAMPLES HMC transitions at the frozen
           (eps_bar, mass); accept target 0.8.
  quality  rank-normalized split-R-hat + bulk/tail ESS
           (bayes.diagnostics, Vehtari et al. 2021) over the pooled
           chains, and a posterior-predictive mixture (law of total
           variance over thinned hyper draws, bayes.api
           .predictive_mixture) scored on a holdout: MSE + mean NLPD
           vs the point-estimate L-BFGS fit.
  nuts     a short NUTS segment at the ADAPTED (eps, mass) — the r4
           0.15-accept NUTS row reused a plain-HMC step size without
           adaptation; this records what adapted NUTS actually does.

Transitions are host-paced (one jitted transition per dispatch) —
the monolithic all-transitions scan is a single multi-minute dispatch
the tunneled TPU worker does not survive (optim/segmented.py has the
same workaround). Writes results.json["bayes_posterior_n16384"].

Usage (TPU host, run alone): python benchmarks/bayes_posterior.py
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
N_HOLDOUT = 2048
CHAINS = 2
WARMUP_PHASE1 = 60      # eps adaptation under identity mass
WARMUP_PHASE2 = 40      # eps re-adaptation under estimated mass
SAMPLES = 150           # per chain
LEAPFROG = 16
TARGET_ACCEPT = 0.8
NUTS_TRANSITIONS = 10
NUTS_MAX_DEPTH = 6
MIX_DRAWS = 24          # thinned hyper draws for the predictive mix
FIT_ITERS = 40


def _problem():
    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (N + N_HOLDOUT, 3)).astype(np.float32)
    y = (np.sin(X @ np.array([3.0, 1.0, 2.0], np.float32))
         + 0.1 * rng.standard_normal(N + N_HOLDOUT).astype(np.float32))
    return X[:N], y[:N], X[N:], y[N:]


def main():
    import jax
    import jax.numpy as jnp

    from gp_ss_ak_tpu.bayes import hmc as H
    from gp_ss_ak_tpu.bayes.diagnostics import summarize
    from gp_ss_ak_tpu.bayes.priors import default_box, \
        make_log_posterior
    from gp_ss_ak_tpu.model import default_model
    from gp_ss_ak_tpu.optim import LBFGSB
    from gp_ss_ak_tpu.optim.iterative_fit import (
        make_iterative_value_and_grad,
    )

    X, y, Xh, yh = _problem()
    model = default_model(3, dtype=jnp.float32)
    expans = model.kernel.children[0]
    nk_ = model.kernel.n_params

    def _identified(theta_cs):
        """Map raw hyper draws (chains, samples, p) -> IDENTIFIED
        quantities: the 6 unique entries of G = M M^T (the actual
        distance metric — the rotation-angle parametrization of M is
        non-identifiable: many (AngleX, AngleY, AngleZ, widths)
        tuples give the same metric, so the posterior has an exact
        flat RIDGE along which chains wander freely and raw-coordinate
        R-hat can never converge; the reference shares this
        parametrization, Kernel.cpp:737-773) plus sigma, bias, sn2 —
        everything the MODEL's predictions depend on."""
        iu = np.triu_indices(3)

        def one(flat):
            ep, bp = model.kernel.unpack(flat[:nk_])
            M = expans.metric(ep, 3)
            G = (M @ M.T)[iu]
            return jnp.concatenate([
                G, jnp.stack([ep["Sigma"], bp["Sigma"], flat[nk_]])])

        th = jnp.asarray(theta_cs.reshape(-1, theta_cs.shape[-1]),
                         jnp.float32)
        out = np.asarray(jax.vmap(one)(th))
        return out.reshape(theta_cs.shape[0], theta_cs.shape[1], -1)
    vg = make_iterative_value_and_grad(model, X, y)
    hook = vg.traceable
    out = {"backend": jax.default_backend(), "n": N,
           "holdout": N_HOLDOUT, "chains": CHAINS,
           "dispatch": "host-paced, one transition per dispatch"}
    t_all = time.perf_counter()

    # --- point-estimate baseline (the thing the posterior must beat
    # or match): host L-BFGS on the same engine ------------------------
    t0 = time.perf_counter()
    res = LBFGSB(maxiter=FIT_ITERS).minimize(
        lambda x: tuple(np.asarray(v) for v in vg(x)),
        np.asarray(model.pack(), np.float64))
    fit_wall = time.perf_counter() - t0
    flat_hat = jnp.asarray(res.x, jnp.float32)
    from gp_ss_ak_tpu.serve import IterativePredictor
    from gp_ss_ak_tpu.model import GPModel
    from dataclasses import replace

    nk = model.kernel.n_params
    m_hat = replace(model,
                    kernel_params=model.kernel.unpack(flat_hat[:nk]),
                    lik_hypers=flat_hat[nk:])
    pred = IterativePredictor(m_hat, X, y, cg_tol=1e-5)
    mu_hat, var_hat = pred(Xh, batch_size=1024)
    mse_hat = float(np.mean((yh - mu_hat) ** 2))
    nlpd_hat = float(np.mean(
        0.5 * np.log(2 * np.pi * var_hat)
        + 0.5 * (yh - mu_hat) ** 2 / var_hat))
    out["point_estimate"] = {
        "fit_iters": res.n_iters, "stop_reason": res.stop_reason,
        "nlml": float(res.fun), "fit_wall_s": round(fit_wall, 1),
        "holdout_mse": round(mse_hat, 5),
        "holdout_nlpd": round(nlpd_hat, 4),
    }
    print(json.dumps(out["point_estimate"]), flush=True)

    # --- posterior machinery ------------------------------------------
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

    hmc_step = jax.jit(lambda z, key, e, im: H._hmc_transition(
        log_post_grad, z, key, e, LEAPFROG, im))
    nuts_step = jax.jit(lambda z, key, e, im: H._nuts_transition(
        log_post_grad, z, key, e, im, NUTS_MAX_DEPTH))

    ones = jnp.ones((p,), jnp.float32)
    z_map = box.inverse(flat_hat)

    # --- warmup (chain 0 adapts; other chains reuse the adaptation,
    # starting from jittered inits — the standard cheap variant) -------
    t0 = time.perf_counter()
    da = H._da_init(jnp.asarray(0.01, jnp.float32))
    z = z_map
    walls = []
    zs_phase1 = []
    key = jax.random.PRNGKey(11)
    for t in range(WARMUP_PHASE1):
        key, k = jax.random.split(key)
        eps = jnp.exp(da.log_eps)
        t1 = time.perf_counter()
        z, ap = jax.block_until_ready(hmc_step(z, k, eps, ones))
        walls.append(time.perf_counter() - t1)
        da = H._da_update(da, ap, target=TARGET_ACCEPT)
        if t >= WARMUP_PHASE1 // 2:
            zs_phase1.append(np.asarray(z))
    var = np.var(np.stack(zs_phase1), axis=0, ddof=1)
    inv_mass = jnp.asarray(np.clip(var, 1e-4, 1e4), jnp.float32)
    eps1 = float(np.exp(da.log_eps_bar))

    da = H._da_init(jnp.asarray(eps1, jnp.float32))
    aps2 = []
    for t in range(WARMUP_PHASE2):
        key, k = jax.random.split(key)
        eps = jnp.exp(da.log_eps)
        z, ap = jax.block_until_ready(hmc_step(z, k, eps, inv_mass))
        da = H._da_update(da, ap, target=TARGET_ACCEPT)
        aps2.append(float(ap))
    eps_star = float(np.exp(da.log_eps_bar))
    warmup_wall = time.perf_counter() - t0
    out["warmup"] = {
        "phase1": WARMUP_PHASE1, "phase2": WARMUP_PHASE2,
        "adapted_step_size": round(eps_star, 5),
        "phase1_step_size": round(eps1, 5),
        "inv_mass_range": [float(np.min(var)), float(np.max(var))],
        "wall_s": round(warmup_wall, 1),
        "compile_s": round(walls[0] - np.median(walls[1:]), 1),
        "accept_last10_phase2": round(float(np.mean(aps2[-10:])), 3),
    }
    print(json.dumps(out["warmup"]), flush=True)

    # --- sampling: CHAINS chains at frozen (eps_star, mass) -----------
    eps_f = jnp.asarray(eps_star, jnp.float32)
    t0 = time.perf_counter()
    chains, zchains, accepts = [], [], []
    for c in range(CHAINS):
        ck = jax.random.PRNGKey(100 + c)
        ck, kj = jax.random.split(ck)
        # overdispersed inits: jitter the warmed position
        zc = z + 0.5 * jax.random.normal(kj, z.shape, z.dtype) \
            * jnp.sqrt(inv_mass)
        draws, zdraws, aps = [], [], []
        for t in range(SAMPLES):
            ck, k = jax.random.split(ck)
            zc, ap = jax.block_until_ready(
                hmc_step(zc, k, eps_f, inv_mass))
            zdraws.append(np.asarray(zc))
            draws.append(np.asarray(box.forward(zc)))
            aps.append(float(ap))
        chains.append(np.stack(draws))
        zchains.append(np.stack(zdraws))
        accepts.append(float(np.mean(aps)))
    sample_wall = time.perf_counter() - t0
    theta = np.stack(chains)            # (chains, samples, p)
    diag = summarize(theta)
    diag_id = summarize(_identified(theta))
    out["sampling"] = {
        "samples_per_chain": SAMPLES,
        "step_size": round(eps_star, 5),
        "n_leapfrog": LEAPFROG,
        "mean_accept_per_chain": [round(a, 3) for a in accepts],
        "wall_s": round(sample_wall, 1),
        "s_per_transition": round(
            sample_wall / (CHAINS * SAMPLES), 2),
        "rhat_max": round(float(np.max(diag["rhat"])), 4),
        "ess_bulk_min": round(float(np.min(diag["ess"])), 1),
        "ess_tail_min": round(float(np.min(diag["ess_tail"])), 1),
        "rhat_max_identified": round(
            float(np.max(diag_id["rhat"])), 4),
        "ess_bulk_min_identified": round(
            float(np.min(diag_id["ess"])), 1),
        "ess_tail_min_identified": round(
            float(np.min(diag_id["ess_tail"])), 1),
        "identified_note": "raw-coordinate R-hat is dominated by the "
            "exact rotation-angle ridge of the ExpAns metric "
            "parametrization (non-identifiable, shared with the "
            "reference); *_identified rows are over G = M M^T "
            "entries + sigma/bias/sn2 — everything predictions "
            "depend on",
        "posterior_mean": [round(float(v), 4) for v in diag["mean"]],
        "posterior_std": [round(float(v), 4) for v in diag["std"]],
    }
    print(json.dumps(out["sampling"]), flush=True)
    np.savez("/tmp/bayes_posterior_draws.npz", theta_diag=theta)

    # --- dense-metric refinement --------------------------------------
    # the diagonal-mass chains above measure the problem (accept ~0.84
    # but the tight CORRELATED hyperposterior leaves R-hat >> 1 on
    # short chains); the dense metric M^-1 = cov(pooled z draws) makes
    # the transformed posterior ~isotropic (bayes.hmc
    # ._hmc_transition_full) — the Stan dense_e recipe
    z_pool = np.concatenate(zchains, axis=0)
    cov_z = np.cov(z_pool.T)
    cov_z += 1e-3 * np.mean(np.diag(cov_z)) * np.eye(p)   # ridge
    Minv_np = cov_z
    mass_np = np.linalg.inv(cov_z)
    mass_chol = jnp.asarray(np.linalg.cholesky(mass_np), jnp.float32)
    Minv = jnp.asarray(Minv_np, jnp.float32)
    full_step = jax.jit(lambda z, key, e: H._hmc_transition_full(
        log_post_grad, z, key, e, LEAPFROG, mass_chol, Minv))

    # eps in the preconditioned space: a halving SCAN first (dual
    # averaging alone can collapse after early divergences and not
    # recover in a short window — measured on the smoke run), then a
    # short DA refinement from the scanned point
    zf = z
    eps_scan = 0.4
    scan_rows = []
    while eps_scan > 1e-3:
        aps_try = []
        zt = zf
        for t in range(4):
            key, k = jax.random.split(key)
            zt, ap = jax.block_until_ready(
                full_step(zt, k, jnp.asarray(eps_scan, jnp.float32)))
            aps_try.append(float(ap))
        scan_rows.append({"eps": round(eps_scan, 4),
                          "accept": round(float(np.mean(aps_try)), 3)})
        if np.mean(aps_try) >= 0.6:
            zf = zt
            break
        eps_scan *= 0.5
    da = H._da_init(jnp.asarray(eps_scan, jnp.float32))
    for t in range(20):
        key, k = jax.random.split(key)
        zf, ap = jax.block_until_ready(
            full_step(zf, k, jnp.exp(da.log_eps).astype(jnp.float32)))
        da = H._da_update(da, ap, target=TARGET_ACCEPT)
    eps_full = float(np.exp(da.log_eps_bar))

    t0 = time.perf_counter()
    fchains, faccepts = [], []
    eps_ff = jnp.asarray(eps_full, jnp.float32)
    for c in range(CHAINS):
        ck = jax.random.PRNGKey(300 + c)
        ck, kj = jax.random.split(ck)
        # overdispersed inits: ~2 posterior sds along the dense metric
        zc = zf + 2.0 * jnp.asarray(
            np.linalg.cholesky(Minv_np) @ np.asarray(
                jax.random.normal(kj, (p,))), jnp.float32)
        draws, aps = [], []
        for t in range(SAMPLES):
            ck, k = jax.random.split(ck)
            zc, ap = jax.block_until_ready(full_step(zc, k, eps_ff))
            draws.append(np.asarray(box.forward(zc)))
            aps.append(float(ap))
        fchains.append(np.stack(draws))
        faccepts.append(float(np.mean(aps)))
    fw = time.perf_counter() - t0
    theta = np.stack(fchains)          # mixture uses these chains
    fdiag = summarize(theta)
    fdiag_id = summarize(_identified(theta))
    out["sampling_dense_metric"] = {
        "samples_per_chain": SAMPLES,
        "step_size": round(eps_full, 4),
        "n_leapfrog": LEAPFROG,
        "metric": "dense (M^-1 = cov of pooled diagonal-phase draws, "
                  "1e-3 ridge)",
        "eps_scan": scan_rows,
        "mean_accept_per_chain": [round(a, 3) for a in faccepts],
        "wall_s": round(fw, 1),
        "s_per_transition": round(fw / (CHAINS * SAMPLES), 2),
        "rhat_max": round(float(np.max(fdiag["rhat"])), 4),
        "ess_bulk_min": round(float(np.min(fdiag["ess"])), 1),
        "ess_tail_min": round(float(np.min(fdiag["ess_tail"])), 1),
        "rhat_max_identified": round(
            float(np.max(fdiag_id["rhat"])), 4),
        "ess_bulk_min_identified": round(
            float(np.min(fdiag_id["ess"])), 1),
        "ess_tail_min_identified": round(
            float(np.min(fdiag_id["ess_tail"])), 1),
        "identified_mean": [round(float(v), 5)
                            for v in fdiag_id["mean"]],
        "identified_std": [round(float(v), 6)
                           for v in fdiag_id["std"]],
        "posterior_mean": [round(float(v), 4) for v in fdiag["mean"]],
        "posterior_std": [round(float(v), 5) for v in fdiag["std"]],
    }
    print(json.dumps(out["sampling_dense_metric"]), flush=True)
    np.savez("/tmp/bayes_posterior_draws_dense.npz", theta=theta)

    # --- adapted NUTS segment (fixes the r4 0.15-accept row) ----------
    if NUTS_TRANSITIONS:
        t0 = time.perf_counter()
        zn = z
        aps_n = []
        nk_key = jax.random.PRNGKey(500)
        for t in range(NUTS_TRANSITIONS):
            nk_key, k = jax.random.split(nk_key)
            zn, ap = jax.block_until_ready(
                nuts_step(zn, k, eps_f, inv_mass))
            aps_n.append(float(ap))
        nuts_wall = time.perf_counter() - t0
        out["nuts_adapted"] = {
            "transitions": NUTS_TRANSITIONS,
            "max_depth": NUTS_MAX_DEPTH,
            "step_size": round(eps_star, 5),
            "mean_accept_stat": round(float(np.mean(aps_n[1:])), 3),
            "s_per_transition": round(nuts_wall / NUTS_TRANSITIONS, 2),
            "note": "same adapted (eps, mass) as HMC sampling; the r4 "
                    "0.15-accept row used an unadapted plain-HMC eps",
        }
        print(json.dumps(out["nuts_adapted"]), flush=True)

    # --- predictive mixture on the holdout ----------------------------
    # host-paced variant of bayes.api.predictive_mixture (same law-of-
    # total-variance math; one dense-predict dispatch per draw instead
    # of one lax.map over all draws — tunnel-safe at 16k^2 per chol)
    from gp_ss_ak_tpu.inference import gaussian

    t0 = time.perf_counter()
    thin = max(1, (CHAINS * SAMPLES) // MIX_DRAWS)
    th = theta.reshape(-1, theta.shape[-1])[::thin]
    Xd, yd = jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)
    Xhd = jnp.asarray(Xh, jnp.float32)

    @jax.jit
    def one_draw(flat):
        kp = model.kernel.unpack(flat[:nk])
        lh = flat[nk:]
        return gaussian.predict(model.kernel, kp, lh, Xd, yd, Xhd,
                                model.likelihood)

    mus, vars_ = [], []
    for flat in th:
        mu_d, var_d = jax.block_until_ready(
            one_draw(jnp.asarray(flat, jnp.float32)))
        mus.append(np.asarray(mu_d))
        vars_.append(np.asarray(var_d))
    mus = np.stack(mus)
    vars_ = np.stack(vars_)
    mu_mix = mus.mean(axis=0)
    var_mix = np.maximum(
        (vars_ + mus ** 2).mean(axis=0) - mu_mix ** 2, 1e-12)
    mse_mix = float(np.mean((yh - mu_mix) ** 2))
    nlpd_mix = float(np.mean(
        0.5 * np.log(2 * np.pi * var_mix)
        + 0.5 * (yh - mu_mix) ** 2 / var_mix))
    out["predictive_mixture"] = {
        "draws": int(np.ceil(CHAINS * SAMPLES / thin)),
        "holdout_mse": round(mse_mix, 5),
        "holdout_nlpd": round(nlpd_mix, 4),
        "vs_point_estimate_mse": round(mse_hat, 5),
        "vs_point_estimate_nlpd": round(nlpd_hat, 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(out["predictive_mixture"]), flush=True)
    out["total_wall_s"] = round(time.perf_counter() - t_all, 1)
    out["ts"] = time.strftime("%F %T")

    data = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            data = json.load(fh)
    data["bayes_posterior_n16384"] = out
    with open(RESULTS, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"wrote bayes_posterior_n16384 -> {RESULTS}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny-N CPU smoke run (no results.json write)")
    ap.add_argument("--samples", type=int, default=None,
                    help="override SAMPLES per chain")
    ap.add_argument("--skip-nuts", action="store_true")
    args = ap.parse_args()
    if args.samples:
        SAMPLES = args.samples
    if args.skip_nuts:
        NUTS_TRANSITIONS = 0
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")  # beat sitecustomize
        N, N_HOLDOUT, CHAINS = 256, 64, 2
        WARMUP_PHASE1, WARMUP_PHASE2, SAMPLES = 10, 6, 12
        NUTS_TRANSITIONS, MIX_DRAWS, FIT_ITERS = 2, 4, 5
        RESULTS = "/tmp/bayes_posterior_smoke.json"
    main()
