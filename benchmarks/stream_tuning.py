"""Stream-mode CG wall diagnosis (VERDICT r3 next-round #4).

The round-3 65k/100k eval rows pinned PCG at its 800-iteration cap
with no record of the achieved residual or the preconditioner rank, so
the rows couldn't say whether the auto rank was too lean or cg_tol was
unreachable. This sweep answers that directly: one segmented
NLML+gradient evaluation at each (N, precond_rank, cg_tol) cell,
recording per-eval wall, CG iterations, and the achieved worst-column
relative residual (optim/segmented now reports both).

Each PCG iteration at stream N is one full O(N^2) Pallas pass over the
Gram tiles — rank is cheap next to iterations saved (the pivoted build
is O(N k (d + k)) once; each Woodbury apply O(N k)) until the rank-k
state (L + Q, 8 N k bytes) presses HBM.

Writes results.json["stream_tuning"]; the winning settings feed the
flagship N=100k fit (large_n.fit_100000).

Usage (TPU host): python benchmarks/stream_tuning.py \
    [--sizes 65536,100000] [--ranks 1024,2048] [--tols 1e-3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
RESULTS = os.path.join(HERE, "results.json")

#: estimator settings matching large_n.STREAM_OPTS (the operative
#: large-N fit settings) so the sweep times what the fit will run
BASE = dict(lanczos_iters=16, slq_probes=16, probes=8)


def run_cell(n, rank, tol, X, y, model):
    from gp_ss_ak_tpu.optim.segmented import (
        make_segmented_value_and_grad,
    )

    vg = make_segmented_value_and_grad(
        model, X, y, precond_rank=rank, cg_tol=tol, **BASE)
    flat = np.asarray(model.pack(), np.float64)
    t0 = time.perf_counter()
    v, g = vg(flat)
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    v2, _ = vg(flat * (1.0 + 1e-4))
    eval_s = time.perf_counter() - t0
    return {
        "n": n,
        "precond_rank": rank,
        "cg_tol": tol,
        "nlml": float(v),
        "first_eval_s": round(first_s, 1),     # includes compile
        "eval_s": round(eval_s, 1),
        "cg_iters": vg.last_cg_iters,
        "cg_rel_residual": vg.last_rel_residual,
        "grad_finite": bool(np.isfinite(g).all()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="65536,100000")
    ap.add_argument("--ranks", default="1024,2048")
    ap.add_argument("--tols", default="1e-3")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gp_ss_ak_tpu.model import default_model

    rows = []
    for n in [int(s) for s in args.sizes.split(",")]:
        rng = np.random.default_rng(0)
        X = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        y = (np.sin(X @ np.array([3.0, 1.0, 2.0], np.float32))
             + 0.1 * rng.standard_normal(n).astype(np.float32))
        model = default_model(3, dtype=jnp.float32)
        for rank in [int(r) for r in args.ranks.split(",")]:
            for tol in [float(t) for t in args.tols.split(",")]:
                try:
                    row = run_cell(n, rank, tol, X, y, model)
                except Exception as e:  # noqa: BLE001
                    row = {"n": n, "precond_rank": rank, "cg_tol": tol,
                           "error": str(e)[:300],
                           "diagnosis": "cell failed — if "
                           "RESOURCE_EXHAUSTED the rank-k state "
                           "(8 N k B) plus solver state exceeded HBM "
                           "at this N; retry a smaller rank"}
                rows.append(row)
                print(json.dumps(row), flush=True)
                jax.clear_caches()

    data = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            data = json.load(fh)
    prev = {(r["n"], r["precond_rank"], r["cg_tol"]): r
            for r in data.get("stream_tuning", {}).get("rows", [])
            if "precond_rank" in r}
    for r in rows:
        if "precond_rank" in r:
            prev[(r["n"], r["precond_rank"], r["cg_tol"])] = r
    data["stream_tuning"] = {
        "backend": jax.default_backend(),
        "note": ("segmented stream evaluator, one NLML+grad per cell; "
                 "eval_s excludes compile (first_eval_s includes it); "
                 "cg_rel_residual is the worst-column achieved "
                 "||r||/||b||"),
        "rows": sorted(prev.values(),
                       key=lambda r: (r["n"], r["precond_rank"])),
        "ts": time.strftime("%F %T"),
    }
    with open(RESULTS, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"wrote stream_tuning -> {RESULTS}")


if __name__ == "__main__":
    main()
