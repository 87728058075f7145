"""Serving throughput PAST the dense wall (VERDICT r4 #5): preds/s
through the matrix-free IterativePredictor at n_train = 65536/100000,
mean+var and mean-only, vs batch size.

The dense Predictor's GEMM path stops at n_train ~ 32k (A + L = 8 N^2
bytes); these are the at-scale rows the reference's test-mode contract
(gp_ss_ak.cpp:332-508) maps onto up there. Cost model being measured:

  mean-only   one chunked cross-kernel pass per batch, O(N M d) —
              no solves after the one-time alpha setup.
  mean+var    + one whitened batched-CG solve per SOLVE_COL_BLOCK
              (=1024) query columns — each CG iteration is a full
              O(N^2) streamed operator pass shared by all columns in
              the block, so variance serving at this scale is
              cg_iters x O(N^2) per 1024 queries. The 16k/32k GEMM
              rows (serving_batch_sweep_*) are the O(n^2)/query floor
              this should be compared against.

Host-paced timing (the predictor's batch loop IS host-driven): median
wall over reps per batch size, first call (compile) reported apart.

Usage (TPU host, run alone):
  python benchmarks/serving_iterative.py [--n-train 65536]
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

BATCHES = [1024, 4096, 16384]
REPS = 3
#: mean+var above this batch is pure repetition of the same per-1024
#: chunk cost (and takes ~cg_iters x the GEMM-floor flops PER CHUNK)
#: - measure it once at the cap, extrapolate linearly
MAX_VAR_BATCH = 4096


def main():
    import jax
    import jax.numpy as jnp

    from gp_ss_ak_tpu.model import default_model
    from gp_ss_ak_tpu.serve import IterativePredictor

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=65536)
    ap.add_argument("--cg-tol", type=float, default=1e-3,
                    help="variance-solve tolerance (1e-3 ~ the "
                         "training engine's stream setting; variance "
                         "is reported to ~3 decimals anyway)")
    args = ap.parse_args()
    n = args.n_train

    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    y = (np.sin(X @ np.array([3.0, 1.0, 2.0], np.float32))
         + 0.1 * rng.standard_normal(n).astype(np.float32))
    model = default_model(3, dtype=jnp.float32)

    t0 = time.perf_counter()
    server = IterativePredictor(model, X, y, cg_tol=args.cg_tol)
    setup_s = time.perf_counter() - t0

    rows = []
    for m in BATCHES:
        Xq = rng.uniform(-1, 1, (m, 3)).astype(np.float32)
        row = {"batch": m}
        for mode, mean_only in (("mean_only", True), ("mean_var",
                                                      False)):
            if not mean_only and m > MAX_VAR_BATCH:
                row[mode] = {"skipped": f"var cost is linear in "
                             f"batch; see batch<={MAX_VAR_BATCH}"}
                continue
            try:
                reps = REPS if mean_only else max(1, REPS - 1)
                walls = []
                for r in range(reps + 1):
                    t1 = time.perf_counter()
                    mu, var = server(Xq, batch_size=min(m, 4096),
                                     mean_only=mean_only)
                    walls.append(time.perf_counter() - t1)
                assert np.isfinite(mu).all()
                med = float(np.median(walls[1:]) if len(walls) > 1
                            else walls[0])
                row[mode] = {
                    "s_per_batch": round(med, 3),
                    "preds_per_s": round(m / med, 1),
                    "first_call_s": round(walls[0], 3),
                }
                if not mean_only:
                    row[mode]["cg_iters_last"] = server.last_cg_iters
            except Exception as e:  # noqa: BLE001 - record OOM rows
                row[mode] = {"error": str(e)[:200]}
                jax.clear_caches()
        rows.append(row)
        print(json.dumps(row), flush=True)
        _write(n, server, setup_s, args, rows)
    _write(n, server, setup_s, args, rows)
    print(f"wrote serving_iterative_n{n} -> {RESULTS}")


def _write(n, server, setup_s, args, rows):
    import jax

    data = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            data = json.load(f)
    data[f"serving_iterative_n{n}"] = {
        "backend": jax.default_backend(),
        "n_train": n,
        "engine": "IterativePredictor (whitened CG, streamed Pallas "
                  "operator; K never materialized)",
        "setup_s": round(setup_s, 1),
        "setup_cg_iters": server.setup_cg_iters,
        "precond_rank": server.precond_rank,
        "cg_tol": args.cg_tol,
        "note": "host-paced wall per batch; mean+var pays one "
                "whitened CG per 1024 query columns (each iteration "
                "a full O(N^2) operator pass) — compare against the "
                "O(n^2)/query GEMM floor in serving_batch_sweep_*",
        "rows": rows,
        "ts": time.strftime("%F %T"),
    }
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=1)


if __name__ == "__main__":
    main()
