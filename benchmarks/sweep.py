"""Benchmark sweep: NLML+grad, Gram build, Cholesky, prediction
throughput across N — merges rows into benchmarks/results.json.

Run on the TPU (plain `python benchmarks/sweep.py`). All phases are
timed with `utils.profiling.chain_timeit`: serially-dependent
on-device repetition chains with a median null-dispatch subtraction,
so remote-transport pipelining/caching/elision cannot shrink the
numbers (the method the hand-recorded "serialized_chain_n4096"
section in results.json was measured with). Achieved-TFLOP/s columns
use the estimators in utils/profiling (BASELINE.md metric).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def matmul_sol_tflops(reps=10):
    """Measured speed-of-light reference: chain-timed 4096^3 f32
    matmul at default precision (what XLA's Cholesky/TRSM/GEMM kernels
    run at on this chip). Returns achieved TFLOP/s."""
    import jax.numpy as jnp

    from gp_ss_ak_tpu.utils import chain_timeit

    a = jnp.ones((4096, 4096), jnp.float32) / 4096.0

    def step(z, s):
        return jnp.sum((z + s * 1e-30) @ a) * 1e-12

    t = chain_timeit(step, a, reps=reps)
    return 2.0 * 4096.0 ** 3 / t / 1e12


def main(ns=(1024, 2048, 4096), reps=10):
    import jax
    import jax.numpy as jnp

    from gp_ss_ak_tpu.inference import gaussian
    from gp_ss_ak_tpu.model import default_model
    from gp_ss_ak_tpu.serve import Predictor
    from gp_ss_ak_tpu.utils import (
        achieved_tflops,
        chain_timeit,
        cholesky_flops,
        gram_flops,
    )

    rng = np.random.default_rng(0)
    sol = matmul_sol_tflops(reps=reps)
    print(json.dumps({"matmul_sol_tflops_f32_default": round(sol, 1)}),
          flush=True)
    rows = []
    for n in ns:
        X = jnp.asarray(rng.uniform(-1, 1, size=(n, 3)), jnp.float32)
        y = jnp.asarray(np.sin(np.asarray(X) @ np.array(
            [3.0, 1.0, 2.0], np.float32)), jnp.float32)
        model = default_model(3, dtype=jnp.float32)
        sn2 = model.lik_hypers[0]
        kern, params = model.kernel, model.kernel_params

        def gram_step(Xz, s):
            from gp_ss_ak_tpu.ops.fused import maybe_fused_A
            A = maybe_fused_A(kern, params, sn2, Xz + s * 1e-20)
            if A is None:
                K = kern.matrix(params, Xz + s * 1e-20, Xz, same=True)
                A = K + sn2 * jnp.eye(n, dtype=K.dtype)
            return jnp.sum(A) * 1e-9
        t_gram = chain_timeit(gram_step, X, reps=reps)

        from gp_ss_ak_tpu.ops.fused import maybe_fused_A
        A0 = maybe_fused_A(kern, params, sn2, X)
        if A0 is None:
            A0 = kern.matrix(params, X, X, same=True) + sn2 * jnp.eye(
                n, dtype=jnp.float32)
        t_chol = chain_timeit(
            lambda Az, s: jnp.log(jnp.linalg.cholesky(
                Az + s * 1e-20 * jnp.eye(n, dtype=Az.dtype))[0, 0]),
            A0, reps=reps)

        from gp_ss_ak_tpu.optim import flat_nlml_fn
        f = flat_nlml_fn(model)
        vg = jax.value_and_grad(lambda p: f(p, X, y))
        p0 = model.pack().astype(jnp.float32)

        def vg_step(p, s):
            v, g = vg(p + s * 1e-25)
            return v * 1e-6 + jnp.sum(g) * 1e-9
        t_vg = chain_timeit(vg_step, p0, reps=reps)

        server = Predictor(model, X, y)
        Xq = jnp.asarray(rng.uniform(-1, 1, size=(4096, 3)), jnp.float32)

        def pred_step(Xz, s):
            mu, var = gaussian.posterior_mean_var(
                kern, params, model.lik_hypers, server.X, server.post,
                Xz + s * 1e-20, model.likelihood)
            return jnp.sum(mu) * 1e-6 + jnp.sum(var) * 1e-9
        t_pred = chain_timeit(pred_step, Xq, reps=reps)

        row = {
            "n": n,
            "gram_ms": round(t_gram * 1e3, 3),
            "gram_tflops": round(achieved_tflops(
                gram_flops(n, n, 3), t_gram), 3),
            "chol_ms": round(t_chol * 1e3, 3),
            "chol_tflops": round(achieved_tflops(
                cholesky_flops(n), t_chol), 3),
            "chol_pct_sol": round(100.0 * achieved_tflops(
                cholesky_flops(n), t_chol) / sol, 1),
            "nlml_grad_ms": round(t_vg * 1e3, 3),
            "pred4096_ms": round(t_pred * 1e3, 3),
            "pred_per_s": round(4096 / t_pred, 0),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")
    results = {}
    if os.path.exists(out):
        with open(out) as fi:
            results = json.load(fi)
    results["backend"] = jax.default_backend()
    # merge by n so partial reruns (e.g. retrying one size) keep
    # previously measured rows
    merged = {r["n"]: r for r in results.get("rows_chain_timed", [])}
    for r in rows:
        merged[r["n"]] = r
    results["rows_chain_timed"] = [merged[k] for k in sorted(merged)]
    results["matmul_sol_tflops_f32_default"] = round(sol, 1)
    with open(out, "w") as fo:
        json.dump(results, fo, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default=None,
                    help="comma-separated N list (default 1024,2048,4096)")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    ns = (tuple(int(s) for s in args.sizes.split(","))
          if args.sizes else (1024, 2048, 4096))
    main(ns=ns, reps=args.reps)
