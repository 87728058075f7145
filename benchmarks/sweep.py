"""Benchmark sweep: NLML+grad, Gram build, Cholesky, prediction
throughput across N — writes benchmarks/results.json.

Run on the TPU (plain `python benchmarks/sweep.py`); each phase is
timed with compile excluded. The achieved-TFLOP/s columns use the
estimators in utils/profiling (BASELINE.md metric).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(ns=(1024, 2048, 4096, 8192), reps=10):
    import jax
    import jax.numpy as jnp

    from gp_ss_ak_tpu.model import default_model
    from gp_ss_ak_tpu.ops.fused import maybe_fused_A
    from gp_ss_ak_tpu.optim import flat_nlml_fn
    from gp_ss_ak_tpu.serve import Predictor
    from gp_ss_ak_tpu.utils import (
        achieved_tflops,
        cholesky_flops,
        gram_flops,
        timeit_fn,
    )

    rng = np.random.default_rng(0)
    results = {"backend": jax.default_backend(), "rows": []}
    for n in ns:
        X = jnp.asarray(rng.uniform(-1, 1, size=(n, 3)), jnp.float32)
        y = jnp.asarray(np.sin(np.asarray(X) @ np.array(
            [3.0, 1.0, 2.0], np.float32)), jnp.float32)
        model = default_model(3, dtype=jnp.float32)
        sn2 = model.lik_hypers[0]
        kern, params = model.kernel, model.kernel_params

        gram = jax.jit(lambda X: maybe_fused_A(kern, params, sn2, X,
                                               fused=None))
        t_gram = timeit_fn(gram, X, reps=reps)

        A = gram(X)
        with jax.default_matmul_precision("highest"):
            chol = jax.jit(jnp.linalg.cholesky)
        t_chol = timeit_fn(chol, A, reps=reps)

        f = flat_nlml_fn(model)
        vg = jax.jit(jax.value_and_grad(lambda p: f(p, X, y)))
        t_vg = timeit_fn(lambda p: vg(p)[0], model.pack(), reps=reps)

        server = Predictor(model, X, y)
        Xq = jnp.asarray(rng.uniform(-1, 1, size=(4096, 3)), jnp.float32)
        t_pred = timeit_fn(server._predict, Xq, reps=reps)

        row = {
            "n": n,
            "gram_ms": round(t_gram * 1e3, 3),
            "gram_tflops": round(achieved_tflops(
                gram_flops(n, n, 3), t_gram), 3),
            "chol_ms": round(t_chol * 1e3, 3),
            "chol_tflops": round(achieved_tflops(
                cholesky_flops(n), t_chol), 3),
            "nlml_grad_ms": round(t_vg * 1e3, 3),
            "pred4096_ms": round(t_pred * 1e3, 3),
            "pred_per_s": round(4096 / t_pred, 0),
        }
        results["rows"].append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")
    with open(out, "w") as fo:
        json.dump(results, fo, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
