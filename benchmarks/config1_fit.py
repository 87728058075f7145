"""BASELINE.json config 1: "1D synthetic GP, ExpAns kernel, N=1k,
LBFGS hyperparam fit". End-to-end training wall-clock + fit quality.

Runs on whatever backend jax selects; pass --f64 for CPU parity runs.
Writes one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(f64: bool = False, iters: int = 60):
    import jax

    if f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from gp_ss_ak_tpu.inference import predict
    from gp_ss_ak_tpu.model import default_model
    from gp_ss_ak_tpu.optim import fit

    dtype = jnp.float64 if f64 else jnp.float32
    rng = np.random.default_rng(0)
    n = 1000
    X = np.sort(rng.uniform(-1, 1, size=(n, 1)), axis=0)
    y = np.sin(6.0 * X[:, 0]) + 0.1 * rng.normal(size=n)

    model = default_model(input_dim=1, dtype=dtype)
    t0 = time.perf_counter()
    fitted, res = fit(model, X, y, optimizer="LBFGS", iters=iters)
    wall = time.perf_counter() - t0

    mu, _ = predict(fitted.kernel, fitted.kernel_params,
                    fitted.lik_hypers, jnp.asarray(X, dtype),
                    jnp.asarray(y, dtype), jnp.asarray(X, dtype),
                    fitted.likelihood)
    mse = float(np.mean((np.asarray(mu) - y) ** 2))
    print(json.dumps({
        "config": "1d_synthetic_n1000_expans_lbfgs",
        "backend": jax.default_backend(),
        "dtype": "f64" if f64 else "f32",
        "fit_wall_s": round(wall, 2),
        "iters": res.n_iters,
        "evals": res.n_evals,
        "nlml_final": round(res.fun, 3),
        "train_mse": round(mse, 5),
        "noise_floor": 0.01,
    }))


if __name__ == "__main__":
    main(f64="--f64" in sys.argv)
