"""Training driver: glue between GPModel, the jitted NLML and the
optimizers (the role of GP_utils::OptimisePars + Opt_Algs::Optimise,
GP_Utils.cpp:1288-1301 / Opt_pars.h:176-195).

The objective is ONE jitted function of the flat hyper vector; its
gradient is jax.grad of the exact NLML. Optimizer names mirror the CLI
("LBFGS", "BFGS", "SCG", gp_ss_ak.cpp:286-293); BFGS maps to the
L-BFGS-B driver with full memory (dense-Hessian BFGS at p ~ 10 is the
same fixed point).
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gp_ss_ak_tpu.inference import gaussian
from gp_ss_ak_tpu.model import GPModel
from gp_ss_ak_tpu.optim.lbfgsb import (
    DEFAULT_LOWER,
    DEFAULT_UPPER,
    LBFGSB,
    OptResult,
)
from gp_ss_ak_tpu.optim.scg import SCG


def flat_nlml_fn(model: GPModel, X, y, jitter: float = 0.0):
    """Returns nlml(flat_params) as a pure jax function (jit/grad-able)."""
    kernel = model.kernel
    likelihood = model.likelihood
    nk = kernel.n_params
    nl = int(np.size(model.lik_hypers))

    def f(flat, X, y):
        kp = kernel.unpack(flat[:nk])
        lh = flat[nk : nk + nl]
        return gaussian.nlml(kernel, kp, lh, X, y, likelihood, jitter)

    return f


def make_value_and_grad(model: GPModel, X, y, jitter: float = 0.0,
                        dtype=None):
    """Host-callable (f, g) closure over a single jitted TPU program."""
    dtype = dtype or jnp.result_type(model.pack())
    Xd = jnp.asarray(X, dtype)
    yd = jnp.asarray(y, dtype)
    f = flat_nlml_fn(model, Xd, yd, jitter)
    vg = jax.jit(jax.value_and_grad(lambda flat: f(flat, Xd, yd)))

    def value_and_grad(x_np: np.ndarray):
        val, grad = vg(jnp.asarray(x_np, dtype))
        return float(val), np.asarray(grad, np.float64)

    return value_and_grad


def fit(
    model: GPModel,
    X,
    y,
    optimizer: str = "LBFGS",
    iters: int = 100,
    lower: Optional[np.ndarray] = None,
    upper: Optional[np.ndarray] = None,
    jitter: float = 0.0,
    verbose: int = 0,
    callback=None,
) -> Tuple[GPModel, OptResult]:
    """Maximize the marginal likelihood over the box [1e-4, 6]^p."""
    x0 = np.asarray(model.pack(), np.float64)
    p = x0.shape[0]
    lb = np.full(p, DEFAULT_LOWER) if lower is None else np.asarray(lower)
    ub = np.full(p, DEFAULT_UPPER) if upper is None else np.asarray(upper)
    vgrad = make_value_and_grad(model, X, y, jitter)

    name = optimizer.upper()
    if name in ("LBFGS", "BFGS", "LBFGSB", "L-BFGS-B"):
        opt = LBFGSB(maxiter=iters, verbose=verbose,
                     memory=(p if name == "BFGS" else 6))
    elif name == "SCG":
        opt = SCG(maxiter=iters, verbose=verbose)
    else:
        raise ValueError(f"Unrecognised optimiser type: {optimizer}")

    res = opt.minimize(vgrad, x0, lb, ub, callback=callback)
    fitted = model.unpack(jnp.asarray(res.x, jnp.result_type(model.pack())))
    fitted = replace(fitted, num_data=int(np.shape(X)[0]),
                     input_dim=int(np.shape(X)[1]))
    return fitted, res
