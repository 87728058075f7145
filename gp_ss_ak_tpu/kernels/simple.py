"""Bias and White-noise kernels.

- Bias: k = sigma_b everywhere (NOT squared — Kern_Bias::computeK fills
  K with Sigma_Bias, Kernel.cpp:362-367; init 0.2, Kernel.cpp:317-319).
  The reference CLI appends a Bias kernel as its de-facto noise
  component (gp_ss_ak.cpp:185-190).
- White: k = sigma_w on the diagonal, only when the two point sets are
  the same (the reference checks X1(0)==X2(0) && equal row counts,
  Kernel.cpp:256-263; here that is the static ``same`` flag, which is
  trace-safe). Init 0.10 (Kernel.cpp:214-217). Note the reference's
  Kern_White cannot be *trained* (missing getGradients override causes
  base-class self-recursion, Kernel.h:56-59) — a quirk we do not
  replicate; jax.grad of this closed form is well-defined.
"""

from __future__ import annotations

import jax.numpy as jnp

from gp_ss_ak_tpu.kernels.base import Kernel, Params


class Bias(Kernel):
    name = "Bias"
    param_suffix = "Bias"
    param_names = ("Sigma",)
    init_values = (0.2,)

    def matrix(self, params: Params, X1, X2, same: bool = False):
        shape = (X1.shape[0], X2.shape[0])
        return jnp.broadcast_to(params["Sigma"], shape).astype(X1.dtype)

    def diag(self, params: Params, X):
        return jnp.broadcast_to(params["Sigma"], (X.shape[0],)).astype(X.dtype)


class White(Kernel):
    name = "White Noise"  # written name, Kernel.cpp:208
    param_suffix = "White"
    param_names = ("Sigma",)
    init_values = (0.10,)

    def matrix(self, params: Params, X1, X2, same: bool = False):
        shape = (X1.shape[0], X2.shape[0])
        if not same:
            return jnp.zeros(shape, X1.dtype)
        n = min(shape)
        eye = jnp.eye(*shape, dtype=X1.dtype)
        del n
        return params["Sigma"] * eye

    def diag(self, params: Params, X):
        return jnp.broadcast_to(params["Sigma"], (X.shape[0],)).astype(X.dtype)
