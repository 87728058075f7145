"""Isotropic stationary kernels: RBF and Exponential.

Reference behavior being matched (not ported):
- RBF: k = sigma^2 * exp(-0.5 * w * d2), d2 = hyp^-2 ||x-y||^2
  (Kern_RBF::computeK, Kernel.cpp:482-488; params Hayper_Euc_RBF,
  inverseWidth_RBF, Sigma_RBF with inits 0.5/0.9/0.5,
  Kernel.cpp:424-430).
- Exponential: k = sigma^2 * exp(-sqrt(d2)) (Kern_Exponential,
  Kernel.cpp:636-642; params Hayper_Euc_Exp, Sigma_Exp, inits 0.5/0.9).

Gradients come from jax.grad through these closed forms; the
reference's analytic gradients (Kernel.cpp:491-541, 645-695) are the
test oracle, including the zeroed diagonal of d k/d(d2) at d = 0
(handled by `safe_sqrt`).
"""

from __future__ import annotations

import jax.numpy as jnp

from gp_ss_ak_tpu.kernels.base import Kernel, Params
from gp_ss_ak_tpu.kernels.distance import safe_sqrt, sq_euclidean


class RBF(Kernel):
    name = "RBF"
    param_suffix = "RBF"
    param_names = ("Hayper_Euc", "inverseWidth", "Sigma")
    init_values = (0.5, 0.9, 0.5)

    def matrix(self, params: Params, X1, X2, same: bool = False):
        d2 = sq_euclidean(X1, X2, params["Hayper_Euc"], same)
        var2 = params["Sigma"] * params["Sigma"]
        return var2 * jnp.exp(-0.5 * params["inverseWidth"] * d2)

    def diag(self, params: Params, X):
        var2 = params["Sigma"] * params["Sigma"]
        return jnp.full((X.shape[0],), 1.0, X.dtype) * var2


class Exponential(Kernel):
    name = "Exp"
    param_suffix = "Exp"
    param_names = ("Hayper_Euc", "Sigma")
    init_values = (0.5, 0.9)

    def matrix(self, params: Params, X1, X2, same: bool = False):
        d2 = sq_euclidean(X1, X2, params["Hayper_Euc"], same)
        var2 = params["Sigma"] * params["Sigma"]
        return var2 * jnp.exp(-safe_sqrt(d2))

    def diag(self, params: Params, X):
        var2 = params["Sigma"] * params["Sigma"]
        return jnp.full((X.shape[0],), 1.0, X.dtype) * var2
