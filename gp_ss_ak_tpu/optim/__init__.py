"""Optimizers: bound-constrained L-BFGS (host + jittable), dense
BFGS, and SCG."""

from gp_ss_ak_tpu.optim import jax_lbfgs
from gp_ss_ak_tpu.optim.api import fit, flat_nlml_fn, make_value_and_grad
from gp_ss_ak_tpu.optim.bfgs import DenseBFGS
from gp_ss_ak_tpu.optim.lbfgsb import (
    DEFAULT_LOWER,
    DEFAULT_UPPER,
    LBFGSB,
    OptResult,
)
from gp_ss_ak_tpu.optim.scg import SCG

__all__ = [
    "fit",
    "DenseBFGS",
    "flat_nlml_fn",
    "make_value_and_grad",
    "LBFGSB",
    "SCG",
    "OptResult",
    "jax_lbfgs",
    "DEFAULT_LOWER",
    "DEFAULT_UPPER",
]
