"""Inference: exact (warped-)Gaussian GP regression + generic Laplace."""

from gp_ss_ak_tpu.inference import (
    iterative,
    laplace,
    likelihoods,
    quadrature,
    sgpr,
    warping,
)
from gp_ss_ak_tpu.inference.gaussian import (
    Posterior,
    factorize,
    nlml,
    posterior_mean_var,
    predict,
)
from gp_ss_ak_tpu.inference.likelihoods import (
    LIK_GAUSSIAN,
    LIK_WARPGAUSS,
    Gaussian,
    WarpedGaussian,
    make_likelihood,
)

__all__ = [
    "Posterior",
    "factorize",
    "nlml",
    "posterior_mean_var",
    "predict",
    "Gaussian",
    "WarpedGaussian",
    "make_likelihood",
    "LIK_GAUSSIAN",
    "LIK_WARPGAUSS",
    "laplace",
    "sgpr",
    "iterative",
    "likelihoods",
    "warping",
    "quadrature",
]
