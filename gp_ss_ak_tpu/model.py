"""GPModel: hyperparameter container + reference-format model files.

Checkpoint philosophy copied from the reference (SURVEY.md §5): a model
file stores ONLY hyperparameters + structure (kernel blocks, counts);
posterior state (alpha / Cholesky) is re-derived from training data on
load (gp_ss_ak.cpp:382-395). File layout matches ToFile_GP_Params /
FromFile_GP_Params (GP_Utils.cpp:1324-1390) and the kernel block
format (Kernel.cpp:20-40, 55-75) line for line, so models written here
load in the reference binary and vice versa.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field, replace
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gp_ss_ak_tpu.inference.likelihoods import (
    LIK_WARPGAUSS,
    Gaussian,
    WarpedGaussian,
)
from gp_ss_ak_tpu.kernels import Kernel, Sum, make_kernel


@dataclass
class GPModel:
    kernel: Kernel
    kernel_params: object           # pytree matching kernel
    likelihood: object              # Gaussian | WarpedGaussian
    lik_hypers: jnp.ndarray
    mean_hypers: jnp.ndarray = field(
        default_factory=lambda: jnp.zeros((0,)))
    input_dim: int = 3
    output_dim: int = 1
    num_data: int = 0
    inference: str = "Lapalce"      # the reference's exact (typo'd) string
    mean_function: str = "Zero"

    # -- flat parameter vector: [kernel..., lik..., mean...] -------------
    # (get/set_GP_Pars ordering, GP_Utils.cpp:101-157)
    def pack(self) -> jnp.ndarray:
        parts = [self.kernel.pack(self.kernel_params)]
        if self.lik_hypers.size:
            parts.append(jnp.asarray(self.lik_hypers))
        if self.mean_hypers.size:
            parts.append(jnp.asarray(self.mean_hypers))
        return jnp.concatenate(parts)

    def unpack(self, flat: jnp.ndarray) -> "GPModel":
        nk = self.kernel.n_params
        nl = int(np.size(self.lik_hypers))
        kp = self.kernel.unpack(flat[:nk])
        lik = flat[nk : nk + nl]
        mean = flat[nk + nl :]
        return replace(self, kernel_params=kp, lik_hypers=lik,
                       mean_hypers=mean)

    @property
    def n_params(self) -> int:
        return self.kernel.n_params + int(np.size(self.lik_hypers)) + int(
            np.size(self.mean_hypers))


def default_model(input_dim: int, kernel_names: Optional[List[str]] = None,
                  knoise: bool = True, dtype=jnp.float64) -> GPModel:
    """CLI-equivalent default: Sum([ExpAns..., Bias]) + Gaussian noise
    (gp_ss_ak.cpp:146-196)."""
    names = kernel_names or ["ExpAns"]
    children = [make_kernel(n) for n in names]
    if knoise:
        children.append(make_kernel("Bias"))
    kern = Sum(children)
    lik = Gaussian()
    return GPModel(
        kernel=kern,
        kernel_params=kern.init_params(dtype),
        likelihood=lik,
        lik_hypers=jnp.asarray(lik.default_hypers(dtype)),
        input_dim=input_dim,
    )


# ---------------------------------------------------------------------------
# reference text model-file format
# ---------------------------------------------------------------------------

def _fmt(v: float) -> str:
    """The reference prints integral values as ints (Kernel.cpp:31-35);
    non-integral values get full precision (%.17g) — the reference's
    atof-based reader (StreamInt.h:61-64) accepts it and our own
    round-trips stay exact."""
    f = float(v)
    if f == int(f):
        return str(int(f))
    return f"{f:.17g}"


def _write_kernel(out: io.TextIOBase, kern: Kernel, input_dim: int) -> None:
    if isinstance(kern, Sum):
        out.write(f"KernelName={kern.name}\n")
        out.write(f"NumberOfKernels={len(kern.children)}\n")
        for c in kern.children:
            _write_kernel(out, c, input_dim)
        return
    out.write(f"KernelName={kern.name}\n")
    out.write(f"inputDim={input_dim}\n")
    out.write(f"numParams={kern.n_params}\n")


def _write_kernel_with_params(out, kern: Kernel, params, input_dim: int):
    if isinstance(kern, Sum):
        out.write(f"KernelName={kern.name}\n")
        out.write(f"NumberOfKernels={len(kern.children)}\n")
        for c, p in zip(kern.children, params):
            _write_kernel_with_params(out, c, p, input_dim)
        return
    out.write(f"KernelName={kern.name}\n")
    out.write(f"inputDim={input_dim}\n")
    out.write(f"numParams={kern.n_params}\n")
    flat = np.asarray(kern.pack(params), np.float64)
    out.write(" ".join(_fmt(v) for v in flat) + " \n")


def save_model(model: GPModel, path: str,
               comment: str = "# GP_SS_AK Model File ") -> None:
    with open(path, "w") as out:
        out.write(comment + "\n")
        if isinstance(model.likelihood, WarpedGaussian):
            # comment marker (skipped by the reference's reader,
            # StreamInt.h:81-85) so the warp family survives a round
            # trip — the reference format stores only likelihood=1
            out.write(f"# WarpFamily={model.likelihood.family} "
                      f"Triplets={model.likelihood.n_triplets}\n")
        out.write(f"Inference={model.inference}\n")
        out.write(f"likelihood={model.likelihood.kind}\n")
        out.write(f"MeanFunction={model.mean_function}\n")
        out.write(f"numData={model.num_data}\n")
        out.write(f"outputDim={model.output_dim}\n")
        out.write(f"inputDim={model.input_dim}\n")
        out.write(f"NumHyperKernel={model.kernel.n_params}\n")
        out.write(f"NumHyperLik={int(np.size(model.lik_hypers))}\n")
        out.write(f"NumHyperMean={int(np.size(model.mean_hypers))}\n")
        _write_kernel_with_params(out, model.kernel, model.kernel_params,
                                  model.input_dim)
        for v in np.asarray(model.lik_hypers, np.float64).reshape(-1):
            out.write(f"Hyperparams_likelihood={_fmt(v)}\n")
        for v in np.asarray(model.mean_hypers, np.float64).reshape(-1):
            out.write(f"Hyperparams_meanfunction={_fmt(v)}\n")


class _LineReader:
    """key=value line protocol with '#'-comment skipping
    (StreamIntfce::ReadStrStrm, StreamInt.h:75-89)."""

    def __init__(self, text: str):
        self.lines = [l for l in text.splitlines()]
        self.i = 0

    def next_line(self) -> str:
        while self.i < len(self.lines):
            line = self.lines[self.i]
            self.i += 1
            if line.startswith("#"):
                continue
            return line
        raise EOFError("unexpected end of model file")

    def read_kv(self) -> Tuple[str, str]:
        line = self.next_line()
        if "=" not in line:
            raise ValueError(f"expected key=value, got {line!r}")
        k, _, v = line.partition("=")
        return k.strip(), v.strip()

    def expect(self, key: str) -> str:
        k, v = self.read_kv()
        if k != key:
            raise ValueError(f"expected {key}=..., got {k}=...")
        return v


def _read_kernel(r: _LineReader, dtype=jnp.float64):
    _, name = r.read_kv()  # KernelName=...
    if name == "Hyb":
        n = int(r.expect("NumberOfKernels"))
        children, params = [], []
        for _ in range(n):
            c, p = _read_kernel(r, dtype)
            children.append(c)
            params.append(p)
        return Sum(children), tuple(params)
    kern = make_kernel(name)
    int(r.expect("inputDim"))
    nparams = int(r.expect("numParams"))
    if nparams != kern.n_params:
        raise ValueError(
            f"kernel {name}: file has {nparams} params, expected "
            f"{kern.n_params}")
    vals = [float(t) for t in r.next_line().split()]
    flat = jnp.asarray(vals, dtype)
    return kern, kern.unpack(flat)


def load_model(path: str, dtype=jnp.float64) -> GPModel:
    with open(path, "r") as f:
        text = f.read()
    r = _LineReader(text)
    inference = r.expect("Inference")
    lik_kind = int(r.expect("likelihood"))
    mean_fn = r.expect("MeanFunction")
    num_data = int(r.expect("numData"))
    output_dim = int(r.expect("outputDim"))
    input_dim = int(r.expect("inputDim"))
    int(r.expect("NumHyperKernel"))
    n_lik = int(r.expect("NumHyperLik"))
    n_mean = int(r.expect("NumHyperMean"))
    kern, kparams = _read_kernel(r, dtype)
    lik_hypers = []
    for _ in range(n_lik):
        lik_hypers.append(float(r.expect("Hyperparams_likelihood")))
    mean_hypers = []
    for _ in range(n_mean):
        mean_hypers.append(float(r.expect("Hyperparams_meanfunction")))
    if lik_kind == LIK_WARPGAUSS:
        family = "tanh1"
        triplets = max(1, (n_lik - 1) // 3)
        for line in text.splitlines():
            if line.startswith("# WarpFamily="):
                toks = line[2:].split()
                family = toks[0].split("=", 1)[1]
                if len(toks) > 1 and toks[1].startswith("Triplets="):
                    triplets = int(toks[1].split("=", 1)[1])
                break
        likelihood = WarpedGaussian(family=family, n_triplets=triplets)
    else:
        likelihood = Gaussian()
    return GPModel(
        kernel=kern,
        kernel_params=kparams,
        likelihood=likelihood,
        lik_hypers=jnp.asarray(lik_hypers, dtype),
        mean_hypers=jnp.asarray(mean_hypers, dtype),
        input_dim=input_dim,
        output_dim=output_dim,
        num_data=num_data,
        inference=inference,
        mean_function=mean_fn,
    )
