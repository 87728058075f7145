"""Kernel interface: stateless objects + pytree parameter dicts.

The reference couples kernels, parameters and serialization in a
mutable class hierarchy (`Kernels`, Kernel.h:27-148). Here a kernel is
a *stateless descriptor*: static metadata (name, ordered parameter
names, init values — matching Kernel.cpp's `setInitPars` for parity)
plus pure functions of ``(params, X...)`` that jit/grad/vmap compose
over. Parameters live in plain dicts (pytrees).

Parameter ordering follows the reference's flat indexing exactly
(Kernel.cpp setParam/getParam switches) so packed vectors and model
files round-trip against reference-format files.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


class Kernel:
    """Base descriptor. Subclasses define metadata + matrix()/diag()."""

    #: kernel name as written to model files (Kernel.cpp KernelName=)
    name: str = "base"
    #: ordered (index -> short param name); file names get f"_{suffix}"
    param_names: Tuple[str, ...] = ()
    #: default initial values, same order (Kernel.cpp setInitPars)
    init_values: Tuple[float, ...] = ()
    #: suffix appended to param names in files ("" = use name as is)
    param_suffix: str = ""

    @property
    def n_params(self) -> int:
        return len(self.param_names)

    def init_params(self, dtype=jnp.float32) -> Params:
        return {
            n: jnp.asarray(v, dtype)
            for n, v in zip(self.param_names, self.init_values)
        }

    def file_param_names(self) -> Tuple[str, ...]:
        sfx = self.param_suffix
        return tuple(f"{n}_{sfx}" if sfx else n for n in self.param_names)

    # -- pure compute ----------------------------------------------------
    def matrix(self, params: Params, X1: jnp.ndarray, X2: jnp.ndarray,
               same: bool = False) -> jnp.ndarray:
        """Cross-covariance K(X1, X2). ``same=True`` marks X1 is X2
        (the reference's identity check, Kernel.cpp:261, made static so
        it is trace-safe)."""
        raise NotImplementedError

    def diag(self, params: Params, X: jnp.ndarray) -> jnp.ndarray:
        """diag K(X, X) as a (n,) vector (Kernel.h diag_Compute)."""
        raise NotImplementedError

    # -- flat packing (reference order) ---------------------------------
    def pack(self, params: Params) -> jnp.ndarray:
        return jnp.stack([jnp.asarray(params[n]) for n in self.param_names])

    def unpack(self, flat: jnp.ndarray) -> Params:
        return {n: flat[i] for i, n in enumerate(self.param_names)}

    def __repr__(self):
        return f"{type(self).__name__}()"


def check_params(kernel: Kernel, params: Params) -> None:
    missing = set(kernel.param_names) - set(params)
    if missing:
        raise ValueError(f"{kernel.name}: missing params {sorted(missing)}")
