"""Mesh-sharded large-N inference (distributed Gram + block Cholesky)."""

from gp_ss_ak_tpu.parallel.mesh import (
    ROW_AXIS,
    make_mesh,
    pad_rows,
    replicated,
    row_sharding,
)
from gp_ss_ak_tpu.parallel.fit import fit_distributed, fit_ring
from gp_ss_ak_tpu.parallel.nlml import (
    make_dist_nlml_and_grad,
    make_two_level_nlml_and_grad,
    make_dist_predict,
    shard_training_data,
)
from gp_ss_ak_tpu.parallel.ring import (
    make_ring_cg_solve,
    make_ring_matvec,
    make_ring_nlml_and_grad,
    make_ring_posterior_mean,
    make_ring_predict,
    make_two_level_ring_nlml_and_grad,
)
from gp_ss_ak_tpu.parallel.pchol import (
    block_cholesky_local,
    solve_chol_local,
    tri_solve_lower_local,
    tri_solve_upper_local,
)

__all__ = [
    "ROW_AXIS",
    "make_mesh",
    "pad_rows",
    "row_sharding",
    "replicated",
    "fit_distributed",
    "fit_ring",
    "make_dist_nlml_and_grad",
    "make_ring_nlml_and_grad",
    "make_two_level_nlml_and_grad",
    "make_dist_predict",
    "make_ring_matvec",
    "make_ring_cg_solve",
    "make_ring_posterior_mean",
    "make_ring_predict",
    "make_two_level_ring_nlml_and_grad",
    "shard_training_data",
    "block_cholesky_local",
    "solve_chol_local",
    "tri_solve_lower_local",
    "tri_solve_upper_local",
]
