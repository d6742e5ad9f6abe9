"""Parallel execution layers: vmap batching (single chip) and mesh sharding
(multi-chip DP fleets + psum-sharded large-n L-BFGS)."""

from .batch import optimize_batched, optimize_lbfgs_batched
from .mesh import (
    least_squares_sharded,
    optimize_auglag_sharded,
    optimize_cg_model_sharded,
    optimize_cg_sharded,
    optimize_tr_sharded,
    optimize_tr_model_sharded,
    make_mesh,
    optimize_batched_sharded,
    optimize_lbfgs_sharded,
    psum_dot,
    sample_sharded,
)

__all__ = [
    "optimize_batched",
    "optimize_lbfgs_batched",
    "least_squares_sharded",
    "optimize_auglag_sharded",
    "optimize_cg_model_sharded",
    "optimize_cg_sharded",
    "optimize_tr_sharded",
    "optimize_tr_model_sharded",
    "make_mesh",
    "optimize_batched_sharded",
    "optimize_lbfgs_sharded",
    "psum_dot",
    "sample_sharded",
]
