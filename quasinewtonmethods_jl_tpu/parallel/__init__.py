"""Parallel execution layers: vmap batching (single chip) and mesh sharding
(multi-chip DP fleets + psum-sharded large-n L-BFGS)."""

from .batch import optimize_batched

__all__ = ["optimize_batched"]
