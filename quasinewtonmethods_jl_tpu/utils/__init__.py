"""Utilities: NaN-aware scalars, checkpointing, profiling."""

from .checkpoint import load_state, save_state
from .profiling import practically_converged, solve_stats, summarize_trace, trace
from .scalars import (
    finite_halving_limit,
    nanmax,
    nanmin,
    significand_bits,
    sqrt_tolerance,
)

__all__ = [
    "finite_halving_limit",
    "load_state",
    "nanmax",
    "nanmin",
    "practically_converged",
    "save_state",
    "significand_bits",
    "solve_stats",
    "sqrt_tolerance",
    "summarize_trace",
    "trace",
]
