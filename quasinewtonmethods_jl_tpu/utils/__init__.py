"""Utilities: NaN-aware scalars, padding, checkpointing, profiling."""

from .scalars import (
    finite_halving_limit,
    nanmax,
    nanmin,
    significand_bits,
    sqrt_tolerance,
)

__all__ = [
    "finite_halving_limit",
    "nanmax",
    "nanmin",
    "significand_bits",
    "sqrt_tolerance",
]
