"""Ill-conditioned quadratic log-density.

BASELINE.md config 2 (n=256): stresses the backtracking line search and the
inverse-Hessian update with a spectrum spanning ``condition`` orders of
magnitude. No counterpart in the reference's tests (its suite is Rosenbrock
only, test/runtests.jl:37-51) — this covers the curvature-reset and
line-search paths the reference leaves untested (SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..api import ProbabilityModel

__all__ = ["IllConditionedQuadratic", "quadratic_logdensity"]


def _spectrum(n: int, condition: float, dtype) -> jax.Array:
    # Log-spaced eigenvalues in [1/condition, 1].
    return jnp.logspace(-jnp.log10(condition), 0.0, n, dtype=dtype)


def quadratic_logdensity(theta, diag, x_star):
    """-(1/2) (theta - x*)ᵀ D (theta - x*); maximum 0 at x*."""
    r = theta - x_star
    return -0.5 * jnp.sum(diag * r * r)


class IllConditionedQuadratic(ProbabilityModel):
    """Quadratic with known optimum x* and conditioning ``condition``."""

    def __init__(self, dimension: int, condition: float = 1e4, seed: int = 0,
                 dtype=jnp.float64):
        super().__init__(dimension)
        self.condition = float(condition)
        key = jax.random.PRNGKey(seed)
        self.diag = _spectrum(dimension, condition, dtype)
        self.x_star = jax.random.normal(key, (dimension,), dtype)

    def logdensity(self, theta):
        return quadratic_logdensity(theta, self.diag, self.x_star)

    def logdensity_and_gradient(self, theta):
        r = theta - self.x_star
        return -0.5 * jnp.sum(self.diag * r * r), -self.diag * r
