"""Poisson GLM log-posterior (count-data MAP).

Rounds out the model zoo with the other canonical GLM: counts with a
log link,

    y_i ~ Poisson(exp(x_iᵀw)),   w ~ N(0, prior_scale² I)

log-posterior (dropping the data-only log y! term):
    sum_i [ y_i·x_iᵀw − exp(x_iᵀw) ] − ‖w‖²/(2·prior_scale²)

Strictly concave in w, smooth, and — unlike the logistic fixture — has an
exp() that overflows for bad iterates, which exercises the finite-halving
robustness of the line search on a realistic model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..api import ProbabilityModel

__all__ = ["PoissonRegressionMAP"]


class PoissonRegressionMAP(ProbabilityModel):
    """Synthetic, deterministic (seeded) Poisson-regression posterior."""

    def __init__(
        self,
        dimension: int = 50,
        n_obs: int = 400,
        prior_scale: float = 10.0,
        seed: int = 0,
        dtype=jnp.float64,
    ):
        super().__init__(dimension)
        kx, kw, ky = jax.random.split(jax.random.PRNGKey(seed), 3)
        self.X = jax.random.normal(kx, (n_obs, dimension), dtype) / jnp.sqrt(
            jnp.asarray(dimension, dtype)
        )
        w_true = 0.5 * jax.random.normal(kw, (dimension,), dtype)
        rate = jnp.exp(self.X @ w_true)
        self.y = jax.random.poisson(ky, rate).astype(dtype)
        self.prior_scale = float(prior_scale)

    def logdensity(self, w):
        eta = self.X @ w
        loglik = jnp.sum(self.y * eta - jnp.exp(eta))
        logprior = -0.5 * jnp.sum(w * w) / (self.prior_scale**2)
        return loglik + logprior
