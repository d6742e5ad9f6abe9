"""Bayesian logistic-regression MAP objective.

BASELINE.md config 3 (n=100 parameters): the representative "real"
statistical log-density for the reference's intended use case — MAP /
mode-finding as HMC chain initialization (reference README.md:14, the
ProbabilityModels.jl + InplaceDHMC.jl pipeline). The log-posterior is
  sum_i [ y_i log σ(x_iᵀw) + (1-y_i) log(1-σ(x_iᵀw)) ] - ‖w‖² / (2 σ_prior²)
computed with log-sigmoid for stability; it is smooth, strictly concave, and
exercised purely through the autodiff (value_and_grad) callback path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..api import ProbabilityModel

__all__ = ["LogisticRegressionMAP"]


class LogisticRegressionMAP(ProbabilityModel):
    """Synthetic, deterministic (seeded) logistic-regression posterior."""

    def __init__(
        self,
        dimension: int = 100,
        n_obs: int = 500,
        prior_scale: float = 10.0,
        seed: int = 0,
        dtype=jnp.float64,
    ):
        super().__init__(dimension)
        kx, kw, ky = jax.random.split(jax.random.PRNGKey(seed), 3)
        self.X = jax.random.normal(kx, (n_obs, dimension), dtype) / jnp.sqrt(
            jnp.asarray(dimension, dtype)
        )
        w_true = jax.random.normal(kw, (dimension,), dtype)
        logits = self.X @ w_true
        self.y = (
            jax.random.uniform(ky, (n_obs,), dtype) < jax.nn.sigmoid(logits)
        ).astype(dtype)
        self.prior_scale = float(prior_scale)

    def logdensity(self, w):
        logits = self.X @ w
        # y*log σ(z) + (1-y)*log(1-σ(z)) = y*logσ(z) + (1-y)*logσ(-z)
        loglik = jnp.sum(
            self.y * jax.nn.log_sigmoid(logits)
            + (1.0 - self.y) * jax.nn.log_sigmoid(-logits)
        )
        logprior = -0.5 * jnp.sum(w * w) / (self.prior_scale**2)
        return loglik + logprior
