"""Hierarchical (multilevel) regression with correlated random effects.

The canonical "real" Bayesian workload for the reference's intended
pipeline — MAP mode-finding as HMC chain initialization (reference
README.md:14 names the ProbabilityModels.jl + InplaceDHMC.jl use case; the
models that ecosystem compiles are exactly this shape). A varying-
intercept/varying-slope linear model:

    y_i  = x_iᵀ β + z_iᵀ u_{g(i)} + ε_i,      ε_i ~ N(0, σ²)
    u_j  = diag(τ) L_R e_j  (non-centered),   e_j ~ N(0, I_q)
    β    ~ N(0, 5²),   τ ~ half-Cauchy(0, 2.5),   σ ~ half-Cauchy(0, 2.5)
    L_R  ~ LKJ-Cholesky(η)

Constrained parameters are a single flat vector (the layout every engine
in this package consumes); ``HierarchicalRegression.transform`` is the
matching `BlockTransform` so the model drops into
``map_then_sample(transform=...)`` / ``transform_objective`` directly:

    [ β (p) | e (J·q, non-centered effects) | τ (q, >0) | σ (1, >0)
      | packed L_R (q(q+1)/2, CorrCholesky) ]

Everything is static-shape: the per-observation group lookup is one gather
(`U[group_idx]`), the rest is dense matmul + elementwise — it jits, vmaps
over fleets, and shards over a chains axis untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..api import ProbabilityModel
from ..transforms import (
    BlockTransform,
    CorrCholesky,
    Identity,
    Positive,
    unpack_cholesky,
)

__all__ = ["HierarchicalRegression"]


def _half_cauchy_logpdf(x, scale):
    # unnormalized on x > 0 (positivity enforced by the transform)
    return -jnp.log1p((x / scale) ** 2)


class HierarchicalRegression(ProbabilityModel):
    """Synthetic, deterministic (seeded) correlated random-effects posterior.

    ``n_groups`` groups × ``q`` group-level effect dimensions (intercept +
    q-1 slopes), ``p`` population-level coefficients, ``n_obs`` total
    observations. `logdensity` takes the CONSTRAINED flat vector (see the
    module docstring layout); pair it with ``self.transform``.
    """

    def __init__(
        self,
        n_groups: int = 8,
        q: int = 2,
        p: int = 3,
        n_obs: int = 256,
        lkj_eta: float = 2.0,
        seed: int = 0,
        dtype=jnp.float64,
    ):
        self.n_groups, self.q, self.p = int(n_groups), int(q), int(p)
        self.lkj_eta = float(lkj_eta)
        tril = q * (q + 1) // 2
        super().__init__(p + n_groups * q + q + 1 + tril)

        ks = jax.random.split(jax.random.PRNGKey(seed), 7)
        self.X = jax.random.normal(ks[0], (n_obs, p), dtype)
        # z covariates: leading column 1 (varying intercept), rest random
        self.Z = jnp.concatenate(
            [jnp.ones((n_obs, 1), dtype), jax.random.normal(ks[1], (n_obs, q - 1), dtype)],
            axis=1,
        )
        self.group = jax.random.randint(ks[2], (n_obs,), 0, n_groups)
        # ground truth used to synthesize y (recorded for tests/examples)
        self.beta_true = jax.random.normal(ks[3], (p,), dtype)
        self.tau_true = jnp.asarray([0.8] + [0.5] * (q - 1), dtype)
        self.sigma_true = 0.5
        u = self.tau_true * jax.random.normal(ks[4], (n_groups, q), dtype)
        self.u_true = u
        noise = self.sigma_true * jax.random.normal(ks[5], (n_obs,), dtype)
        self.y = (
            self.X @ self.beta_true + jnp.sum(self.Z * u[self.group], axis=1) + noise
        )
        # LKJ-Cholesky(eta) exponents over 0-indexed rows: q - i - 1 + 2(eta-1)
        self._lkj_expo = jnp.arange(q - 1, -1, -1, dtype=dtype) + 2.0 * (
            self.lkj_eta - 1.0
        )
        self.transform = BlockTransform(
            [
                Identity(p),
                Identity(n_groups * q),
                Positive(q),
                Positive(1),
                CorrCholesky(q),
            ]
        )

    def split(self, x):
        """Unpack the constrained flat vector into named parts:
        (beta, e, tau, sigma, L) with L the (q, q) correlation factor."""
        p, J, q = self.p, self.n_groups, self.q
        beta = x[:p]
        e = x[p : p + J * q].reshape(J, q)
        tau = x[p + J * q : p + J * q + q]
        sigma = x[p + J * q + q]
        L = unpack_cholesky(x[p + J * q + q + 1 :], q)
        return beta, e, tau, sigma, L

    def random_effects(self, x):
        """The implied group effects u_j = diag(τ) L e_j, shape (J, q)."""
        _, e, tau, _, L = self.split(x)
        return (e @ L.T) * tau

    def logdensity(self, x):
        beta, e, tau, sigma, L = self.split(x)
        u = (e @ L.T) * tau
        mean = self.X @ beta + jnp.sum(self.Z * u[self.group], axis=1)
        resid = self.y - mean
        n = self.y.shape[0]
        loglik = -0.5 * jnp.sum(resid * resid) / sigma**2 - n * jnp.log(sigma)
        lp = loglik
        lp += -0.5 * jnp.sum(beta * beta) / 25.0
        lp += -0.5 * jnp.sum(e * e)
        lp += jnp.sum(_half_cauchy_logpdf(tau, 2.5))
        lp += _half_cauchy_logpdf(sigma, 2.5)
        lp += jnp.sum(self._lkj_expo * jnp.log(jnp.diagonal(L)))
        return lp

    def initial_point(self):
        """A reasonable constrained-space start (zeros through the
        transform: unit scales, identity correlation, zero effects)."""
        return self.transform.forward(
            jnp.zeros(self.transform.unconstrained_size, self.X.dtype)
        )
