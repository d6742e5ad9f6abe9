"""Gaussian-mixture fixture: the multimodal target for replica exchange.

The reference's test strategy is analytic fixtures with known answers
(reference test/runtests.jl:4-33); the known answers here are the mode
locations/weights and the exact mixture moments — what a single-
temperature sampler started in one basin CANNOT recover and `pt_sample`
must."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["GaussianMixture"]


class GaussianMixture:
    """Isotropic K-component Gaussian mixture log-density (MAXIMIZED form,
    like every objective in this framework).

    logdensity(x) = logsumexp_k [ log w_k − ‖x − mu_k‖² / (2 sigma_k²)
                                  − n·log(sigma_k) ]  (+ const dropped)

    Pure static-shape graph (one (K, n) broadcast + logsumexp) — jit/vmap/
    shard-friendly. ``means``: (K, n); ``weights``: (K,), normalized;
    ``sigmas``: scalar or (K,).

    Exact moments (for distribution-level sampler tests):
      mean  = Σ w_k mu_k
      cov   = Σ w_k (sigma_k² I + mu_k mu_kᵀ) − mean meanᵀ
    via `.mean()` / `.cov()`; `.mode_weights(draws)` soft-assigns draws to
    the nearest mode — the mode-mass recovery check.
    """

    def __init__(self, means, weights=None, sigmas=1.0):
        means = jnp.asarray(means)
        if means.ndim != 2:
            raise ValueError("means must be (K, n)")
        K, n = means.shape
        if weights is None:
            weights = jnp.full((K,), 1.0 / K, means.dtype)
        weights = jnp.asarray(weights, means.dtype)
        weights = weights / jnp.sum(weights)
        sigmas = jnp.broadcast_to(
            jnp.asarray(sigmas, means.dtype), (K,)
        )
        self.means = means
        self.weights = weights
        self.sigmas = sigmas
        self.dimension = n

    def __len__(self):
        return self.dimension

    def logdensity(self, x):
        d2 = jnp.sum((x[None, :] - self.means) ** 2, axis=1)  # (K,)
        comp = (
            jnp.log(self.weights)
            - 0.5 * d2 / self.sigmas**2
            - self.dimension * jnp.log(self.sigmas)
        )
        return jax.scipy.special.logsumexp(comp)

    __call__ = logdensity

    def mean(self):
        return self.weights @ self.means

    def cov(self):
        m = self.mean()
        second = jnp.einsum(
            "k,kn,km->nm", self.weights, self.means, self.means
        ) + jnp.sum(self.weights * self.sigmas**2) * jnp.eye(
            self.dimension, dtype=self.means.dtype
        )
        return second - jnp.outer(m, m)

    def mode_weights(self, draws):
        """Empirical mode masses: fraction of ``draws`` (..., n) nearest
        (Euclidean) to each component mean — the multimodal recovery
        metric (compare to ``weights`` for well-separated modes)."""
        flat = jnp.asarray(draws).reshape(-1, self.dimension)
        d2 = jnp.sum(
            (flat[:, None, :] - self.means[None, :, :]) ** 2, axis=2
        )
        idx = jnp.argmin(d2, axis=1)
        return jnp.bincount(
            idx, length=self.means.shape[0]
        ) / flat.shape[0]
