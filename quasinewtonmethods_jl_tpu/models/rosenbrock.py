"""Extended Rosenbrock log-density (maximization form).

The reference's canonical fixture and the headline-benchmark objective
(reference: test/runtests.jl:4-33, README.md:19-48). The function is the
*negated* extended Rosenbrock so its maximum is 0 at theta = 1⃗, with the
coupled-pair indexing of the reference: pairs (theta[i], theta[i+N]) for
N = n >> 1, plus a quadratic tail term when n is odd (which is what forces
the odd-dimension/padding code paths in the n = 2..24 test sweep).

Both the autodiff path (plain logdensity through jax.value_and_grad) and an
analytic gradient (the ∂logdensity! analog, test/runtests.jl:19-33) are
provided so tests can assert they agree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..api import ProbabilityModel

__all__ = ["rosenbrock_logdensity", "rosenbrock_value_and_grad", "Rosenbrock"]


def rosenbrock_logdensity(theta: jax.Array) -> jax.Array:
    """-sum_i 100 (theta[i+N] - theta[i]^2)^2 + (1 - theta[i])^2, odd tail
    -(1 - theta[-1])^2. Maximum 0 at 1⃗. Matches test/runtests.jl:5-17."""
    n = theta.shape[0]
    half = n >> 1
    a = theta[:half]
    b = theta[half : 2 * half]
    s = -jnp.sum(100.0 * (b - a * a) ** 2 + (1.0 - a) ** 2)
    if n % 2:  # static shape -> python branch is trace-time
        delta = 1.0 - theta[-1]
        s = s - delta * delta
    return s


def rosenbrock_value_and_grad(theta: jax.Array):
    """Analytic value+gradient, mirroring ∂logdensity! (test/runtests.jl:19-33)."""
    n = theta.shape[0]
    half = n >> 1
    a = theta[:half]
    b = theta[half : 2 * half]
    r = b - a * a
    s = -jnp.sum(100.0 * r * r + (1.0 - a) ** 2)
    ga = 400.0 * r * a + 2.0 * (1.0 - a)
    gb = -200.0 * r
    if n % 2:
        delta = 1.0 - theta[-1]
        s = s - delta * delta
        tail = jnp.asarray([2.0 * delta], theta.dtype)
        grad = jnp.concatenate([ga, gb, tail])
    else:
        grad = jnp.concatenate([ga, gb])
    return s, grad


class Rosenbrock(ProbabilityModel):
    """Model-object flavor of the fixture (README.md:19 ``struct Rosenbrock end``)."""

    def __init__(self, dimension: int, analytic_gradient: bool = False):
        super().__init__(dimension)
        self._analytic = analytic_gradient

    def logdensity(self, theta):
        return rosenbrock_logdensity(theta)

    def logdensity_and_gradient(self, theta):
        if self._analytic:
            return rosenbrock_value_and_grad(theta)
        return jax.value_and_grad(rosenbrock_logdensity)(theta)
