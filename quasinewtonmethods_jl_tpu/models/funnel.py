"""Neal's funnel — the canonical pathological sampling geometry.

    v ~ N(0, 3²),   x_i | v ~ N(0, e^v),  i = 1..n-1

log-density (maximization convention, like every fixture here):

    -v²/18 − (n−1)·v/2 − e^{−v}·‖x‖²/2

The scale of the x block varies by orders of magnitude with v, so no
single step size / mass matrix fits the whole space — the fixture that
separates samplers that adapt from samplers that just run (Neal 2003; the
standard HMC/NUTS stress test). Marginals are known exactly: v ~ N(0, 9),
x_i has mean 0 and variance E[e^v] = e^{9/2}.

As an OPTIMIZATION fixture it has an analytically known MAP: at the mode
x = 0 and ∂L/∂v = −v/σ² − (n−1)/2 = 0, i.e.

    θ* = (v*, 0, …, 0),   v* = −σ²(n−1)/2 = −4.5·(n−1)

with Hessian eigenvalues spanning 1/σ² to e^{−v*} — condition number
e^{4.5(n−1)}·σ⁻²·…, i.e. ~7·10⁵ already at n = 4 — an extreme-curvature
convergence fixture with an exact answer (tested at the reference-grade
|∇| < 1e-8 bar).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["funnel_logdensity", "FUNNEL_V_STD"]

FUNNEL_V_STD = 3.0


def funnel_logdensity(theta):
    """theta = [v, x_1..x_{n-1}]; returns the funnel log-density (scalar)."""
    v = theta[0]
    x = theta[1:]
    n_x = x.shape[0]
    return (
        -0.5 * v * v / (FUNNEL_V_STD**2)
        - 0.5 * n_x * v
        - 0.5 * jnp.exp(-v) * jnp.sum(x * x)
    )
