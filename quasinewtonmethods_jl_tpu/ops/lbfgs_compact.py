"""Compact-representation L-BFGS direction (Byrd–Nocedal–Schnabel 1994).

Algebraically identical to the two-loop recursion (ops/lbfgs.py) but shaped
for the TPU: the two-loop's 2m *sequential* dot-product steps per direction
— ~40 dispatches per iteration for m=10, which measured as the dominant
cost of batched L-BFGS fleets — become two (m, n) matmul contractions, two
tiny (m, m) triangular solves, and a handful of elementwise ops:

    H = γI + [S, γY] M [Sᵀ; γYᵀ],   with R = triu(SᵀY), D = diag(SᵀY),
    M = [ R⁻ᵀ(D + γYᵀY)R⁻¹   −R⁻ᵀ ]
        [ −R⁻¹                0    ]

    Hg = γg + Sᵀ·top + γYᵀ·bottom, where
      a = R⁻¹(Sg),  bottom = −a,
      top = R⁻ᵀ[(D + γYᵀY)a − γ(Yg)]

Ring slots hold oldest..newest in 0..hist-1 (the lbfgs_push convention), so
R is genuinely upper triangular. Invalid slots (i >= hist) are masked
EXPLICITLY out of R, D, Sg, Yg (with unit diagonal entries keeping the
triangular solves well-posed): after a mid-run steepest-ascent reset the
driver clears only `hist`, so slots above it hold STALE nonzero pairs, not
zeros — unmasked they corrupted the post-reset directions by orders of
magnitude (regression-tested against the two-loop recursion).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = ["lbfgs_direction_compact"]


def lbfgs_direction_compact(
    S: jax.Array,  # (m, n) step history, oldest..newest in 0..hist-1
    Y: jax.Array,  # (m, n) gradient-difference history
    rho: jax.Array,  # (m,) unused (kept for signature parity with two-loop)
    hist: jax.Array,  # () int32 valid pair count
    gamma: jax.Array,  # () H0 scaling
    g: jax.Array,  # (n,) current gradient
) -> Tuple[jax.Array, jax.Array]:
    """d ≈ B⁻¹g (ascent direction) and m_dir = dᵀg — compact form."""
    mh = S.shape[0]
    dtype = g.dtype

    ids = jnp.arange(mh)
    valid = ids < hist  # (m,)
    vmask = valid.astype(dtype)
    vmask2 = vmask[:, None] * vmask[None, :]

    SY = (S @ Y.T) * vmask2  # (m, m): SY[i, j] = s_iᵀ y_j, stale rows zeroed
    YY = (Y @ Y.T) * vmask2  # (m, m)

    unit_invalid = jnp.where(valid, jnp.zeros((), dtype), jnp.ones((), dtype))
    R = jnp.triu(SY) + jnp.diag(unit_invalid)  # unit diag on empty slots
    D = jnp.diag(SY) + unit_invalid  # (m,)

    Sg = (S @ g) * vmask  # (m,)
    Yg = (Y @ g) * vmask  # (m,)

    a = solve_triangular(R, Sg, lower=False)  # R⁻¹ Sᵀg
    t = D * a + gamma * (YY @ a) - gamma * Yg
    top = solve_triangular(R, t, lower=False, trans=1)  # R⁻ᵀ t
    # Hg = γg + S_colsᵀ·top + γ·Y_colsᵀ·(−a)
    d = gamma * g + S.T @ top - gamma * (Y.T @ a)
    m_dir = jnp.dot(d, g, preferred_element_type=dtype)
    return d, m_dir
