"""L-BFGS two-loop recursion — the large-n path.

Capability beyond the reference (which is dense-B⁻¹ O(n²) and targets
small-to-moderate n; SURVEY.md §5 "long-context"): limited-memory BFGS keeps
the last m (step, gradient-difference) pairs and applies the inverse-Hessian
implicitly in O(m·n), which is the regime where n is too large for an (n, n)
matrix (BASELINE.md config 5: n = 4096, m = 10).

Sign conventions match the reference's maximization form: y = grad_old -
grad_new (flipped vs. textbook minimization), the recursion produces an
*ascent* direction d ≈ B⁻¹∇, and m_dir = dᵀ∇ > 0 certifies ascent.

The history is a ring managed by shift-on-push (m is small, so the O(m·n)
shift is noise); slot hist-1 is always the newest pair. All control flow is
branchless (`jnp.where` masks over invalid slots) so the recursion traces
into `lax.fori_loop` bodies and shards cleanly: every contraction is a
`dot(n)`, which under a 'model'-sharded parameter axis becomes a local
partial dot + psum (see parallel.mesh).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["lbfgs_direction", "lbfgs_push"]


def lbfgs_push(
    S: jax.Array,  # (m, n) step history (oldest..newest in 0..hist-1)
    Y: jax.Array,  # (m, n) gradient-difference history
    rho: jax.Array,  # (m,) 1/(sᵀy)
    hist: jax.Array,  # () int32 valid pair count
    gamma: jax.Array,  # () H0 scaling
    step: jax.Array,  # (n,) accepted step s_k = alpha*d
    y: jax.Array,  # (n,) grad_old - grad_new
    dot: Callable = jnp.dot,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Push a curvature pair into the ring if it has positive curvature.

    The cautious-update rule: pairs with sᵀy <= 0 are skipped (they would
    corrupt the implicit inverse Hessian — the dense-B reference instead
    relies on its m <= 0 reset, :272-280; with limited memory, skipping is
    the standard equivalent). gamma becomes sᵀy/yᵀy of the accepted pair
    (the usual Barzilai–Borwein H0 scaling).
    """
    dtype = S.dtype
    mh = S.shape[0]
    sty = dot(step, y)
    yty = dot(y, y)
    accept = sty > 0.0

    full = hist >= mh
    write_at = jnp.minimum(hist, mh - 1)
    S_shift = jnp.roll(S, -1, axis=0).at[-1].set(step)
    Y_shift = jnp.roll(Y, -1, axis=0).at[-1].set(y)
    rho_shift = jnp.roll(rho, -1).at[-1].set(1.0 / sty)
    S_app = lax.dynamic_update_index_in_dim(S, step, write_at, 0)
    Y_app = lax.dynamic_update_index_in_dim(Y, y, write_at, 0)
    rho_app = rho.at[write_at].set(1.0 / sty)

    S_new = jnp.where(full, S_shift, S_app)
    Y_new = jnp.where(full, Y_shift, Y_app)
    rho_new = jnp.where(full, rho_shift, rho_app)

    S_out = jnp.where(accept, S_new, S)
    Y_out = jnp.where(accept, Y_new, Y)
    rho_out = jnp.where(accept, rho_new, rho)
    hist_out = jnp.where(accept, jnp.minimum(hist + 1, mh), hist)
    gamma_out = jnp.where(accept, sty / yty, gamma).astype(dtype)
    return S_out, Y_out, rho_out, hist_out, gamma_out


def lbfgs_direction(
    S: jax.Array,
    Y: jax.Array,
    rho: jax.Array,
    hist: jax.Array,
    gamma: jax.Array,
    g: jax.Array,  # (n,) current gradient
    dot: Callable = jnp.dot,
) -> Tuple[jax.Array, jax.Array]:
    """Two-loop recursion: d ≈ B⁻¹g (ascent direction) and m_dir = dᵀg.

    ``dot`` is injectable so the sharded path can substitute a
    local-dot + psum contraction (parallel.mesh.psum_dot) without touching
    the recursion.
    """
    mh = S.shape[0]
    dtype = g.dtype

    def bwd(j, carry):
        q, alphas = carry
        i = hist - 1 - j  # newest-first
        valid = j < hist
        ic = jnp.maximum(i, 0)
        s_i = lax.dynamic_index_in_dim(S, ic, 0, keepdims=False)
        y_i = lax.dynamic_index_in_dim(Y, ic, 0, keepdims=False)
        a = jnp.where(valid, rho[ic] * dot(s_i, q), jnp.zeros((), dtype))
        q = q - a * y_i
        alphas = alphas.at[ic].set(jnp.where(valid, a, alphas[ic]))
        return q, alphas

    q, alphas = lax.fori_loop(
        0, mh, bwd, (g, jnp.zeros((mh,), dtype))
    )
    q = q * gamma

    def fwd(i, q):
        valid = i < hist
        s_i = lax.dynamic_index_in_dim(S, i, 0, keepdims=False)
        y_i = lax.dynamic_index_in_dim(Y, i, 0, keepdims=False)
        b = jnp.where(valid, rho[i] * dot(y_i, q), jnp.zeros((), dtype))
        return q + jnp.where(valid, alphas[i] - b, jnp.zeros((), dtype)) * s_i

    d = lax.fori_loop(0, mh, fwd, q)
    m_dir = dot(d, g)
    return d, m_dir
