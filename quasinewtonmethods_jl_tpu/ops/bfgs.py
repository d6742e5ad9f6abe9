"""Inverse-BFGS rank-2 update fused with search-direction computation.

TPU-native re-expression of the reference's hot kernel `BFGS_update!`
(reference: src/QuasiNewtonMethods.jl:34-69) and `initial_B⁻¹!` (:144-148).
The reference fuses three SIMD loops: (1) y = grad_old - grad_new and sᵀy,
(2) the B⁻¹y matvec with yᵀB⁻¹y, (3) the rank-2 inverse-Hessian update fused
with the next-direction matvec d = B⁻¹_new @ grad_new and the directional
derivative m = gradᵀ d.

Here the same algebra is expressed as a handful of jnp ops — XLA fuses the
elementwise work into the matvecs, and for the batched hot path there is a
Pallas kernel (ops/pallas/bfgs_kernel.py) that keeps the whole update
VMEM-resident; this module is the numerics oracle that the Pallas kernel is
tested against.

Sign conventions (maximization — the API contract with the HMC use case):
  y = grad_old - grad_new   (flipped vs. the textbook minimization form,
                             see the commented-out line at :37)
  d = B⁻¹ @ grad_new        (ascent direction, +B⁻¹∇)
  m = gradᵀ B⁻¹ grad        (> 0 certifies ascent; m <= 0 triggers the
                             identity reset in the driver)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "initial_inv_hessian",
    "bfgs_update",
    "bfgs_update_reference",
    "dfp_update",
    "sr1_update",
    "h0_gamma",
    "H0_GAMMA_CLIP",
]


def initial_inv_hessian(n: int, dtype=jnp.float32) -> jax.Array:
    """Identity inverse-Hessian reset (reference :144-148)."""
    return jnp.eye(n, dtype=dtype)


H0_GAMMA_CLIP = (1e-3, 1e3)


def h0_gamma(sty, yty, fresh, dtype):
    """Barzilai–Borwein H0 scaling factor for a *fresh* (identity) B.

    Nocedal & Wright eq. 6.20: before the first real update (and after each
    identity reset), rescale B = (sᵀy/yᵀy)·I so the update starts from a
    curvature-matched multiple of the identity. Measured effect on the
    batched Rosenbrock n=60 fleet: median iterations 354 -> 139 and all
    lanes converge (stragglers 738 -> 212). Applied only when the incoming
    pair has positive curvature; clipped for degenerate pairs.
    """
    gamma = jnp.clip(sty / yty, *H0_GAMMA_CLIP)
    return jnp.where((fresh) & (sty > 0), gamma, jnp.ones((), dtype))


def bfgs_update(
    B: jax.Array,  # (n, n) current inverse Hessian approximation
    s: jax.Array,  # (n,) previous accepted step (alpha * direction)
    grad_new: jax.Array,  # (n,) gradient at the new iterate
    grad_old: jax.Array,  # (n,) gradient at the previous iterate
    fresh=None,  # optional () bool: B is a fresh identity -> H0-scale it
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One inverse-BFGS update; returns (B_new, direction, m).

    Matches src/QuasiNewtonMethods.jl:34-69 step for step:
      sᵀy and y in one pass (:36-41); B⁻¹y pre-scaled by 1/sᵀy plus yᵀB⁻¹y
      (:44-52); c₁ = (1 + yᵀB⁻¹y/sᵀy)/sᵀy (:54); the symmetric rank-2 update
      B⁻¹ ← B⁻¹ + c₁ssᵀ − (B⁻¹y/sᵀy)sᵀ − s(B⁻¹y/sᵀy)ᵀ fused with
      d = B⁻¹_new grad_new and m = gradᵀd (:56-67).

    ``fresh`` enables the optional H0 scaling (see `h0_gamma`) — a
    documented improvement over the reference; pass None (default) for
    exact reference semantics.

    IEEE in-band failure propagation is intentional: if sᵀy == 0 the update
    produces inf/NaN, m becomes NaN, the driver's reset test ``m <= 0`` is
    false for NaN, and the line search then exhausts its budget and fails —
    the exact failure path of the reference.
    """
    dtype = B.dtype
    y = grad_old - grad_new
    sty = jnp.dot(s, y, preferred_element_type=dtype)
    if fresh is not None:
        yty = jnp.dot(y, y, preferred_element_type=dtype)
        B = B * h0_gamma(sty, yty, fresh, dtype)
    rho = 1.0 / sty
    By = B @ y  # B symmetric: the reference reads B[c, r] (:48) — same thing
    ytBy = jnp.dot(y, By, preferred_element_type=dtype)
    Bys = By * rho
    c1 = (1.0 + ytBy * rho) * rho
    B_new = B + c1 * jnp.outer(s, s) - jnp.outer(Bys, s) - jnp.outer(s, Bys)
    d = B_new @ grad_new
    m = jnp.dot(d, grad_new, preferred_element_type=dtype)
    return B_new, d, m


def dfp_update(
    B: jax.Array,
    s: jax.Array,
    grad_new: jax.Array,
    grad_old: jax.Array,
    fresh=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One inverse-DFP update; returns (B_new, direction, m).

    Broyden-family breadth beyond the reference (which is BFGS-only):
    the Davidon–Fletcher–Powell inverse update
        B ← B − (By)(By)ᵀ/yᵀBy + ssᵀ/sᵀy
    with the library's maximization convention (y = grad_old − grad_new,
    d = +B∇) and the same in-band failure propagation as `bfgs_update`
    (sᵀy == 0 → NaN m → line-search failure; the driver's m <= 0 reset
    guards indefiniteness). Satisfies the secant equation B_new y = s.
    ``fresh`` enables the optional H0 scaling, as in `bfgs_update`.
    """
    dtype = B.dtype
    y = grad_old - grad_new
    sty = jnp.dot(s, y, preferred_element_type=dtype)
    if fresh is not None:
        yty = jnp.dot(y, y, preferred_element_type=dtype)
        B = B * h0_gamma(sty, yty, fresh, dtype)
    By = B @ y
    ytBy = jnp.dot(y, By, preferred_element_type=dtype)
    B_new = B - jnp.outer(By, By) / ytBy + jnp.outer(s, s) / sty
    d = B_new @ grad_new
    m = jnp.dot(d, grad_new, preferred_element_type=dtype)
    return B_new, d, m


# SR1 safeguard (Nocedal & Wright 6.26): skip the update when the
# denominator uᵀy is tiny relative to ||u||·||y|| — the standard r = 1e-8.
SR1_SKIP_TOL = 1e-8


def sr1_update(
    B: jax.Array,
    s: jax.Array,
    grad_new: jax.Array,
    grad_old: jax.Array,
    fresh=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One inverse-SR1 (symmetric rank-1) update; returns (B_new, d, m).

    B ← B + uuᵀ/uᵀy with u = s − By. Unlike BFGS/DFP, SR1 does not
    preserve definiteness — the driver's m <= 0 steepest-ascent reset
    (reference :272-280) is the safety net. The standard skip rule
    (|uᵀy| < SR1_SKIP_TOL·||u||·||y||, Nocedal & Wright 6.26) leaves B
    unchanged instead of dividing by a vanishing denominator; a skipped
    update still yields a valid direction through the untouched B.
    """
    dtype = B.dtype
    y = grad_old - grad_new
    sty = jnp.dot(s, y, preferred_element_type=dtype)
    if fresh is not None:
        yty = jnp.dot(y, y, preferred_element_type=dtype)
        B = B * h0_gamma(sty, yty, fresh, dtype)
    u = s - B @ y
    uty = jnp.dot(u, y, preferred_element_type=dtype)
    norm_prod = jnp.linalg.norm(u) * jnp.linalg.norm(y)
    skip = jnp.abs(uty) < SR1_SKIP_TOL * norm_prod
    # guard the division so a skipped update cannot propagate inf/NaN
    denom = jnp.where(skip, jnp.ones((), dtype), uty)
    B_new = jnp.where(skip, B, B + jnp.outer(u, u) / denom)
    d = B_new @ grad_new
    m = jnp.dot(d, grad_new, preferred_element_type=dtype)
    return B_new, d, m


def bfgs_update_reference(B, s, grad_new, grad_old):
    """Loop-free but deliberately naive formulation for testing.

    Computes the same quantities via the textbook Sherman–Morrison form so
    tests can cross-check `bfgs_update` against an independently derived
    expression (both must agree to fp tolerance).
    """
    y = grad_old - grad_new
    sty = s @ y
    rho = 1.0 / sty
    I = jnp.eye(B.shape[0], dtype=B.dtype)
    V = I - rho * jnp.outer(s, y)
    B_new = V @ B @ V.T + rho * jnp.outer(s, s)
    d = B_new @ grad_new
    m = d @ grad_new
    return B_new, d, m
