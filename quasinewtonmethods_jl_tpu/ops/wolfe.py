"""Weak-Wolfe line search (bisection bracketing), maximization form.

Capability beyond the reference (which ships only backtracking,
README.md:108: "QuasiNewtonMethods.jl only provides a backtracking
linesearch at the moment"). The weak Wolfe conditions for maximization of
φ(a) = f(x + a·d) with φ'(0) = m > 0:

    Armijo (sufficient increase):   φ(a) >= φ(0) + c1·a·m
    curvature:                      φ'(a) <= c2·m

An accepted step therefore guarantees sᵀy = a·(φ'(0) − φ'(a))·?? > 0 — more
precisely φ'(a) < φ'(0), hence the BFGS curvature pair is positive and the
L-BFGS cautious-rejection path never triggers. The classic
bisection-with-expansion scheme (Lewis & Overton) is expressed as one
`lax.while_loop`:

    lo = 0, hi = +inf, a = 1
    if Armijo fails:      hi = a, a = (lo + hi)/2
    elif curvature fails: lo = a, a = 2a if hi = inf else (lo + hi)/2
    else accept

Each trial costs one value_and_grad evaluation (the curvature test needs
φ'(a)), vs value-only for backtracking — use Wolfe when update quality
matters more than evaluation count.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["Wolfe", "WolfeResult", "wolfe_linesearch"]


@dataclasses.dataclass(frozen=True)
class Wolfe:
    """Weak-Wolfe hyperparameters. c1 < c2 required (standard: 1e-4, 0.9)."""

    c1: float = 1e-4
    c2: float = 0.9
    iterations: int = 50

    def __post_init__(self):
        if not (0.0 < self.c1 < self.c2 < 1.0):
            raise ValueError(
                f"need 0 < c1 < c2 < 1, got c1={self.c1}, c2={self.c2}"
            )


class WolfeResult(NamedTuple):
    alpha: jax.Array  # accepted step (0.0 on failure)
    f_final: jax.Array  # φ(alpha)
    slope_final: jax.Array  # φ'(alpha)
    n_fev: jax.Array  # value+grad evaluations
    iterations: jax.Array
    failed: jax.Array


class _WCarry(NamedTuple):
    lo: jax.Array
    hi: jax.Array
    a: jax.Array
    fa: jax.Array
    sa: jax.Array  # slope at a
    it: jax.Array


def wolfe_linesearch(
    phi_vag: Callable[[jax.Array], tuple],
    f0: jax.Array,
    m: jax.Array,
    ls: Wolfe = Wolfe(),
) -> WolfeResult:
    """Run the weak-Wolfe search.

    Args:
      phi_vag: ``alpha -> (f(x + alpha d), grad(x + alpha d) @ d)`` — value
        and directional derivative along the ray.
      f0: objective at alpha = 0.
      m: directional derivative at 0 (> 0 for an ascent direction).
      ls: static hyperparameters.
    """
    dtype = jnp.result_type(f0)
    c1 = jnp.asarray(ls.c1, dtype)
    c2 = jnp.asarray(ls.c2, dtype)
    inf = jnp.asarray(jnp.inf, dtype)
    one = jnp.ones((), dtype)

    fa0, sa0 = phi_vag(one)

    def conds(a, fa, sa):
        armijo = fa >= f0 + c1 * a * m
        curv = sa <= c2 * m
        return armijo, curv

    # Acceptance is tested in the loop *condition*, so the accepting trial
    # is never followed by a wasted evaluation; the body only runs to
    # shrink/grow the bracket and evaluate the next trial.
    # doomed-search fast-fail (see backtracking_linesearch): NaN m or f0
    # can never satisfy the conditions; exit immediately with the same
    # in-band alpha=0 outcome instead of burning the budget (critical for
    # vmapped discarded branches).
    doomed = ~(jnp.isfinite(m) & jnp.isfinite(f0))

    def cond(c: _WCarry):
        armijo, curv = conds(c.a, c.fa, c.sa)
        return ~doomed & ~(armijo & curv) & (c.it < ls.iterations)

    def body(c: _WCarry):
        armijo, curv = conds(c.a, c.fa, c.sa)
        # NaN trial values fail Armijo (NaN >= t is False) -> shrink: the
        # same robustness direction as backtracking's finite-phase halving.
        hi = jnp.where(~armijo, c.a, c.hi)
        lo = jnp.where(armijo & ~curv, c.a, c.lo)
        grow = jnp.isinf(hi)
        a_next = jnp.where(grow, 2.0 * lo, 0.5 * (lo + hi))
        fa, sa = phi_vag(a_next)
        return _WCarry(lo=lo, hi=hi, a=a_next, fa=fa, sa=sa, it=c.it + 1)

    init = _WCarry(
        lo=jnp.zeros((), dtype), hi=inf, a=one, fa=fa0, sa=sa0,
        it=jnp.zeros((), jnp.int32),
    )
    fc = lax.while_loop(cond, body, init)

    armijo, curv = conds(fc.a, fc.fa, fc.sa)
    ok = armijo & curv
    alpha = jnp.where(ok, fc.a, jnp.zeros((), dtype))
    failed = alpha == 0.0  # same in-band sentinel as backtracking
    return WolfeResult(
        alpha=alpha,
        f_final=fc.fa,
        slope_final=fc.sa,
        n_fev=fc.it + 1,
        iterations=fc.it,
        failed=failed,
    )
