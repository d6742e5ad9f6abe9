"""Weak-Wolfe line search (bracketing + safeguarded cubic), maximization form.

Capability beyond the reference (which ships only backtracking,
README.md:108: "QuasiNewtonMethods.jl only provides a backtracking
linesearch at the moment"). The weak Wolfe conditions for maximization of
φ(a) = f(x + a·d) with φ'(0) = m > 0:

    Armijo (sufficient increase):   φ(a) >= φ(0) + c1·a·m
    curvature:                      φ'(a) <= c2·m

An accepted step guarantees φ'(a) < φ'(0), hence the BFGS curvature pair
sᵀy > 0 and the L-BFGS cautious-rejection path never triggers. The classic
bracketing scheme (Lewis & Overton) is expressed as one `lax.while_loop`:

    lo = 0, hi = +inf, a = 1
    if Armijo fails:      hi = a   (overshot)
    elif curvature fails: lo = a   (still ascending)
    else accept
    next a: 2·lo while hi = inf (expansion), else an interior proposal

The interior proposal is, by default (``interp="cubic"``), the maximizer of
the cubic Hermite interpolant through (lo, φ(lo), φ'(lo)) and
(hi, φ(hi), φ'(hi)) — both bracket ends carry value AND slope since every
Wolfe trial is a value+grad evaluation anyway, so the cubic is free. It is
safeguarded into the central [lo + 0.1w, hi - 0.1w] interval (w = hi - lo)
and falls back to bisection on a NaN/degenerate proposal, so worst-case
behavior equals ``interp="bisection"`` (pure midpoint; the round-1 scheme,
kept for comparison). Cubic proposals need measurably fewer evaluations on
curved objectives at identical acceptance conditions (tested).

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
    """Weak-Wolfe hyperparameters. c1 < c2 required (standard: 1e-4, 0.9).

    ``interp``: interior-proposal rule once a finite bracket exists —
    "cubic" (default; safeguarded Hermite, fewer evals) or "bisection"
    (pure midpoint). Static (trace-time) like BackTracking.order.
    """

    c1: float = 1e-4
    c2: float = 0.9
    iterations: int = 50
    interp: str = "cubic"
    # Hager–Zhang APPROXIMATE Wolfe acceptance (opt-in; "CG_DESCENT" §4,
    # Hager & Zhang SIAM J. Optim. 16(1), 2005). Near an optimum the
    # ordinary Armijo test becomes unsatisfiable in floating point — the
    # true increase φ(a) − φ(0) ~ a²|φ''| falls below eps·|φ| while the
    # SLOPE is still measured to full relative accuracy. The approximate
    # conditions replace the value test with slope brackets:
    #     (2c1 − 1)·φ'(0) ≤ φ'(a) ≤ c2·φ'(0)      (maximization form)
    # guarded by a value non-decrease up to resolution,
    #     φ(a) ≥ φ(0) − approx_eps·|φ(0)|.
    # A trial is accepted when EITHER the ordinary or the approximate
    # conditions hold. Linear-convergence engines (nonlinear CG) need this
    # to certify tight tolerances — BFGS steps jump over the resolution
    # floor quadratically and don't (measured: HZ-CG on a cond-100
    # quadratic stalls in-band at max|∇| ~ 1e-7 without it, reaches 1e-8+
    # with it; see cg_solve.py).
    approx: bool = False
    approx_eps: float = 1e-6

    def __post_init__(self):
        if not (0.0 < self.c1 < self.c2 < 1.0):
            raise ValueError(
                f"need 0 < c1 < c2 < 1, got c1={self.c1}, c2={self.c2}"
            )
        if self.interp not in ("cubic", "bisection"):
            raise ValueError(
                f"interp must be 'cubic' or 'bisection', got {self.interp!r}"
            )
        if self.approx_eps < 0.0:
            raise ValueError(
                f"approx_eps must be >= 0, got {self.approx_eps}"
            )


class WolfeResult(NamedTuple):
    alpha: jax.Array  # accepted step (0.0 on failure)
    f_final: jax.Array  # φ(alpha)
    slope_final: jax.Array  # φ'(alpha)
    n_fev: jax.Array  # value+grad evaluations
    iterations: jax.Array
    failed: jax.Array


def wolfe_propose(lo, flo, slo, hi, fhi, shi, interp: str):
    """Next trial inside a finite bracket [lo, hi] (maximization form).

    "cubic": maximizer of the Hermite cubic through (lo, flo, slo) and
    (hi, fhi, shi) — the minimization formula (Nocedal & Wright eq. 3.59)
    applied to -φ — safeguarded into [lo + 0.1w, hi - 0.1w] with a
    bisection fallback for NaN/degenerate cases (complex discriminant,
    zero denominator). "bisection": the midpoint.
    Expansion (hi = inf) is handled by the caller, not here.
    """
    mid = 0.5 * (lo + hi)
    if interp == "bisection":
        return mid
    w = hi - lo
    d1 = -(slo + shi) + 3.0 * (flo - fhi) / (lo - hi)
    disc = d1 * d1 - slo * shi
    d2 = jnp.sqrt(jnp.maximum(disc, 0.0))  # lo < hi: sign(hi - lo) = +1
    a = hi - w * (-shi + d2 - d1) / (-shi + slo + 2.0 * d2)
    a = jnp.clip(a, lo + 0.1 * w, hi - 0.1 * w)
    return jnp.where(jnp.isfinite(a) & (disc >= 0.0), a, mid)


class _WCarry(NamedTuple):
    lo: jax.Array
    flo: jax.Array
    slo: jax.Array
    hi: jax.Array
    fhi: jax.Array
    shi: jax.Array
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

    def accepts(a, fa, sa):
        armijo, curv = conds(a, fa, sa)
        ok = armijo & curv
        if ls.approx:
            # Hager–Zhang approximate Wolfe (see the dataclass note):
            # slope bracket + value non-decrease up to resolution
            aw = (
                (sa >= (2.0 * c1 - 1.0) * m)
                & curv
                & (fa >= f0 - ls.approx_eps * jnp.abs(f0))
            )
            ok = ok | aw
        return ok

    # Acceptance is tested in the loop *condition*, so the accepting trial
    # is never followed by a wasted evaluation; the body only runs to
    # shrink/grow the bracket and evaluate the next trial.
    # doomed-search fast-fail (see backtracking_linesearch): NaN m or f0
    # can never satisfy the conditions; exit immediately with the same
    # in-band alpha=0 outcome instead of burning the budget (critical for
    # vmapped discarded branches).
    doomed = ~(jnp.isfinite(m) & jnp.isfinite(f0))

    def cond(c: _WCarry):
        return ~doomed & ~accepts(c.a, c.fa, c.sa) & (c.it < ls.iterations)

    def body(c: _WCarry):
        if ls.approx:
            # Hager–Zhang SLOPE-DRIVEN interval update (CG_DESCENT §4).
            # The Armijo-driven rule below misclassifies a noise-level
            # value drop as "overshot" and traps the bracket on the wrong
            # side of the 1D optimum once |φ(a) − φ(0)| < eps·|φ| (measured
            # failure: cond-1e3 quadratic endgame, acceptable region at
            # a ≥ 2 while the bracket collapsed inside [0, 1]). Slopes
            # stay accurate to full relative precision there: past the max
            # (φ' ≤ 0) → hi; still ascending with the value within the
            # resolution bar → lo; non-finite or genuinely collapsed
            # value → hi (the same robustness direction as Armijo-fail).
            bar = f0 - ls.approx_eps * jnp.abs(f0)
            bad = ~(jnp.isfinite(c.fa) & jnp.isfinite(c.sa))
            shrink = (c.sa <= 0.0) | (c.fa < bar) | bad
        else:
            armijo, _curv = conds(c.a, c.fa, c.sa)
            # NaN trial values fail Armijo (NaN >= t is False) -> shrink:
            # the same robustness direction as backtracking's
            # finite-phase halving.
            shrink = ~armijo
        hi = jnp.where(shrink, c.a, c.hi)
        fhi = jnp.where(shrink, c.fa, c.fhi)
        shi = jnp.where(shrink, c.sa, c.shi)
        # an unaccepted non-shrink trial always advances lo (in the
        # classic rule that is armijo & ~curv; in the approx rule it is
        # any ascending within-bar trial)
        growlo = ~shrink
        lo = jnp.where(growlo, c.a, c.lo)
        flo = jnp.where(growlo, c.fa, c.flo)
        slo = jnp.where(growlo, c.sa, c.slo)
        a_next = jnp.where(
            jnp.isinf(hi),
            2.0 * lo,
            wolfe_propose(lo, flo, slo, hi, fhi, shi, ls.interp),
        )
        fa, sa = phi_vag(a_next)
        return _WCarry(
            lo=lo, flo=flo, slo=slo, hi=hi, fhi=fhi, shi=shi,
            a=a_next, fa=fa, sa=sa, it=c.it + 1,
        )

    nan = jnp.asarray(jnp.nan, dtype)
    init = _WCarry(
        lo=jnp.zeros((), dtype), flo=f0, slo=m,
        hi=inf, fhi=nan, shi=nan,
        a=one, fa=fa0, sa=sa0,
        it=jnp.zeros((), jnp.int32),
    )
    fc = lax.while_loop(cond, body, init)

    ok = accepts(fc.a, fc.fa, fc.sa)
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
