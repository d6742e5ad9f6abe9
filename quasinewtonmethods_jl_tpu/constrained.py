"""Constrained optimization: augmented-Lagrangian outer loop over the
native engines.

The reference is an unconstrained maximizer (src/QuasiNewtonMethods.jl
:237-292); constrained MAP problems (simplexes, monotone orderings,
budget/feasibility sets) are usually handled upstream by reparametrizing
(`transforms.py` covers the smooth-bijection cases). This module covers
the cases a bijection cannot: GENERAL smooth equality and inequality
constraints, via the Powell–Hestenes–Rockafellar augmented Lagrangian
(the LANCELOT/ALGENCAN scheme, Nocedal & Wright ch. 17) in the library's
maximization convention:

    maximize f(x)  s.t.  eq(x) = 0,  ineq(x) >= 0

Each outer iteration maximizes the smooth augmented objective

    F(x) = f(x) − λᵀh − (ρ/2)‖h‖²  −  (1/2ρ) Σᵢ [max(0, μᵢ − ρ cᵢ)² − μᵢ²]

with any of the library's engines (BFGS / L-BFGS / CG / TR — the inner
solve is the same jitted machinery users already run unconstrained),
then does the first-order multiplier updates λ ← λ + ρ h(x*),
μ ← max(0, μ − ρ c(x*)) and grows ρ only when the KKT violation
max(|h|, |min(c, μ/ρ)|) failed to shrink by ``viol_decrease``.

TPU shape: ONE jitted program — the outer loop is a `lax.while_loop`
whose body inlines the engine's full solve (itself a while_loop), so a
20-outer-iteration constrained solve costs one compile and zero host
round-trips. The inner objective closes over the loop-carried (λ, μ, ρ)
tracers; no recompilation per outer iteration (the Python-loop
formulation would recompile the engine on every multiplier update).

Contracts (the library-wide ones): in-band failure — ``fun`` is NaN
unless the KKT certificate holds (inner max|∇L| < tol AND violation
≤ ctol); only a NON-FINITE objective is a hard inner failure that stops
the outer loop and reports that status — a line-search stall is soft
(the multiplier update re-centers the Lagrangian and the next round
usually certifies); the iterate is always the last inner solution.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .api import as_value_and_grad, as_value_fn
from .cg_solve import optimize_cg
from .lbfgs_solve import optimize_lbfgs
from .ops.linesearch import BackTracking
from .ops.wolfe import Wolfe
from .solve import MAX_ITERATIONS_DEFAULT, optimize
from .state import Status
from .trust_region import optimize_tr

__all__ = ["AugLagResult", "optimize_auglag"]

_ENGINES = ("bfgs", "lbfgs", "cg", "tr")


class AugLagResult(NamedTuple):
    """Constrained solve result (in-band contract as everywhere):
    ``fun`` is f(x) when the KKT certificate holds — inner convergence
    (max|∇L| < tol) AND constraint violation ≤ ctol — and NaN otherwise.
    ``viol`` is the final KKT violation max(|eq|, |min(ineq, μ/ρ)|);
    ``eq``/``ineq`` the final constraint values ((0,) when absent);
    ``lam``/``mu`` the converged multipliers (the constraint shadow
    prices); ``inner_status`` the last inner engine status."""

    x: jax.Array
    fun: jax.Array
    grad: jax.Array  # ∇f at x (maximization orientation)
    status: jax.Array
    viol: jax.Array
    eq: jax.Array
    ineq: jax.Array
    lam: jax.Array
    mu: jax.Array
    rho: jax.Array
    n_outer: jax.Array
    iterations: jax.Array  # total inner iterations across outer rounds
    n_fev: jax.Array
    inner_status: jax.Array

    @property
    def converged(self) -> jax.Array:
        return self.status == Status.CONVERGED


class _Flat1D:
    """Hashable at-least-1d constraint wrapper: jit caches key on the
    callable, so the wrapper must compare/hash by the wrapped function
    (a fresh lambda per call would defeat the compilation cache)."""

    __slots__ = ("fn", "__weakref__")  # jax.eval_shape weakref-caches fns

    def __init__(self, fn: Callable):
        self.fn = fn

    def __call__(self, x):
        return jnp.atleast_1d(self.fn(x))

    def __hash__(self):
        return hash((_Flat1D, self.fn))

    def __eq__(self, other):
        return type(other) is _Flat1D and other.fn == self.fn


def _run_engine(engine, F, x, F_vag, tol, max_iterations, ls, history,
                cg_method):
    """One inner maximize of the augmented objective; returns the common
    (x, status, iterations, n_fev) slice of the engine's result."""
    if engine == "bfgs":
        r = optimize(F, x, ls=ls, tol=tol, max_iterations=max_iterations,
                     value_and_grad_fn=F_vag, jit=False)
    elif engine == "lbfgs":
        r = optimize_lbfgs(F, x, history=history, ls=ls, tol=tol,
                           max_iterations=max_iterations,
                           value_and_grad_fn=F_vag)
    elif engine == "cg":
        r = optimize_cg(F, x, method=cg_method, ls=ls, tol=tol,
                        max_iterations=max_iterations,
                        value_and_grad_fn=F_vag)
    else:  # tr
        r = optimize_tr(F, x, tol=tol, max_iterations=max_iterations,
                        value_and_grad_fn=F_vag)
    return r.x, r.status, r.iterations, r.n_fev


@partial(
    jax.jit,
    static_argnames=(
        "obj", "eq", "ineq", "engine", "value_and_grad_fn", "ls",
        "max_outer", "max_iterations", "history", "cg_method",
        "tol", "ctol",  # tol is static in the TR engine's jit
    ),
)
def _auglag_core(
    obj, x0, eq, ineq, lam0, mu0, rho0, tol, ctol, rho_growth,
    viol_decrease, rho_max, engine, value_and_grad_fn, ls, max_outer,
    max_iterations, history, cg_method,
):
    vag_f = as_value_and_grad(obj, value_and_grad_fn)
    f_val = as_value_fn(obj, value_and_grad_fn)
    dtype = x0.dtype
    zero1 = jnp.zeros((0,), dtype)

    def h_of(x):
        return eq(x) if eq is not None else zero1

    def c_of(x):
        return ineq(x) if ineq is not None else zero1

    def violation(h, c, mu, rho):
        v = jnp.zeros((), dtype)
        if eq is not None:
            v = jnp.maximum(v, jnp.max(jnp.abs(h)))
        if ineq is not None:
            v = jnp.maximum(v, jnp.max(jnp.abs(jnp.minimum(c, mu / rho))))
        return v

    def penalty(x, lam, mu, rho):
        p = jnp.zeros((), dtype)
        if eq is not None:
            h = eq(x)
            p = p + jnp.dot(lam, h) + 0.5 * rho * jnp.dot(h, h)
        if ineq is not None:
            t = jnp.maximum(0.0, mu - rho * ineq(x))
            p = p + (0.5 / rho) * (jnp.dot(t, t) - jnp.dot(mu, mu))
        return p

    def body(carry):
        (x, lam, mu, rho, vprev, k, tot_it, tot_fev, _succ, _hard,
         _inner) = carry

        def F(xx):
            # value-only trials (line searches) never pay a gradient
            return f_val(xx) - penalty(xx, lam, mu, rho)

        def F_vag(xx):
            fv, fg = vag_f(xx)
            pv, pg = jax.value_and_grad(penalty)(xx, lam, mu, rho)
            return fv - pv, fg - pg

        x1, st, it, fev = _run_engine(
            engine, F, x, F_vag, tol, max_iterations, ls, history,
            cg_method,
        )
        h = h_of(x1)
        c = c_of(x1)
        v = violation(h, c, mu, rho)
        lam1 = lam + rho * h
        mu1 = jnp.maximum(0.0, mu - rho * c)
        success = (st == Status.CONVERGED) & (v <= ctol)
        # soft inner outcomes (iteration cap, line-search stall at the
        # fp floor of an ill-conditioned augmented objective) continue —
        # the multiplier update re-centers the Lagrangian and the next
        # round usually certifies; only a non-finite objective is hard
        hard = st == Status.NONFINITE_VALUE
        rho1 = jnp.where(
            v > viol_decrease * vprev,
            jnp.minimum(rho * rho_growth, rho_max),
            rho,
        )
        return (x1, lam1, mu1, rho1, v, k + 1, tot_it + it,
                tot_fev + fev, success, hard, st)

    def cond(carry):
        _x, _l, _m, _r, _v, k, _ti, _tf, succ, hard, _st = carry
        return (~succ) & (~hard) & (k < max_outer)

    carry0 = (
        x0, lam0, mu0, rho0, jnp.asarray(jnp.inf, dtype),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
        jnp.asarray(False), jnp.asarray(False),
        jnp.asarray(Status.RUNNING, jnp.int32),
    )
    (x, lam, mu, rho, v, k, tot_it, tot_fev, success, hard,
     inner_st) = lax.while_loop(cond, body, carry0)

    fv, fg = vag_f(x)
    nan = jnp.asarray(jnp.nan, dtype)
    status = jnp.where(
        success,
        jnp.int32(Status.CONVERGED),
        jnp.where(hard, inner_st, jnp.int32(Status.MAX_ITERATIONS)),
    )
    return AugLagResult(
        x=x,
        fun=jnp.where(success, fv, nan),
        grad=fg,
        status=status,
        viol=v,
        eq=h_of(x),
        ineq=c_of(x),
        lam=lam,
        mu=mu,
        rho=rho,
        n_outer=k,
        iterations=tot_it,
        n_fev=tot_fev,
        inner_status=inner_st,
    )


def optimize_auglag(
    obj,
    x0: jax.Array,
    eq: Optional[Callable] = None,
    ineq: Optional[Callable] = None,
    *,
    engine: str = "bfgs",
    tol: float = 1e-8,
    ctol: float = 1e-8,
    rho0: float = 10.0,
    rho_growth: float = 10.0,
    rho_max: float = 1e8,
    viol_decrease: float = 0.25,
    max_outer: int = 20,
    max_iterations: int = MAX_ITERATIONS_DEFAULT,
    lam0: Optional[jax.Array] = None,
    mu0: Optional[jax.Array] = None,
    ls=None,
    history: int = 10,
    cg_method: str = "hz",
    value_and_grad_fn: Optional[Callable] = None,
) -> AugLagResult:
    """Maximize f(x) subject to eq(x) = 0 and ineq(x) >= 0.

    Powell–Hestenes–Rockafellar augmented Lagrangian: ``max_outer``
    rounds of [maximize the augmented objective with ``engine`` →
    first-order multiplier update → grow ρ if the violation stalled],
    compiled as ONE program (`lax.while_loop` outer, the engine's own
    while_loop inner — multipliers ride the carry, so there is no
    per-round recompilation and no host round-trip).

    ``eq``/``ineq``: jax-differentiable callables x ↦ (m,) (scalars are
    promoted); at least one required. ``engine``: 'bfgs' (default) /
    'lbfgs' / 'cg' / 'tr' — the same inner machinery as the
    unconstrained entry points (``ls`` defaults per engine; ``history``
    rides 'lbfgs', ``cg_method`` rides 'cg'). ``lam0``/``mu0`` warm-start
    the multipliers (defaults: zeros, i.e. the first round is a pure
    quadratic-penalty solve at ``rho0``).

    Success = the KKT certificate: the last inner solve CONVERGED
    (max|∇ₓL| < ``tol``) AND the violation max(|eq|, |min(ineq, μ/ρ)|)
    ≤ ``ctol``; then ``fun`` = f(x) and ``lam``/``mu`` are the
    multipliers (μ ≥ 0, complementary by construction). Otherwise
    ``fun`` is NaN in-band: a hard inner failure reports that status, an
    exhausted outer budget reports MAX_ITERATIONS (``viol`` says how
    infeasible it still is).

    f32/TPU guidance as everywhere: tol, ctol ≥ ~1e-3. For constraints
    a smooth bijection can absorb (positivity, boxes, simplexes),
    prefer `transforms.py` — unconstrained geometry samples and solves
    better; this is for the genuinely coupled constraints.
    """
    x0 = jnp.asarray(x0)
    if x0.ndim != 1:
        raise ValueError(
            f"optimize_auglag expects a rank-1 x0 (single solve); got "
            f"shape {x0.shape} — constrained fleets: vmap is correct but "
            f"lockstep-unmasked; open an issue if you need them fast"
        )
    if eq is None and ineq is None:
        raise ValueError(
            "at least one of eq=/ineq= is required — unconstrained "
            "problems: use optimize/optimize_lbfgs/optimize_cg/optimize_tr"
        )
    if engine not in _ENGINES:
        raise ValueError(f"engine must be one of {_ENGINES}, got {engine!r}")
    for name, fn in (("eq", eq), ("ineq", ineq)):
        if fn is not None and not callable(fn):
            raise TypeError(f"{name} must be callable, got {type(fn)!r}")
    if max_outer < 1:
        raise ValueError("max_outer must be >= 1")
    if not (rho0 > 0 and rho_growth >= 1 and rho_max >= rho0):
        raise ValueError("need rho0 > 0, rho_growth >= 1, rho_max >= rho0")
    dtype = x0.dtype
    eqw = _Flat1D(eq) if eq is not None else None
    inw = _Flat1D(ineq) if ineq is not None else None

    def _mult_init(given, fn, label):
        if fn is None:
            if given is not None:
                raise ValueError(f"{label}0 given without {label}=")
            return jnp.zeros((0,), dtype)
        shape = jax.eval_shape(fn, x0).shape
        if len(shape) != 1:
            raise ValueError(
                f"{label}(x0) must be rank-0/1, got shape {shape}"
            )
        if given is None:
            return jnp.zeros(shape, dtype)
        given = jnp.asarray(given, dtype)
        if given.shape != shape:
            raise ValueError(
                f"{label}0 shape {given.shape} != constraint shape {shape}"
            )
        return given

    lam = _mult_init(lam0, eqw, "lam")
    mu = _mult_init(mu0, inw, "mu")
    if mu.size and bool(jnp.any(mu < 0)):
        raise ValueError("mu0 must be elementwise >= 0")
    if ls is None:
        # the augmented objective has |F*| > 0 whenever a constraint is
        # active and grows ill-conditioned with rho — exactly the regime
        # where the Armijo VALUE test hits the fp floor one step short
        # of the gradient certificate (the measured CG endgame failure,
        # STATUS round-4); the HZ approximate-Wolfe slope acceptance is
        # the fix, so it is the default for every line-search engine here
        ls = Wolfe(approx=True)
    return _auglag_core(
        obj, x0, eqw, inw, lam, mu,
        jnp.asarray(rho0, dtype), float(tol), float(ctol),
        jnp.asarray(rho_growth, dtype),
        jnp.asarray(viol_decrease, dtype), jnp.asarray(rho_max, dtype),
        engine, value_and_grad_fn, ls, max_outer, max_iterations,
        history, cg_method,
    )
