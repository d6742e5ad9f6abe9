"""Batched HMC sampling warm-started by the MAP fleet — the use case the
reference library exists for, completed end to end.

The reference is "the inner MAP/mode-finding engine intended for
ProbabilityModels.jl + InplaceDHMC.jl (HMC chain initialization)"
(reference README.md:14; SURVEY.md gestalt) — it finds the mode, and an
external HMC machine takes over. This module is that machine's TPU-native
counterpart, designed around what the optimizer already produced:

  * the batched MAP result's iterates are the chain initializations
    (one chain per lane — the multi-chain pattern `PtrBFGSState` exists
    for in the reference, :117-121);
  * the converged inverse Hessian B ≈ the posterior covariance at the
    mode, which is exactly the (dense) mass-matrix preconditioner
    Euclidean HMC wants: kinetic energy 0.5 pᵀ B p, position update
    x += eps * B p — both a single matvec with the B the solver already
    holds. No inversion is needed anywhere: momenta are drawn via the
    Cholesky of B (p = L⁻ᵀ z gives cov(p) = B⁻¹).

Everything is batched the TPU way: `lax.scan` over steps, chains as a
leading axis, one fused program for all chains; the maximization
convention carries over unchanged (logdensity IS the log target).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .api import as_value_and_grad

__all__ = ["HMCResult", "hmc_sample", "chain_init_from_map"]


class HMCResult(NamedTuple):
    """Samples and diagnostics for a batched HMC run.

    samples: (n_samples, chains, n) post-warmup draws
    accept_rate: (chains,) mean Metropolis acceptance over sampling
    step_size: (chains,) final (adapted) leapfrog step size
    final_x: (chains, n) last state (resumable)
    """

    samples: jax.Array
    accept_rate: jax.Array
    step_size: jax.Array
    final_x: jax.Array


def chain_init_from_map(result, jitter: float = 0.0, key=None):
    """(x0s, mass) from a batched MAP result (`optimize_batched*`).

    Returns the per-chain initial positions and a SINGLE dense mass
    preconditioner B ≈ posterior covariance: the lane-averaged converged
    inverse Hessian over successful lanes (averaging smooths per-lane
    noise; all lanes of a well-posed MAP land on the same mode). Optional
    Gaussian jitter decorrelates chains that share the mode.
    """
    from .state import Status

    x0s = result.x
    ok = (result.status == Status.CONVERGED).astype(x0s.dtype)
    w = ok / jnp.maximum(jnp.sum(ok), 1.0)
    mass = jnp.einsum("b,bij->ij", w, result.state.B)
    if jitter and key is not None:
        x0s = x0s + jitter * jax.random.normal(key, x0s.shape, x0s.dtype)
    return x0s, mass


def _leapfrog(grad_fn, x, p, eps, mass, n_steps):
    """Standard velocity-Verlet with M⁻¹ = mass (ascent form: dp/dt = +∇)."""

    def body(_, carry):
        x, p = carry
        p = p + 0.5 * eps * grad_fn(x)
        x = x + eps * (mass @ p if mass.ndim == 2 else mass * p)
        p = p + 0.5 * eps * grad_fn(x)
        return x, p

    return lax.fori_loop(0, n_steps, body, (x, p))


@partial(
    jax.jit,
    static_argnames=(
        "obj", "value_and_grad_fn", "n_samples", "n_warmup", "n_leapfrog",
        "target_accept",
    ),
)
def hmc_sample(
    obj,
    key: jax.Array,
    x0s: jax.Array,  # (chains, n) initial positions (e.g. the MAP fleet)
    mass: Optional[jax.Array] = None,  # (n, n) dense or (n,) diagonal ~ cov
    n_samples: int = 1000,
    n_warmup: int = 500,
    n_leapfrog: int = 16,
    step_size: float = 0.1,
    target_accept: float = 0.8,
    value_and_grad_fn: Optional[Callable] = None,
) -> HMCResult:
    """Batched Euclidean HMC over independent chains.

    ``obj`` is the same pure logdensity (MAXIMIZED = the log target) the
    optimizer takes; ``mass`` is the covariance-like preconditioner
    (`chain_init_from_map` provides B from the MAP fleet; None = identity).
    Warmup adapts a per-chain step size by dual averaging toward
    ``target_accept`` (Hoffman & Gelman 2014, the standard schedule);
    sampling runs at the adapted step. One jitted `lax.scan` per phase;
    chains advance in lockstep (leapfrog cost is identical per chain, so
    there is no straggler problem — unlike the solves).

    This is deliberately plain HMC, not NUTS: fixed path length keeps the
    program free of data-dependent trip counts, which is what the TPU
    wants; tune ``n_leapfrog`` to the problem scale.
    """
    vag = as_value_and_grad(obj, value_and_grad_fn)
    vag_b = jax.vmap(vag)

    chains, n = x0s.shape
    dtype = x0s.dtype

    if mass is None:
        mass_b = jnp.ones((n,), dtype)
        chol_u = None  # identity: momenta are standard normal
    else:
        mass_b = mass
        if mass.ndim == 2:
            # p = L^-T z => cov(p) = (L L^T)^-1 = mass^-1: exactly N(0, M)
            chol_u = jnp.linalg.cholesky(mass).T  # upper triangular
        elif mass.ndim == 1:
            chol_u = None
        else:
            raise ValueError("mass must be (n, n), (n,), or None")

    def draw_momentum(k):
        z = jax.random.normal(k, (chains, n), dtype)
        if mass_b.ndim == 2:
            return jax.scipy.linalg.solve_triangular(chol_u, z.T, lower=False).T
        return z / jnp.sqrt(mass_b)[None, :]

    def kinetic(p):  # 0.5 p' M^-1 p with M^-1 = mass
        if mass_b.ndim == 2:
            return 0.5 * jnp.einsum("ci,ij,cj->c", p, mass_b, p)
        return 0.5 * jnp.sum(mass_b[None, :] * p * p, axis=1)

    def leap_b(x, p, eps):
        def one(xc, pc, ec):
            return _leapfrog(lambda xx: vag(xx)[1], xc, pc, ec, mass_b,
                             n_leapfrog)
        return jax.vmap(one)(x, p, eps)

    def hmc_step(x, f, eps, k):
        k1, k2 = jax.random.split(k)
        p = draw_momentum(k1)
        x_new, p_new = leap_b(x, p, eps)
        f_new, _ = vag_b(x_new)
        log_ratio = (f_new - kinetic(p_new)) - (f - kinetic(p))
        # NaN-robust: a diverged trajectory (non-finite ratio) is rejected
        accept_prob = jnp.exp(jnp.minimum(log_ratio, 0.0))
        accept_prob = jnp.where(jnp.isfinite(accept_prob), accept_prob, 0.0)
        u = jax.random.uniform(k2, (chains,), dtype)
        acc = u < accept_prob
        x = jnp.where(acc[:, None], x_new, x)
        f = jnp.where(acc, f_new, f)
        return x, f, acc, accept_prob

    f0, _ = vag_b(x0s)

    # ---- warmup: dual averaging toward target_accept (per chain) ----
    mu = jnp.log(10.0 * jnp.asarray(step_size, dtype))
    t0, kappa, gamma_da = 10.0, 0.75, 0.05

    def warm_body(carry, k):
        x, f, log_eps, log_eps_bar, h_bar, t = carry
        x, f, _acc, a_prob = hmc_step(x, f, jnp.exp(log_eps), k)
        t = t + 1.0
        eta = 1.0 / (t + t0)
        h_bar = (1.0 - eta) * h_bar + eta * (target_accept - a_prob)
        log_eps = mu - jnp.sqrt(t) / gamma_da * h_bar
        w = t ** (-kappa)
        log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
        return (x, f, log_eps, log_eps_bar, h_bar, t), None

    log_eps0 = jnp.full((chains,), jnp.log(jnp.asarray(step_size, dtype)))
    if n_warmup > 0:
        (x, f, _le, log_eps_bar, _hb, _t), _ = lax.scan(
            warm_body,
            (x0s, f0, log_eps0, log_eps0, jnp.zeros((chains,), dtype),
             jnp.zeros((), dtype)),
            jax.random.split(key, n_warmup),
        )
        eps_final = jnp.exp(log_eps_bar)
    else:
        x, f = x0s, f0
        eps_final = jnp.exp(log_eps0)

    # ---- sampling at the adapted step ----
    def sample_body(carry, k):
        x, f = carry
        x, f, acc, _ = hmc_step(x, f, eps_final, k)
        return (x, f), (x, acc)

    key_s = jax.random.fold_in(key, 1)
    (x, f), (samples, accs) = lax.scan(
        sample_body, (x, f), jax.random.split(key_s, n_samples)
    )
    return HMCResult(
        samples=samples,
        accept_rate=jnp.mean(accs.astype(dtype), axis=0),
        step_size=eps_final,
        final_x=x,
    )
