"""Annealed importance sampling: exact(-in-expectation) model evidence.

`laplace_evidence` is the curvature-based Gaussian approximation at the
mode (the third leg of the reference's MAP workflow — SURVEY.md §5); it
is exact for Gaussian posteriors and silently biased everywhere else
(skew, heavy tails, and catastrophically so for multimodal posteriors,
where it integrates ONE basin). AIS (Neal 2001) repairs this with a
fleet-native estimator: anneal N particles from the Laplace Gaussian
q0 = N(x*, B) to the posterior p along

    pi_t(x) ∝ q0(x)^(1-b_t) · p(x)^(b_t),   0 = b_0 < ... < b_T = 1,

accumulating log-importance weights  Δlog w = (b_{t+1} − b_t)·(log p −
log q0)  and applying one tempered-target HMC move per rung. Then
E_q0[w] = Z exactly (q0 is normalized), so

    log Ẑ = logsumexp(log w) − log N

is unbiased in w with MC error that vanishes as the anneal lengthens —
and the COMBINATION is the point: the MAP fleet supplies the base
Gaussian that makes short anneals accurate.

TPU shape: the particle fleet is one (N, n) batch advancing through a
single `lax.scan` over rungs — every rung is one batched leapfrog (the
tempered gradient is an affine combination of the analytic base gradient
and the model gradient) plus elementwise weight updates. No per-particle
control flow, no gathers, no resampling (plain AIS; the weight ESS
diagnostic says when the anneal is too short).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .api import as_value_and_grad
from .sampling import _da_update

__all__ = ["AISResult", "ais_evidence"]

_LOG_2PI = math.log(2.0 * math.pi)


class AISResult(NamedTuple):
    """logZ: the AIS evidence estimate (logsumexp(logw) − log N).
    logw: (N,) per-particle log weights (for stratified reuse).
    ess: scalar weight effective sample size in [1, N] — the reliability
    diagnostic (ess ≪ N means lengthen the anneal / check the base).
    accept_rate: (T,) fleet-mean HMC acceptance per rung.
    step_size: final adapted leapfrog step.
    n_resamples: scalar count of SMC resampling events (0 in plain-AIS
    mode or when the weights never collapsed).
    final_x: (N, n) particles at b = 1 (posterior draws, weighted by w).
    """

    logZ: jax.Array
    logw: jax.Array
    ess: jax.Array
    accept_rate: jax.Array
    step_size: jax.Array
    n_resamples: jax.Array
    final_x: jax.Array


def _base_from(base, dtype):
    """(mu, cov) from an explicit pair or a solve result (scalar or
    batched fleet — the Laplace base the MAP engines already produced)."""
    if isinstance(base, tuple) and len(base) == 2:
        mu, cov = base
        return jnp.asarray(mu, dtype), jnp.asarray(cov, dtype)
    x = getattr(base, "x", None)
    state = getattr(base, "state", None)
    if x is None or state is None or not hasattr(state, "B"):
        raise TypeError(
            "base must be a (mu, cov) pair or a BFGS solve result "
            "(OptimizeResult with a dense-B state); for L-BFGS fleets "
            "pass (x_map, mass) from chain_init_from_map explicitly"
        )
    if x.ndim == 2:  # fleet: best converged lane's mode, lane-averaged B
        from .sampling import chain_init_from_map
        from .state import Status

        ok = base.status == Status.CONVERGED
        if not bool(jnp.any(ok)):
            # a no-converged-lane fleet would silently anchor the base at
            # a failed iterate with an identity mass — same contract as
            # the workflow's MAP stage: refuse loudly
            raise ValueError(
                "ais_evidence: no lane of the base fleet converged — "
                "the Laplace base would be meaningless; fix the MAP "
                "solve or pass an explicit (mu, cov)"
            )
        best = jnp.argmax(jnp.where(ok, base.fun, -jnp.inf))
        mu = x[best]
        _, cov = chain_init_from_map(base)
        return mu.astype(dtype), cov.astype(dtype)
    return x.astype(dtype), state.B.astype(dtype)


def _systematic_resample(logw, x, q0x, px, k, N, dtype):
    """Systematic resampling: ONE uniform stratifies N positions over the
    normalized-weight CDF (searchsorted + gather — the single gather per
    resampled rung is the price of SMC; everything else stays
    gather-free). Returns equal-weight particles."""
    lse = jax.scipy.special.logsumexp(logw)
    w = jnp.exp(logw - lse)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(k, (), dtype)
    pos = (u0 + jnp.arange(N, dtype=dtype)) / N
    idx = jnp.searchsorted(cdf, pos, side="left")
    idx = jnp.clip(idx, 0, N - 1)
    return x[idx], q0x[idx], px[idx]


@partial(
    jax.jit,
    static_argnames=(
        "obj", "value_and_grad_fn", "n_particles", "n_leapfrog",
        "target_accept", "diag_cov", "resample",
    ),
)
def _ais_core(
    obj, key, mu, cov, betas, n_particles, n_leapfrog, step_size,
    target_accept, value_and_grad_fn, diag_cov, resample,
    resample_threshold,
):
    vag = as_value_and_grad(obj, value_and_grad_fn)
    vag_b = jax.vmap(vag)

    n = mu.shape[0]
    dtype = mu.dtype
    N = n_particles
    T = betas.shape[0] - 1

    # base Gaussian: draws, logdensity, analytic gradient — all through
    # one Cholesky (diag: elementwise)
    if diag_cov:
        sd = jnp.sqrt(cov)
        logdet = jnp.sum(jnp.log(cov))

        def q0_draw(k):
            return mu[None, :] + sd[None, :] * jax.random.normal(
                k, (N, n), dtype
            )

        def q0_val_grad(x):
            d = (x - mu[None, :]) / cov[None, :]
            val = (
                -0.5 * jnp.sum((x - mu[None, :]) * d, axis=1)
                - 0.5 * (logdet + n * _LOG_2PI)
            )
            return val, -d
    else:
        chol = jnp.linalg.cholesky(cov)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        prec = jax.scipy.linalg.cho_solve(
            (chol, True), jnp.eye(n, dtype=dtype)
        )

        def q0_draw(k):
            z = jax.random.normal(k, (N, n), dtype)
            return mu[None, :] + z @ chol.T

        def q0_val_grad(x):
            d = (x - mu[None, :]) @ prec  # (N, n) = Σ⁻¹ (x − mu) rows
            val = (
                -0.5 * jnp.sum((x - mu[None, :]) * d, axis=1)
                - 0.5 * (logdet + n * _LOG_2PI)
            )
            return val, -d

    def p_val_grad(x):
        return vag_b(x)

    # HMC preconditioner = the base covariance (exact for q0, and the
    # annealed targets interpolate toward p around the same mode)
    if diag_cov:
        def draw_p(k):
            return jax.random.normal(k, (N, n), dtype) / sd[None, :]

        def kin(p):
            return 0.5 * jnp.sum(cov[None, :] * p * p, axis=1)

        def vel(p):
            return cov[None, :] * p
    else:
        chol_u = chol.T

        def draw_p(k):
            z = jax.random.normal(k, (N, n), dtype)
            return jax.scipy.linalg.solve_triangular(
                chol_u, z.T, lower=False
            ).T

        def kin(p):
            return 0.5 * jnp.einsum("ci,ij,cj->c", p, cov, p)

        def vel(p):
            return p @ cov.T

    k_init, k_anneal = jax.random.split(key)
    x0 = q0_draw(k_init)
    q0_x, _ = q0_val_grad(x0)
    p_x, _ = p_val_grad(x0)

    mu_da = jnp.log(10.0 * jnp.asarray(step_size, dtype))
    log_eps0 = jnp.log(jnp.asarray(step_size, dtype))

    def rung(carry, t):
        (x, q0x, px, logw, logz_acc, n_resamp, log_eps, log_eps_bar,
         h_bar, t_da) = carry
        b0 = betas[t]
        b1 = betas[t + 1]
        # weight increment at the CURRENT particles (before the move):
        # failed/overflowed particles carry -inf weight, not NaN poison
        dw = (b1 - b0) * (px - q0x)
        logw = logw + jnp.where(jnp.isfinite(dw), dw, -jnp.inf)

        # one HMC move targeting pi_{b1} = (1-b1) q0 + b1 p
        k = jax.random.fold_in(k_anneal, t)
        k1, k2, k3 = jax.random.split(k, 3)

        if resample:
            # SMC: when the weight ESS collapses, bank the partial
            # evidence (logsumexp(w) − log N) and restart equal weights
            # on resampled particles
            lse_t = jax.scipy.special.logsumexp(logw)
            ess_t = jnp.exp(2.0 * lse_t
                            - jax.scipy.special.logsumexp(2.0 * logw))

            def do_rs(args):
                x, q0x, px, logw, logz_acc, n_resamp = args
                x, q0x, px = _systematic_resample(
                    logw, x, q0x, px, k3, N, dtype
                )
                logz_acc = logz_acc + lse_t - jnp.log(
                    jnp.asarray(N, dtype)
                )
                return (x, q0x, px, jnp.zeros_like(logw), logz_acc,
                        n_resamp + 1)

            x, q0x, px, logw, logz_acc, n_resamp = lax.cond(
                ess_t < resample_threshold * N,
                do_rs,
                lambda a: a,
                (x, q0x, px, logw, logz_acc, n_resamp),
            )
        eps = jnp.exp(log_eps)
        p0 = draw_p(k1)

        def grad_t(xx):
            qv, qg = q0_val_grad(xx)
            pv, pg = p_val_grad(xx)
            return qv, pv, (1.0 - b1) * qg + b1 * pg

        # gradient (and both values) ride the carry: ONE evaluation per
        # leapfrog step (+1 seed) — step i's closing half-kick and step
        # i+1's opening half-kick share the same position — and the
        # post-loop Metropolis values come out of the carry for free
        def body(_, c):
            xx, pp, _qv, _pv, g = c
            pp = pp + 0.5 * eps * g
            xx = xx + eps * vel(pp)
            qv, pv, g = grad_t(xx)
            pp = pp + 0.5 * eps * g
            return xx, pp, qv, pv, g

        qv0, pv0, g0 = grad_t(x)
        x_new, p_new, q0_new, p_val_new, _ = lax.fori_loop(
            0, n_leapfrog, body, (x, p0, qv0, pv0, g0)
        )
        logpi_old = (1.0 - b1) * q0x + b1 * px
        logpi_new = (1.0 - b1) * q0_new + b1 * p_val_new
        log_ratio = (logpi_new - kin(p_new)) - (logpi_old - kin(p0))
        a_prob = jnp.exp(jnp.minimum(log_ratio, 0.0))
        a_prob = jnp.where(jnp.isfinite(a_prob), a_prob, 0.0)
        acc = jax.random.uniform(k2, (N,), dtype) < a_prob
        x = jnp.where(acc[:, None], x_new, x)
        q0x = jnp.where(acc, q0_new, q0x)
        px = jnp.where(acc, p_val_new, px)

        log_eps, log_eps_bar, h_bar, t_da = _da_update(
            h_bar, log_eps_bar, t_da,
            target_accept - jnp.mean(a_prob), mu_da,
        )
        carry = (x, q0x, px, logw, logz_acc, n_resamp, log_eps,
                 log_eps_bar, h_bar, t_da)
        return carry, jnp.mean(a_prob)

    carry0 = (
        x0, q0_x, p_x, jnp.zeros((N,), dtype), jnp.zeros((), dtype),
        jnp.zeros((), jnp.int32),
        log_eps0, log_eps0, jnp.zeros((), dtype), jnp.zeros((), dtype),
    )
    carry, accs = lax.scan(rung, carry0, jnp.arange(T))
    (x, _q0x, _px, logw, logz_acc, n_resamp, log_eps, _leb, _hb,
     _tda) = carry

    lse = jax.scipy.special.logsumexp(logw)
    logZ = logz_acc + lse - jnp.log(jnp.asarray(N, dtype))
    ess = jnp.exp(2.0 * lse - jax.scipy.special.logsumexp(2.0 * logw))
    return AISResult(
        logZ=logZ,
        logw=logw,
        ess=ess,
        accept_rate=accs,
        step_size=jnp.exp(log_eps),
        n_resamples=n_resamp,
        final_x=x,
    )


def ais_evidence(
    obj,
    key: jax.Array,
    base,
    n_particles: int = 1024,
    n_steps: int = 64,
    n_leapfrog: int = 8,
    step_size: float = 0.2,
    target_accept: float = 0.8,
    schedule=1.0,
    resample: bool = False,
    resample_threshold: float = 0.5,
    value_and_grad_fn: Optional[Callable] = None,
) -> AISResult:
    """Annealed-importance-sampling log evidence from a Laplace base.

    ``base``: a BFGS solve result (scalar or fleet — mode x* and
    curvature B become the base Gaussian q0 = N(x*, B); for a fleet the
    best converged lane's mode and the converged-lane-averaged B), or an
    explicit ``(mu, cov)`` pair with ``cov`` dense (n, n) or diagonal
    (n,) — e.g. `chain_init_from_map`'s mass for L-BFGS fleets.

    ``n_steps`` rungs anneal q0 → posterior (one fleet HMC move per rung,
    preconditioned by the base covariance, step size dual-averaged along
    the anneal); ``schedule``: a float power p gives
    b_t = (t/T)^p (p > 1 spends rungs near the base, p = 1 linear), or
    pass an explicit (n_steps+1,) array from 0 to 1.

    ``resample=True`` upgrades plain AIS to an SMC sampler: whenever the
    weight ESS drops below ``resample_threshold · n_particles``, the
    partial evidence logsumexp(w) − log N is banked into the estimate,
    particles systematically resample to equal weights (one gather —
    the only gather in the program), and the anneal continues. This
    keeps long anneals on hard targets from being dominated by a few
    surviving particles; `result.n_resamples` reports how often it
    fired.

    `result.logZ` estimates log Z (unbiased in the weights); compare
    `laplace_evidence` to measure the Gaussian approximation's error —
    on multimodal posteriors Laplace integrates one basin while AIS, with
    a wide-enough base, sees them all. `result.ess` ≪ n_particles means
    the anneal is too short or the base too narrow.
    """
    if n_steps < 1:
        raise ValueError("n_steps must be >= 1")
    x_probe = getattr(base, "x", base[0] if isinstance(base, tuple) else None)
    if x_probe is None:
        raise TypeError("base must be a solve result or a (mu, cov) pair")
    dtype = jnp.asarray(x_probe).dtype
    mu, cov = _base_from(base, dtype)
    if mu.ndim != 1:
        raise ValueError(f"base mean must be (n,), got {mu.shape}")
    if cov.ndim not in (1, 2):
        raise ValueError("base cov must be (n, n) dense or (n,) diagonal")
    if isinstance(schedule, (int, float)):
        if schedule <= 0:
            raise ValueError("schedule power must be > 0")
        betas = jnp.linspace(0.0, 1.0, n_steps + 1, dtype=dtype) ** float(
            schedule
        )
    else:
        betas = jnp.asarray(schedule, dtype)
        if betas.shape != (n_steps + 1,):
            raise ValueError(
                f"schedule array must be ({n_steps + 1},), got {betas.shape}"
            )
    if not (0.0 < resample_threshold < 1.0):
        raise ValueError("resample_threshold must be in (0, 1)")
    return _ais_core(
        obj, key, mu, cov, betas, n_particles, n_leapfrog,
        step_size, target_accept, value_and_grad_fn, cov.ndim == 1,
        resample, jnp.asarray(resample_threshold, dtype),
    )
