"""Laplace evidence: exact on Gaussians, B-approximation quality, in-band
failure propagation, batched fleets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm


def _gaussian_with_known_evidence(n, seed=7):
    """Unnormalized Gaussian L = -0.5 x'P x + b'x + c with exact
    log Z = c + 0.5 b'P^-1 b + n/2 log 2pi - 0.5 logdet P."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)) * 0.4
    P = A @ A.T + np.eye(n)
    b = rng.standard_normal(n)
    c = 1.3
    Pj, bj = jnp.asarray(P), jnp.asarray(b)

    def logdensity(x):
        return -0.5 * x @ (Pj @ x) + bj @ x + c

    log_z = (
        c + 0.5 * b @ np.linalg.solve(P, b)
        + 0.5 * n * np.log(2 * np.pi) - 0.5 * np.linalg.slogdet(P)[1]
    )
    return logdensity, float(log_z)


def test_exact_hessian_is_exact_on_gaussian():
    logdensity, log_z = _gaussian_with_known_evidence(5)
    res = qnm.optimize(logdensity, jnp.zeros(5), tol=1e-10)
    assert bool(res.converged)
    lz = qnm.laplace_evidence(res, obj=logdensity)
    np.testing.assert_allclose(float(lz), log_z, rtol=1e-9)


def test_b_approximation_close_on_gaussian():
    """The free B-based path: BFGS curvature is a secant estimate, so the
    bar is 'useful screen', not machine precision."""
    logdensity, log_z = _gaussian_with_known_evidence(5)
    res = qnm.optimize(logdensity, jnp.zeros(5), tol=1e-10)
    lz = qnm.laplace_evidence(res)
    assert abs(float(lz) - log_z) < 0.5  # within half a nat


def test_batched_fleet_matches_scalar():
    logdensity, log_z = _gaussian_with_known_evidence(4)
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.standard_normal((6, 4)))
    fleet = qnm.optimize_batched(logdensity, X0, tol=1e-10)
    lz = qnm.laplace_evidence(fleet, obj=logdensity)
    assert lz.shape == (6,)
    np.testing.assert_allclose(np.asarray(lz), log_z, rtol=1e-8)


def test_model_comparison_picks_the_true_model():
    """The use case: evidence must favor the model the data came from.
    Two nested Gaussian 'models' for the same 1-D data summary — the
    better-matched prior scale wins the Bayes factor."""
    data_mean, n_obs = 1.0, 25

    def make_model(prior_var):
        def logdensity(mu):
            # N(data_mean | mu, 1/n_obs) likelihood + N(0, prior_var) prior
            return (
                -0.5 * n_obs * (data_mean - mu[0]) ** 2
                - 0.5 * mu[0] ** 2 / prior_var
                - 0.5 * jnp.log(2 * jnp.pi * prior_var)
            )
        return logdensity

    good = make_model(1.0)    # prior covers the truth
    bad = make_model(1e-4)    # prior pins mu ~ 0, far from data
    lz = {}
    for name, m in (("good", good), ("bad", bad)):
        res = qnm.optimize(m, jnp.zeros(1), tol=1e-12)
        lz[name] = float(qnm.laplace_evidence(res, obj=m))
    assert lz["good"] > lz["bad"] + 2.0  # decisive Bayes factor


def test_saddle_and_failure_are_nan():
    # non-PD -H at the reported point -> NaN in-band
    def saddle(x):
        return x[0] ** 2 - x[1] ** 2  # pure saddle at 0

    res = qnm.optimize(lambda x: -jnp.sum(x * x), jnp.zeros(2), tol=1e-10)
    fake = res._replace(x=jnp.zeros(2))
    lz = qnm.laplace_evidence(fake, obj=saddle)
    assert np.isnan(float(lz))

    # failed solve (NaN fun contract) propagates NaN
    bad = qnm.optimize(lambda x: jnp.nan * jnp.sum(x), jnp.ones(3))
    lz2 = qnm.laplace_evidence(bad, obj=lambda x: -jnp.sum(x * x))
    assert np.isnan(float(lz2))


def test_lbfgs_compact_evidence_dispatch():
    """An L-BFGS result without obj now dispatches to the compact-form
    determinant identity (round 3) instead of raising; the exact path
    still works too."""
    res = qnm.optimize_lbfgs(lambda x: -jnp.sum(x * x), jnp.ones(4))
    lz_free = qnm.laplace_evidence(res)
    assert np.isfinite(float(lz_free))
    lz = qnm.laplace_evidence(res, obj=lambda x: -jnp.sum(x * x))
    assert np.isfinite(float(lz))


def test_lbfgs_compact_logdet_matches_dense_construction(rng):
    """The O(m³ + m²n) determinant identity equals slogdet of the densely
    materialized compact H to machine precision, stale slots included."""
    from jax.scipy.linalg import solve_triangular
    from quasinewtonmethods_jl_tpu.ops.lbfgs_compact import (
        _masked_compact_setup,
        lbfgs_logdet_inv_hessian,
    )

    m, n = 6, 12
    for hist in (0, 1, 3, 6):
        S = jnp.asarray(rng.standard_normal((m, n)))
        Y = S * 1.3 + 0.1 * jnp.asarray(rng.standard_normal((m, n)))
        gamma = jnp.asarray(1.7)
        h = jnp.asarray(hist, jnp.int32)
        vmask, Sm, Ym, SY, YY, R, D = _masked_compact_setup(
            S, Y, h, S.dtype
        )
        G = jnp.diag(D) + gamma * YY
        Rinv = jnp.linalg.inv(R)
        M = jnp.block(
            [[Rinv.T @ G @ Rinv, -Rinv.T], [-Rinv, jnp.zeros((m, m))]]
        )
        U = jnp.concatenate([Sm.T, gamma * Ym.T], axis=1)
        H = gamma * jnp.eye(n) + U @ M @ U.T
        sgn, ld_dense = jnp.linalg.slogdet(H)
        ld = lbfgs_logdet_inv_hessian(S, Y, h, gamma)
        assert float(sgn) > 0
        np.testing.assert_allclose(
            float(ld), float(ld_dense), rtol=1e-9, err_msg=f"hist={hist}"
        )


def test_lbfgs_compact_evidence_parity_on_gaussian():
    """Mid-n Gaussian with a FULL ring of conjugate secant pairs: the
    compact H is then exactly the true covariance (the classical n-update
    BFGS-on-quadratic result), so the ring-based evidence matches the
    exact-Hessian path to ~1e-6."""
    from quasinewtonmethods_jl_tpu.ops.lbfgs_compact import (
        lbfgs_logdet_inv_hessian,
    )
    from quasinewtonmethods_jl_tpu.state import LBFGSState

    rng = np.random.default_rng(3)
    n = 10
    A = rng.standard_normal((n, n))
    C = jnp.asarray(A @ A.T / n + np.eye(n))  # covariance = (-H)^-1
    Ci = jnp.linalg.inv(C)
    # A-conjugate directions (eigenvectors of Ci): the n exact secant
    # pairs (s_i, y_i = Ci s_i) determine H = C exactly
    w, V = jnp.linalg.eigh(Ci)
    S = V.T  # rows are the directions
    Y = (Ci @ V).T
    ld = lbfgs_logdet_inv_hessian(
        S, Y, jnp.asarray(n, jnp.int32), jnp.asarray(1.0)
    )
    ld_true = jnp.linalg.slogdet(C)[1]
    np.testing.assert_allclose(float(ld), float(ld_true), rtol=1e-6)


def test_lbfgs_compact_evidence_large_n_batched():
    """n=4096 batched evidence straight from an L-BFGS fleet — the
    dense-free pipeline at scale. For a spherical Gaussian the secant
    pairs satisfy y = s / c, making the compact H exactly c·I: evidence
    is analytic and must match to fp tolerance without any n×n work."""
    n, batch = 4096, 4
    c = 2.5

    def logd(x):
        return -0.5 * jnp.sum(x * x) / c

    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.standard_normal((batch, n)))
    res = qnm.optimize_lbfgs_batched(logd, x0, history=8, tol=1e-9)
    assert np.all(np.asarray(res.status) == qnm.Status.CONVERGED)
    lz = qnm.laplace_evidence(res)
    true_lz = 0.5 * n * (np.log(2 * np.pi) + np.log(c))
    np.testing.assert_allclose(np.asarray(lz), true_lz, rtol=1e-8)


def test_linesearch_failure_lane_is_nan():
    """A lane that stalled in-band has fun = NaN; its 'evidence' must be
    NaN too, not a number computed at a non-converged point."""
    def cliff(x):
        at_start = jnp.all(x == 0.0)
        return jnp.where(at_start, jnp.sum(x) + 1.0, jnp.nan)

    res = qnm.optimize(cliff, jnp.zeros(3), ls=qnm.BackTracking(iterations=20))
    assert int(res.status) == qnm.Status.LINESEARCH_FAILURE
    lz = qnm.laplace_evidence(res, obj=lambda x: -jnp.sum(x * x))
    assert np.isnan(float(lz))


def test_duck_typed_logdensity_object():
    """Regression: objects with a .logdensity method (accepted by every
    other entry point via as_logdensity) must work in the exact-Hessian
    path too — and the constant is full f64 (the old module-level jnp op
    truncated log 2pi to f32 when x64 was enabled post-import)."""
    class Duck:
        def logdensity(self, x):
            return -0.5 * jnp.sum(x * x)

    duck = Duck()
    res = qnm.optimize(duck, jnp.ones(3))
    lz = qnm.laplace_evidence(res, obj=duck)
    np.testing.assert_allclose(
        float(lz), 1.5 * np.log(2 * np.pi), rtol=1e-12
    )
