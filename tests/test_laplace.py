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


def test_lbfgs_without_obj_raises():
    res = qnm.optimize_lbfgs(lambda x: -jnp.sum(x * x), jnp.ones(4))
    with pytest.raises(ValueError, match="obj"):
        qnm.laplace_evidence(res)
    # but the exact path works for L-BFGS results
    lz = qnm.laplace_evidence(res, obj=lambda x: -jnp.sum(x * x))
    assert np.isfinite(float(lz))


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
