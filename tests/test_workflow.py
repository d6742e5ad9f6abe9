"""One-call MAP-then-sample pipeline: end-to-end correctness + failure
handling over all three samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm


def _corr_gaussian(n):
    rng = np.random.default_rng(11)
    A = rng.standard_normal((n, n)) * 0.4
    cov = A @ A.T + np.eye(n)
    prec_j = jnp.asarray(np.linalg.inv(cov))

    def logdensity(x):
        return -0.5 * x @ (prec_j @ x)

    return logdensity, cov


@pytest.mark.parametrize("sampler", ["chees", "hmc", "nuts"])
def test_pipeline_recovers_gaussian(sampler):
    logdensity, cov = _corr_gaussian(3)
    out = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(0), jnp.full(3, 2.0),
        n_chains=32, sampler=sampler, n_samples=500, n_warmup=300,
        map_tol=1e-10,
    )
    # MAP stage: mode at 0, B ~ cov
    np.testing.assert_allclose(np.asarray(out.x_map), 0.0, atol=1e-8)
    assert np.all(
        np.asarray(out.map_result.status) == qnm.Status.CONVERGED
    )
    # sampling stage: covariance recovered, clean diagnostics
    draws = np.asarray(out.samples).reshape(-1, 3)
    np.testing.assert_allclose(
        np.cov(draws.T), cov, atol=0.35 * np.abs(cov).max()
    )
    assert np.all(out.diagnostics.rhat < 1.1)
    assert np.all(out.diagnostics.ess > 200)
    # the dense-B handoff reaches the hmc sampler
    if sampler == "hmc":
        np.testing.assert_allclose(
            np.asarray(out.mass), cov, atol=0.25 * np.abs(cov).max()
        )


def test_pipeline_explicit_starts_and_kwargs_passthrough():
    def logdensity(x):
        return -0.5 * jnp.sum(x * x)

    x0s = jnp.asarray(np.random.default_rng(1).standard_normal((8, 2)))
    out = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(1), x0s, sampler="nuts",
        n_samples=50, n_warmup=30, max_depth=5,  # sampler kwarg through
    )
    assert out.samples.shape == (50, 8, 2)
    assert float(out.sampler_result.mean_tree_depth.mean()) > 0


def test_pipeline_map_failure_is_loud():
    def nan_obj(x):
        return jnp.nan * jnp.sum(x)

    with pytest.raises(ValueError, match="NONFINITE_VALUE"):
        qnm.map_then_sample(
            nan_obj, jax.random.PRNGKey(2), jnp.zeros(3), n_chains=4,
            n_samples=5, n_warmup=5,
        )


def test_pipeline_rejects_bad_sampler_and_shape():
    f = lambda x: -jnp.sum(x * x)
    with pytest.raises(ValueError, match="sampler"):
        qnm.map_then_sample(f, jax.random.PRNGKey(0), jnp.zeros(2),
                            sampler="slice")
    with pytest.raises(ValueError, match="x0"):
        qnm.map_then_sample(f, jax.random.PRNGKey(0), jnp.zeros((2, 2, 2)))
