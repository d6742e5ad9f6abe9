"""Cross-sampler fuzz: random SPD Gaussian targets with known moments
through all three samplers — the sampler analog of the engine fuzz.

Every sampler must agree with the analytic mean/covariance on targets it
has never been tuned for (random rotation, random spectrum, random
shift), within Monte-Carlo error bars. This is the property that catches
detailed-balance bugs that fixed fixtures can miss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm


def _random_gaussian(seed, n, cond=10.0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    evals = np.exp(np.linspace(0.0, np.log(cond), n))
    cov = (q * evals) @ q.T
    mu = rng.standard_normal(n)
    prec = np.linalg.inv(cov)
    prec_j, mu_j = jnp.asarray(prec), jnp.asarray(mu)

    def logdensity(x):
        d = x - mu_j
        return -0.5 * d @ (prec_j @ d)

    return logdensity, mu, cov


@pytest.mark.parametrize("seed", [3, 17])
@pytest.mark.parametrize("sampler", ["chees", "hmc", "nuts", "pt"])
def test_samplers_agree_with_analytic_moments(sampler, seed):
    n, chains = 3, 64
    logdensity, mu, cov = _random_gaussian(seed, n)
    kw = {
        "hmc": dict(n_leapfrog=12, mass=jnp.asarray(cov)),
        # replica exchange on a unimodal target: pure invariance check
        "pt": dict(n_leapfrog=12, mass=jnp.asarray(cov), n_temps=3,
                   beta_min=0.2),
    }.get(sampler, {})
    fn = {"chees": qnm.chees_sample, "hmc": qnm.hmc_sample,
          "nuts": qnm.nuts_sample, "pt": qnm.pt_sample}[sampler]
    res = fn(
        logdensity, jax.random.PRNGKey(seed),
        jnp.tile(jnp.asarray(mu), (chains, 1)),
        n_samples=600, n_warmup=400, **kw,
    )
    draws = np.asarray(res.samples).reshape(-1, n)
    scale = np.sqrt(np.diagonal(cov))
    np.testing.assert_allclose(
        draws.mean(axis=0), mu, atol=0.25 * scale.max()
    )
    np.testing.assert_allclose(
        np.cov(draws.T), cov, atol=0.4 * np.abs(cov).max()
    )
    d = qnm.diagnose_chains(res.samples)
    assert np.all(d.rhat < 1.15)
