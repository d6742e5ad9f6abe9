"""MCMC diagnostics: split R-hat and ESS against known chain behaviors.

Calibration fixtures with analytically known answers: iid chains (R-hat ~ 1,
ESS ~ total draws), AR(1) chains (ESS ratio = (1-phi)/(1+phi)), and
disjoint chains (R-hat >> 1) — plus the wiring from the samplers' output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.diagnostics import (
    diagnose_chains,
    ess,
    split_rhat,
)


def test_iid_chains_are_clean():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1000, 8, 3))
    r = split_rhat(x)
    np.testing.assert_allclose(r, 1.0, atol=0.01)
    e = ess(x)
    # iid: ESS ~ draws * chains = 8000 (estimator noise ~ +-20%)
    assert np.all(e > 5500) and np.all(e < 10500)


@pytest.mark.parametrize("phi", [0.5, 0.9])
def test_ar1_ess_matches_theory(phi):
    """AR(1) with coefficient phi has integrated autocorrelation time
    (1+phi)/(1-phi); ESS/total must land near (1-phi)/(1+phi)."""
    rng = np.random.default_rng(1)
    draws, chains = 4000, 8
    x = np.zeros((draws, chains, 1))
    innov = rng.standard_normal((draws, chains, 1))
    for t in range(1, draws):
        x[t] = phi * x[t - 1] + np.sqrt(1 - phi**2) * innov[t]
    ratio = float(ess(x)[0]) / (draws * chains)
    want = (1 - phi) / (1 + phi)
    assert want * 0.6 < ratio < want * 1.6, (ratio, want)


def test_disjoint_chains_flag_rhat():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((500, 4, 2)) * 0.1
    x[:, :2, 0] += 3.0  # two chains stuck in another mode of dim 0
    r = split_rhat(x)
    assert r[0] > 2.0  # badly split dimension flagged
    assert abs(r[1] - 1.0) < 0.02  # healthy dimension clean


def test_drifting_chain_flagged_by_split():
    """A chain trending over time (not mixing) must be caught by the
    SPLIT construction even though full-chain means agree."""
    draws = 1000
    trend = np.linspace(-2, 2, draws)[:, None, None]
    rng = np.random.default_rng(3)
    x = rng.standard_normal((draws, 4, 1)) * 0.3 + trend
    assert float(split_rhat(x)[0]) > 1.5


def test_constant_dimension_is_defined():
    x = np.zeros((100, 4, 1))
    assert float(split_rhat(x)[0]) == 1.0
    assert np.isfinite(float(ess(x)[0]))


def test_diagnose_chains_on_sampler_output():
    """End-to-end: ChEES draws on a standard normal pass the published
    thresholds and recover the moments."""
    def logdensity(x):
        return -0.5 * jnp.sum(x * x)

    res = qnm.chees_sample(
        logdensity, jax.random.PRNGKey(0), jnp.zeros((32, 3)),
        n_samples=500, n_warmup=300,
    )
    d = diagnose_chains(res.samples)
    assert np.all(d.rhat < 1.05)
    assert np.all(d.ess > 300)
    np.testing.assert_allclose(d.mean, 0.0, atol=0.12)
    np.testing.assert_allclose(d.std, 1.0, atol=0.12)
