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
    diagnose_chains_device,
    ess,
    ess_device,
    split_rhat,
    split_rhat_device,
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


# ---- on-device implementation: parity with the host oracle (round 3) ----


def _fixtures():
    rng = np.random.default_rng(7)
    iid = rng.standard_normal((400, 8, 3))
    ar = np.zeros((600, 6, 2))
    innov = rng.standard_normal((600, 6, 2))
    for t in range(1, 600):
        ar[t] = 0.8 * ar[t - 1] + innov[t]
    disjoint = rng.standard_normal((300, 4, 2)) * 0.1
    disjoint[:, :2, 0] += 3.0
    drifting = rng.standard_normal((500, 4, 1)) * 0.3 + np.linspace(
        -2, 2, 500
    )[:, None, None]
    const = np.zeros((100, 4, 1))
    return {"iid": iid, "ar1": ar, "disjoint": disjoint,
            "drifting": drifting, "const": const}


@pytest.mark.parametrize("name", ["iid", "ar1", "disjoint", "drifting", "const"])
def test_device_diagnostics_match_host(name):
    """diagnose_chains_device is the same math as the numpy oracle —
    f64 parity to near machine eps on every calibration fixture."""
    x = _fixtures()[name]
    host = diagnose_chains(x)
    dev = jax.tree_util.tree_map(
        np.asarray, diagnose_chains_device(jnp.asarray(x))
    )
    np.testing.assert_allclose(dev.rhat, host.rhat, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(dev.ess, host.ess, rtol=1e-8)
    np.testing.assert_allclose(dev.mean, host.mean, rtol=0, atol=1e-12)
    np.testing.assert_allclose(dev.std, host.std, rtol=1e-12)


def test_device_diagnostics_f32_drift_bounded():
    """The f32 on-chip path must stay within diagnostic noise of the f64
    oracle (centering before the FFT removes the cancellation risk)."""
    x = _fixtures()["ar1"]
    host = diagnose_chains(x)
    dev = diagnose_chains_device(jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(np.asarray(dev.rhat), host.rhat, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dev.ess), host.ess, rtol=1e-3)


def test_device_diagnostics_shape_guards():
    with pytest.raises(ValueError, match="4 draws"):
        split_rhat_device(jnp.zeros((2, 4, 1)))
    with pytest.raises(ValueError, match="8 draws"):
        ess_device(jnp.zeros((6, 4, 1)))


def test_map_then_sample_default_diagnostics_are_device_arrays():
    """The pipeline default must keep diagnostics on device: the returned
    summaries are jax arrays (fetch is the caller's choice), and their
    values agree with the host oracle over the same draws."""
    def logdensity(x):
        return -0.5 * jnp.sum(x * x)

    out = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(3), jnp.zeros(2),
        n_chains=8, n_samples=64, n_warmup=64,
    )
    assert isinstance(out.diagnostics.rhat, jax.Array)
    host = diagnose_chains(out.samples)
    np.testing.assert_allclose(
        np.asarray(out.diagnostics.rhat), host.rhat, rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out.diagnostics.ess), host.ess, rtol=1e-6
    )


# ---- rank-normalized R-hat + tail ESS (Vehtari et al. 2021, round 4) ----

from quasinewtonmethods_jl_tpu.diagnostics import (  # noqa: E402
    rank_normalized_rhat,
    rank_normalized_rhat_device,
    tail_ess,
    tail_ess_device,
)


def test_rank_rhat_clean_on_iid_and_flags_variance_mismatch():
    """THE motivating fixture: chains share the mean but not the scale.
    Between-chain variance of MEANS is ~zero, so classic split R-hat
    passes; the FOLDED rank statistic must flag it."""
    rng = np.random.default_rng(11)
    iid = rng.standard_normal((1000, 8, 2))
    assert np.all(rank_normalized_rhat(iid) < 1.01)

    mism = rng.standard_normal((1000, 8, 1))
    mism[:, :4] *= 3.0  # half the chains at 3x the scale, same mean 0
    assert float(split_rhat(mism)[0]) < 1.01  # classic R-hat is blind
    assert float(rank_normalized_rhat(mism)[0]) > 1.05  # folded catches it


def test_rank_rhat_robust_to_heavy_tails():
    """Cauchy draws have no mean/variance — the moment-based R-hat is
    estimator noise there, while the rank statistic stays calibrated on
    healthy chains and still flags disjoint ones."""
    rng = np.random.default_rng(12)
    c = rng.standard_cauchy((2000, 8, 1))
    assert float(rank_normalized_rhat(c)[0]) < 1.01
    d = rng.standard_cauchy((500, 4, 1)) * 0.1
    d[:, :2] += 30.0
    assert float(rank_normalized_rhat(d)[0]) > 1.5


def test_tail_ess_flags_sticky_tails():
    """Bulk mixes every step, but tail excursions ride a phi=0.995 latent
    state, so quantile indicators have long runs: tail ESS must collapse
    relative to bulk ESS."""
    rng = np.random.default_rng(13)
    draws, chains = 4000, 4
    u = np.zeros((draws, chains))
    innov = rng.standard_normal((draws, chains))
    for t in range(1, draws):
        u[t] = 0.995 * u[t - 1] + np.sqrt(1 - 0.995**2) * innov[t]
    z = rng.standard_normal((draws, chains))
    x = (z * np.where(u > 1.28, 4.0, 1.0))[:, :, None]  # sticky tail bursts
    bulk = float(ess(x)[0])
    tail = float(tail_ess(x)[0])
    assert tail < 0.35 * bulk, (tail, bulk)

    # and on iid draws the tail indicators are iid too: no collapse
    iid = rng.standard_normal((1000, 8, 1))
    assert float(tail_ess(iid)[0]) > 0.4 * 8000


def test_rank_stats_constant_dimension_defined():
    x = np.zeros((100, 4, 1))
    assert float(rank_normalized_rhat(x)[0]) == 1.0
    assert np.isfinite(float(tail_ess(x)[0]))


def test_diagnose_chains_includes_rank_panel():
    rng = np.random.default_rng(14)
    x = rng.standard_normal((400, 8, 2))
    d = diagnose_chains(x)
    assert d.rhat_rank is not None and np.all(d.rhat_rank < 1.02)
    assert d.ess_tail is not None and np.all(d.ess_tail > 800)
    lean = diagnose_chains(x, rank=False)
    assert lean.rhat_rank is None and lean.ess_tail is None


@pytest.mark.parametrize("name", ["iid", "ar1", "disjoint", "drifting"])
def test_rank_stats_device_parity(name):
    """Device rank statistics are the same math as the host oracle (the
    pooled sort order is identical for continuous draws; jax's and
    scipy's ndtri differ by ~1e-7 relative, hence the tolerance)."""
    x = _fixtures()[name]
    np.testing.assert_allclose(
        np.asarray(rank_normalized_rhat_device(jnp.asarray(x))),
        rank_normalized_rhat(x), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tail_ess_device(jnp.asarray(x))),
        tail_ess(x), rtol=1e-8,
    )


def test_diagnose_chains_device_rank_opt_in():
    """Device default stays lean (no pooled sorts — the sharded
    pipeline's no-gather property); rank=True fills the panel."""
    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.standard_normal((256, 8, 2)))
    lean = diagnose_chains_device(x)
    assert lean.rhat_rank is None and lean.ess_tail is None
    full = diagnose_chains_device(x, rank=True)
    assert isinstance(full.rhat_rank, jax.Array)
    np.testing.assert_allclose(
        np.asarray(full.rhat_rank), rank_normalized_rhat(np.asarray(x)),
        rtol=1e-5,
    )


def test_energy_bfmi_white_noise_is_two():
    """iid Gaussian energies: Var(E_t - E_{t-1}) = 2 Var(E), so the
    ratio of sums converges to 2 — the ideally-mixing spectrum."""
    e = np.random.default_rng(3).standard_normal((5000, 8))
    bfmi = qnm.energy_bfmi(e)
    np.testing.assert_allclose(bfmi, 2.0, atol=0.15)
    # device twin: identical math
    np.testing.assert_allclose(
        np.asarray(qnm.energy_bfmi_device(jnp.asarray(e))), bfmi,
        rtol=1e-10,
    )


def test_energy_bfmi_random_walk_is_low():
    """A random walk in energy (the pathology E-BFMI exists to catch:
    momentum refreshment barely moves the energy level) scores far
    below the iid value and below Stan's 0.3 warning bar."""
    rng = np.random.default_rng(4)
    e = np.cumsum(rng.standard_normal((2000, 4)), axis=0)
    bfmi = qnm.energy_bfmi(e)
    assert np.all(bfmi < 0.3), bfmi


def test_energy_bfmi_shape_guard():
    with pytest.raises(ValueError, match="draws"):
        qnm.energy_bfmi(np.zeros((2, 3)))
    with pytest.raises(ValueError, match="draws"):
        qnm.energy_bfmi(np.zeros(7))


def test_posterior_summary_iid():
    rng = np.random.default_rng(12)
    mu = np.array([1.0, -2.0, 0.0])
    x = rng.standard_normal((500, 8, 3)) + mu
    s = qnm.posterior_summary(x)
    np.testing.assert_allclose(s.mean, mu, atol=0.1)
    np.testing.assert_allclose(s.sd, 1.0, atol=0.1)
    # iid: ess ~ N, mcse is sd/sqrt(ess) by construction
    assert np.all(s.ess_bulk > 2000)
    np.testing.assert_allclose(s.mcse, s.sd / np.sqrt(s.ess_bulk))
    np.testing.assert_allclose(s.q5, mu - 1.645, atol=0.15)
    np.testing.assert_allclose(s.median, mu, atol=0.1)
    np.testing.assert_allclose(s.q95, mu + 1.645, atol=0.15)
    assert np.all(s.rhat < 1.01)

    tbl = s.table(names=["alpha", "beta", "sigma"])
    lines = tbl.splitlines()
    assert len(lines) == 4
    assert "mcse" in lines[0] and "ess_tail" in lines[0]
    assert lines[1].startswith("alpha")
    with pytest.raises(ValueError, match="names"):
        s.table(names=["just-one"])
    with pytest.raises(ValueError, match="draws, chains, n"):
        qnm.posterior_summary(np.zeros((10, 3)))


def test_posterior_summary_on_sampler_draws():
    def logd(x):
        return -0.5 * jnp.sum(x * x)

    r = qnm.chees_sample(logd, jax.random.PRNGKey(3),
                         jnp.zeros((32, 3)), n_samples=500, n_warmup=300)
    s = qnm.posterior_summary(r.samples)
    np.testing.assert_allclose(s.mean, 0.0, atol=0.15)
    np.testing.assert_allclose(s.sd, 1.0, atol=0.2)
    assert np.all(s.rhat < 1.1)
    assert np.all(s.ess_tail > 100)
