"""Replica-exchange (parallel tempering) sampler: multimodal recovery,
invariant-distribution checks, ladder diagnostics, resume/checkpoint.

The headline test is the one the single-temperature samplers CANNOT pass:
a well-separated two-mode Gaussian mixture with unequal weights, every
chain started in ONE basin — plain HMC stays there forever; `pt_sample`
must recover both modes' masses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import GaussianMixture


def _std_normal(x):
    return -0.5 * jnp.sum(x * x)


def test_geometric_ladder():
    b = np.asarray(qnm.geometric_ladder(6, 0.05))
    assert b.shape == (6,)
    assert b[0] == 1.0
    np.testing.assert_allclose(b[-1], 0.05, rtol=1e-6)
    assert np.all(np.diff(b) < 0)
    assert np.asarray(qnm.geometric_ladder(1)).tolist() == [1.0]
    with pytest.raises(ValueError):
        qnm.geometric_ladder(4, beta_min=1.5)
    with pytest.raises(ValueError):
        qnm.geometric_ladder(0)


def test_pt_standard_normal_moments():
    n, chains = 4, 32
    res = qnm.pt_sample(
        _std_normal, jax.random.PRNGKey(0), jnp.zeros((chains, n)),
        n_temps=4, beta_min=0.2, n_samples=600, n_warmup=300, n_leapfrog=8,
    )
    assert res.samples.shape == (600, chains, n)
    draws = np.asarray(res.samples).reshape(-1, n)
    np.testing.assert_allclose(draws.mean(axis=0), 0.0, atol=0.1)
    np.testing.assert_allclose(draws.var(axis=0), 1.0, atol=0.15)
    # per-temperature adaptation worked on every rung
    acc = np.asarray(res.accept_rate)
    assert acc.shape == (4,)
    assert np.all(acc > 0.5)
    # hot rungs take bigger steps than the cold one
    eps = np.asarray(res.step_size)
    assert eps.shape == (4,)
    assert eps[-1] > eps[0]
    # geometric ladder on a Gaussian: healthy swap rates on every pair
    swap = np.asarray(res.swap_rate)
    assert swap.shape == (3,)
    assert np.all(swap > 0.2) and np.all(swap <= 1.0)
    # and replicas actually TRAVERSE the ladder (hot->cold transits):
    # 900 sweeps at these rates should complete many round trips
    assert res.round_trips.shape == (chains,)
    assert int(np.sum(np.asarray(res.round_trips))) > chains


def test_pt_recovers_bimodal_mode_weights():
    """The multimodal headline: modes at ±4 (8σ apart), weights 0.75/0.25,
    all chains started in the HEAVY mode. Plain HMC never crosses; the
    tempered ladder must put ~25% of cold draws in the light mode."""
    mix = GaussianMixture(
        means=[[4.0, 4.0], [-4.0, -4.0]], weights=[0.75, 0.25], sigmas=1.0
    )
    chains = 64
    x0s = jnp.asarray(mix.means)[0][None, :] + 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (chains, 2)
    )

    hmc = qnm.hmc_sample(
        mix.logdensity, jax.random.PRNGKey(2), x0s,
        n_samples=300, n_warmup=200, n_leapfrog=8,
    )
    w_hmc = np.asarray(mix.mode_weights(hmc.samples))
    assert w_hmc[1] < 0.02  # stuck: essentially no mass in the far mode

    pt = qnm.pt_sample(
        mix.logdensity, jax.random.PRNGKey(2), x0s,
        n_temps=6, beta_min=0.05,
        n_samples=400, n_warmup=300, n_leapfrog=8,
    )
    w_pt = np.asarray(mix.mode_weights(pt.samples))
    np.testing.assert_allclose(w_pt, [0.75, 0.25], atol=0.12)
    # and the cold-row mean honors the mixture mean, not one basin's
    mix_mean = np.asarray(mix.mean())
    cold_mean = np.asarray(pt.samples).reshape(-1, 2).mean(axis=0)
    np.testing.assert_allclose(cold_mean, mix_mean, atol=0.8)


def test_pt_single_temperature_is_plain_hmc_shape():
    res = qnm.pt_sample(
        _std_normal, jax.random.PRNGKey(3), jnp.zeros((8, 3)),
        n_temps=1, n_samples=50, n_warmup=50, n_leapfrog=4,
    )
    assert res.samples.shape == (50, 8, 3)
    assert res.swap_rate.shape == (0,)
    assert res.state.x.shape == (1, 8, 3)


def test_pt_per_temperature_starts():
    K, C, n = 3, 8, 2
    x0s = jax.random.normal(jax.random.PRNGKey(4), (K, C, n))
    res = qnm.pt_sample(
        _std_normal, jax.random.PRNGKey(5), x0s,
        n_temps=K, n_samples=20, n_warmup=20, n_leapfrog=4,
    )
    assert res.samples.shape == (20, C, n)


def test_pt_resume_identity():
    """Chunked warmup + chunked sampling replay one long run exactly."""
    kw = dict(n_leapfrog=4, swap_every=2, target_accept=0.8)
    key = jax.random.PRNGKey(6)
    x0s = jax.random.normal(jax.random.PRNGKey(7), (16, 3))

    long = qnm.pt_sample(
        _std_normal, key, x0s, n_temps=3, beta_min=0.2,
        n_samples=60, n_warmup=50, **kw,
    )

    a = qnm.pt_sample(
        _std_normal, key, x0s, n_temps=3, beta_min=0.2,
        n_samples=0, n_warmup=20, **kw,
    )
    b = qnm.pt_sample_from_state(
        _std_normal, a.state, n_samples=25, n_warmup=30, **kw,
    )
    c = qnm.pt_sample_from_state(
        _std_normal, b.state, n_samples=35, **kw,
    )
    chunked = np.concatenate(
        [np.asarray(b.samples), np.asarray(c.samples)], axis=0
    )
    np.testing.assert_array_equal(chunked, np.asarray(long.samples))
    np.testing.assert_array_equal(
        np.asarray(c.state.x), np.asarray(long.state.x)
    )
    np.testing.assert_array_equal(
        np.asarray(c.state.swap_acc), np.asarray(long.state.swap_acc)
    )
    np.testing.assert_array_equal(
        np.asarray(c.round_trips), np.asarray(long.round_trips)
    )


def test_pt_checkpoint_roundtrip(tmp_path):
    from quasinewtonmethods_jl_tpu.utils.checkpoint import load_state, save_state

    key = jax.random.PRNGKey(8)
    x0s = jax.random.normal(jax.random.PRNGKey(9), (8, 2))
    a = qnm.pt_sample(
        _std_normal, key, x0s, n_temps=3, n_samples=10, n_warmup=20,
        n_leapfrog=4,
    )
    p = tmp_path / "pt_state"
    save_state(p, a.state)
    restored = load_state(p, qnm.PTState)
    b_direct = qnm.pt_sample_from_state(
        _std_normal, a.state, n_samples=15, n_leapfrog=4
    )
    b_loaded = qnm.pt_sample_from_state(
        _std_normal, restored, n_samples=15, n_leapfrog=4
    )
    np.testing.assert_array_equal(
        np.asarray(b_loaded.samples), np.asarray(b_direct.samples)
    )


def test_pt_error_paths():
    x0s = jnp.zeros((4, 2))
    with pytest.raises(ValueError, match="cold chain"):
        qnm.pt_sample(
            _std_normal, jax.random.PRNGKey(0), x0s,
            betas=jnp.asarray([0.9, 0.5]), n_samples=1, n_warmup=1,
        )
    with pytest.raises(ValueError, match="1-D ladder"):
        qnm.pt_sample(
            _std_normal, jax.random.PRNGKey(0), x0s,
            betas=jnp.ones((2, 2)), n_samples=1, n_warmup=1,
        )
    with pytest.raises(ValueError, match="x0s must be"):
        qnm.pt_sample(
            _std_normal, jax.random.PRNGKey(0), jnp.zeros((3, 4, 2)),
            n_temps=2, n_samples=1, n_warmup=1,
        )
    res = qnm.pt_sample(
        _std_normal, jax.random.PRNGKey(0), x0s, n_temps=2,
        n_samples=5, n_warmup=5, n_leapfrog=2,
    )
    with pytest.raises(ValueError, match="warmup after sampling"):
        qnm.pt_sample_from_state(_std_normal, res.state, n_warmup=5)


def test_pt_mass_forms():
    """Every metric form the other samplers accept works here too."""
    n, chains = 3, 8
    x0s = jnp.zeros((chains, n))
    key = jax.random.PRNGKey(10)
    dense = jnp.eye(n) + 0.1
    for mass in (None, jnp.ones(n) * 2.0, dense):
        res = qnm.pt_sample(
            _std_normal, key, x0s, mass=mass, n_temps=2,
            n_samples=10, n_warmup=10, n_leapfrog=4,
        )
        assert bool(jnp.all(jnp.isfinite(res.samples)))


def test_gaussian_mixture_fixture():
    mix = GaussianMixture(
        means=[[2.0, 0.0], [-2.0, 0.0]], weights=[0.5, 0.5], sigmas=0.5
    )
    # symmetric mixture: mean 0; known covariance
    np.testing.assert_allclose(np.asarray(mix.mean()), 0.0, atol=1e-12)
    cov = np.asarray(mix.cov())
    np.testing.assert_allclose(cov[0, 0], 0.25 + 4.0, rtol=1e-6)
    np.testing.assert_allclose(cov[1, 1], 0.25, rtol=1e-6)
    # logdensity: at a mode, ≈ log w − n log σ (other mode negligible)
    ld = float(mix.logdensity(jnp.asarray([2.0, 0.0])))
    expect = np.log(0.5) - 2 * np.log(0.5)
    np.testing.assert_allclose(ld, expect, atol=1e-6)
    w = np.asarray(
        mix.mode_weights(jnp.asarray([[2.1, 0.0], [-1.9, 0.1], [2.0, 0.2]]))
    )
    np.testing.assert_allclose(w, [2 / 3, 1 / 3], atol=1e-12)


def test_map_then_sample_pt():
    """The one-call pipeline with the replica-exchange sampler: the MAP
    fleet's curvature becomes the ladder's shared mass."""
    def logdensity(x):
        return -0.5 * jnp.sum(x * x * jnp.asarray([1.0, 4.0, 0.25]))

    out = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(11), jnp.ones(3) * 2.0,
        n_chains=16, sampler="pt", n_samples=200, n_warmup=150,
        n_temps=3, beta_min=0.2, n_leapfrog=8,
    )
    assert out.samples.shape == (200, 16, 3)
    assert np.nanmax(np.asarray(out.diagnostics.rhat)) < 1.1
    draws = np.asarray(out.samples).reshape(-1, 3)
    np.testing.assert_allclose(
        draws.var(axis=0), [1.0, 0.25, 4.0], rtol=0.3
    )
    assert np.asarray(out.sampler_result.swap_rate).shape == (2,)


def test_sample_sharded_pt():
    """Chains sharded over the virtual mesh. Like ChEES, PT's warmup has
    cross-chain reductions (per-temperature fleet-mean acceptance), so
    sharding changes summation order and the adaptation feedback
    amplifies the fp drift — the contract is distribution-level, not
    draw-parity (same policy as the sharded-ChEES test)."""
    from quasinewtonmethods_jl_tpu import parallel

    def logdensity(x):
        return -0.5 * jnp.sum(x * x)

    chains, n = 64, 3
    key = jax.random.PRNGKey(12)
    x0s = jax.random.normal(jax.random.PRNGKey(13), (chains, n))
    mesh = parallel.make_mesh({"data": 8})
    res = parallel.sample_sharded(
        logdensity, key, x0s, mesh, sampler="pt",
        n_temps=3, beta_min=0.2, n_samples=300, n_warmup=200,
        n_leapfrog=8,
    )
    assert res.samples.shape == (300, chains, n)
    draws = np.asarray(res.samples).reshape(-1, n)
    np.testing.assert_allclose(draws.mean(axis=0), 0.0, atol=0.12)
    np.testing.assert_allclose(draws.var(axis=0), 1.0, atol=0.2)
    assert np.all(np.asarray(res.swap_rate) > 0.2)


def test_pt_adapt_ladder_repairs_a_gapped_ladder():
    """A deliberately bad ladder (rungs clustered near beta=1, one huge
    gap to the bottom): the gap pair's swap acceptance is ~0, so the
    cold row is effectively cut off from the hot end. adapt_ladder=True
    must redistribute the log-spacings (endpoints pinned) until every
    pair conducts."""
    bad = jnp.asarray([1.0, 0.95, 0.9, 0.85, 0.05])
    kw = dict(betas=bad, n_samples=150, n_warmup=300, n_leapfrog=4)
    x0s = jax.random.normal(jax.random.PRNGKey(20), (32, 4))

    off = qnm.pt_sample(_std_normal, jax.random.PRNGKey(21), x0s,
                        adapt_ladder=False, **kw)
    on = qnm.pt_sample(_std_normal, jax.random.PRNGKey(21), x0s,
                       adapt_ladder=True, **kw)
    # the fixed bad ladder's gap pair barely conducts
    assert float(np.min(np.asarray(off.swap_rate))) < 0.05
    # the adapted ladder conducts on every pair (EMA = steady-state rate)
    assert float(np.min(np.asarray(on.state.swap_ema))) > 0.15
    b = np.asarray(on.betas)
    assert b[0] == 1.0
    np.testing.assert_allclose(b[-1], 0.05, rtol=1e-4)  # endpoints pinned
    assert np.all(np.diff(b) < 0)  # still a monotone ladder
    # and the gap actually closed: largest log-spacing shrank
    s0 = np.diff(np.log(np.asarray(bad)))
    s1 = np.diff(np.log(b))
    assert np.max(-s1) < 0.6 * np.max(-s0)


def test_pt_adapt_ladder_resume_identity():
    kw = dict(n_leapfrog=4, adapt_ladder=True)
    key = jax.random.PRNGKey(22)
    x0s = jax.random.normal(jax.random.PRNGKey(23), (16, 3))
    long = qnm.pt_sample(_std_normal, key, x0s, n_temps=4, beta_min=0.1,
                         n_samples=40, n_warmup=60, **kw)
    a = qnm.pt_sample(_std_normal, key, x0s, n_temps=4, beta_min=0.1,
                      n_samples=0, n_warmup=25, **kw)
    b = qnm.pt_sample_from_state(_std_normal, a.state, n_samples=40,
                                 n_warmup=35, **kw)
    np.testing.assert_array_equal(
        np.asarray(b.samples), np.asarray(long.samples)
    )
    np.testing.assert_array_equal(
        np.asarray(b.betas), np.asarray(long.betas)
    )


def test_map_then_sample_pt_with_transform():
    """Pipeline composition: constrained target (positive scale) sampled
    by replica exchange in z-space, reported on the constrained scale."""
    from quasinewtonmethods_jl_tpu import transforms

    def logdensity(x):  # Gamma(3, 2) on x > 0 (unnormalized)
        return 2.0 * jnp.log(x[0]) - 2.0 * x[0]

    tr = transforms.Positive(1)
    out = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(30), jnp.ones(1),
        n_chains=16, sampler="pt", transform=tr,
        n_samples=300, n_warmup=200, n_temps=3, beta_min=0.2,
        n_leapfrog=8,
    )
    draws = np.asarray(out.samples_constrained).reshape(-1)
    assert np.all(draws > 0)
    # Gamma(3, 2): mean 1.5, var 0.75
    np.testing.assert_allclose(draws.mean(), 1.5, atol=0.25)
    np.testing.assert_allclose(draws.var(), 0.75, atol=0.35)


def test_pt_adapt_mass_scale_heterogeneous():
    """Per-rung diagonal metric on a 10^4 scale spread. With a ladder,
    even identity mass lands (swap teleportation rescues wide-dim
    mixing — measured, so no identity-fails assertion at K > 1); the
    direct metric contrast runs at K = 1 where there is nothing to
    rescue: unit-mass HMC's step is pinned by the stiffest dimension
    and badly under-samples the widest one at this budget."""
    scales2 = jnp.geomspace(0.01, 100.0, 6)  # variances 1e-2 .. 1e2

    def ld(x):
        return -0.5 * jnp.sum(x * x / scales2)

    chains = 64
    x0s = jnp.zeros((chains, 6))
    truth = np.asarray(scales2)

    adapt = qnm.pt_sample(ld, jax.random.PRNGKey(24), x0s,
                          n_temps=4, beta_min=0.2, n_samples=400,
                          n_warmup=400, n_leapfrog=8, adapt_mass=True)
    v_a = np.asarray(adapt.samples).reshape(-1, 6).var(axis=0)
    # adapted: every dimension's variance lands (generous MC bars)
    np.testing.assert_allclose(v_a, truth, rtol=0.4)
    # and the metric itself learned the spread (cold rung)
    m = np.asarray(adapt.state.var_ema)[0]
    assert m[-1] / m[0] > 100.0

    # K=1 contrast: no swaps to rescue the identity metric. Raw moments
    # are too noisy to separate the two (measured: identity lands within
    # ~10% anyway); MIXING is the difference, so the bar is ESS — the
    # probe measured identity wide-dim ESS 89 vs adapted 11,402 (128x).
    k1 = dict(n_temps=1, n_samples=300, n_warmup=300, n_leapfrog=8)
    ident1 = qnm.pt_sample(ld, jax.random.PRNGKey(26), x0s, **k1)
    adapt1 = qnm.pt_sample(ld, jax.random.PRNGKey(26), x0s,
                           adapt_mass=True, **k1)
    ess_i = np.asarray(qnm.ess(np.asarray(ident1.samples)))
    ess_a = np.asarray(qnm.ess(np.asarray(adapt1.samples)))
    assert ess_a[-1] > 10.0 * ess_i[-1]  # wide dim: order-of-magnitude
    assert np.min(ess_a) > 10.0 * np.min(ess_i)


def test_pt_adapt_mass_resume_and_validation():
    def ld(x):
        return -0.5 * jnp.sum(x * x * jnp.asarray([1.0, 9.0]))

    x0s = jnp.zeros((16, 2))
    kw = dict(n_leapfrog=4, adapt_mass=True)
    long = qnm.pt_sample(ld, jax.random.PRNGKey(25), x0s, n_temps=3,
                         beta_min=0.2, n_samples=30, n_warmup=40, **kw)
    a = qnm.pt_sample(ld, jax.random.PRNGKey(25), x0s, n_temps=3,
                      beta_min=0.2, n_samples=0, n_warmup=15, **kw)
    b = qnm.pt_sample_from_state(ld, a.state, n_samples=30, n_warmup=25,
                                 **kw)
    np.testing.assert_array_equal(
        np.asarray(b.samples), np.asarray(long.samples)
    )
    np.testing.assert_array_equal(
        np.asarray(b.state.var_ema), np.asarray(long.state.var_ema)
    )
    with pytest.raises(ValueError, match="adapt_mass"):
        qnm.pt_sample(ld, jax.random.PRNGKey(0), x0s, adapt_mass=True,
                      mass=jnp.ones(2))
    with pytest.raises(ValueError, match="adapt_mass"):
        qnm.pt_sample_from_state(ld, a.state, n_samples=1,
                                 adapt_mass=True, mass=jnp.ones(2))


def test_pt_f32_under_x64():
    """The round-2 ChEES bug class: f32 fleets must run under the x64
    test config without carry-dtype mismatches, with all adaptation on."""
    x0s = jnp.zeros((8, 3), jnp.float32)
    res = qnm.pt_sample(
        _std_normal, jax.random.PRNGKey(0), x0s, n_temps=3,
        n_samples=5, n_warmup=5, n_leapfrog=2,
        adapt_mass=True, adapt_ladder=True,
    )
    assert res.samples.dtype == jnp.float32
    assert res.state.var_ema.dtype == jnp.float32


def test_pt_cold_chain_energy_panel():
    """PT carries the family's energy observability on its COLD row (the
    chain whose draws are the samples): finite Hamiltonians, healthy
    E-BFMI on an easy Gaussian, zero divergences, and the chunked-resume
    identity extends to the energies."""
    def logd(x):
        return -0.5 * jnp.sum(x * x)

    key = jax.random.PRNGKey(21)
    x0 = jax.random.normal(key, (16, 3))
    r = qnm.pt_sample(logd, key, x0, n_temps=4, n_samples=200,
                      n_warmup=150)
    e = np.asarray(r.energies)
    d = np.asarray(r.divergences)
    assert e.shape == (200, 16) and np.isfinite(e).all()
    assert d.shape == (16,) and d.sum() == 0
    assert np.all(qnm.energy_bfmi(e) > 0.3)
    r1 = qnm.pt_sample(logd, key, x0, n_temps=4, n_samples=80,
                       n_warmup=150)
    r2 = qnm.pt_sample_from_state(logd, r1.state, n_samples=120)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(r1.energies), np.asarray(r2.energies)]),
        e,
    )
