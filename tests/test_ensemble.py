"""Affine-invariant ensemble sampler: moments, gradient-freeness,
resume/checkpoint contracts, pipeline + mesh integration.

The stretch move is the library's gradient-free sampler (ensemble.py);
the correctness bar is moment recovery on a known Gaussian (the sampler
fuzz standard) plus a genuinely non-differentiable target no other
sampler here can touch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.ensemble import (
    ensemble_sample,
    ensemble_sample_from_state,
)


def _corr_gaussian():
    L = np.array([[1.0, 0, 0], [0.6, 0.8, 0], [-0.3, 0.4, 1.2]])
    cov = L @ L.T
    P = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -2.0, 0.5])

    def logd(x):
        d = x - mu
        return -0.5 * d @ (P @ d)

    return logd, np.asarray(mu), cov


@pytest.mark.parametrize("partner", ["gather", "shift"])
def test_ensemble_recovers_gaussian_moments(partner):
    logd, mu, cov = _corr_gaussian()
    x0s = jnp.asarray(np.random.default_rng(0).standard_normal((64, 3)))
    r = ensemble_sample(
        logd, jax.random.PRNGKey(0), x0s, n_samples=3000, n_warmup=500,
        partner=partner,
    )
    draws = np.asarray(r.samples).reshape(-1, 3)
    np.testing.assert_allclose(draws.mean(0), mu, atol=0.08)
    np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.12)
    # the stretch move at a=2 on a well-conditioned target sits in the
    # healthy acceptance band
    assert 0.2 < float(r.accept_rate.mean()) < 0.9


def test_ensemble_is_gradient_free():
    # |x|-kinked target: jax.grad is undefined/useless at the mode and
    # every other sampler in the library would need it — the stretch
    # move only evaluates values
    mu = jnp.asarray([1.0, -2.0, 0.5])

    def laplace_logd(x):
        return -jnp.sum(jnp.abs(x - mu))

    x0s = jnp.asarray(np.random.default_rng(1).standard_normal((64, 3)))
    r = ensemble_sample(
        laplace_logd, jax.random.PRNGKey(1), x0s, n_samples=4000,
        n_warmup=500,
    )
    draws = np.asarray(r.samples).reshape(-1, 3)
    np.testing.assert_allclose(draws.mean(0), np.asarray(mu), atol=0.1)
    # Laplace(b=1) marginal variance = 2
    np.testing.assert_allclose(draws.var(0), 2.0, atol=0.4)


def test_ensemble_resume_bitwise():
    logd, _, _ = _corr_gaussian()
    x0s = jnp.asarray(np.random.default_rng(2).standard_normal((16, 3)))
    key = jax.random.PRNGKey(2)
    long = ensemble_sample(logd, key, x0s, n_samples=100, n_warmup=50)
    # chunk at the sampling phase
    a = ensemble_sample(logd, key, x0s, n_samples=40, n_warmup=50)
    b = ensemble_sample_from_state(logd, a.state, n_samples=60)
    np.testing.assert_array_equal(
        np.asarray(long.samples[40:]), np.asarray(b.samples)
    )
    np.testing.assert_array_equal(
        np.asarray(long.final_x), np.asarray(b.final_x)
    )
    # chunk INSIDE warmup (the phase-transition regression: a run ending
    # with n_samples=0 must stay in the warmup phase)
    c = ensemble_sample(logd, key, x0s, n_samples=0, n_warmup=20)
    assert int(c.state.phase) == 0
    d = ensemble_sample_from_state(logd, c.state, n_samples=100, n_warmup=30)
    np.testing.assert_array_equal(
        np.asarray(long.samples), np.asarray(d.samples)
    )


def test_ensemble_checkpoint_roundtrip(tmp_path):
    from quasinewtonmethods_jl_tpu.utils.checkpoint import (
        load_state,
        save_state,
    )

    logd, _, _ = _corr_gaussian()
    x0s = jnp.asarray(np.random.default_rng(3).standard_normal((8, 3)))
    a = ensemble_sample(logd, jax.random.PRNGKey(3), x0s, n_samples=10,
                        n_warmup=10)
    p = str(tmp_path / "ens")
    save_state(p, a.state)
    loaded = load_state(p)
    assert type(loaded).__name__ == "EnsembleState"
    b = ensemble_sample_from_state(logd, loaded, n_samples=20)
    c = ensemble_sample_from_state(logd, a.state, n_samples=20)
    np.testing.assert_array_equal(np.asarray(b.samples), np.asarray(c.samples))


def test_ensemble_f32_under_x64():
    # the round-2 sampler bug class: f32 ensembles must stay f32
    logd, _, _ = _corr_gaussian()
    x0s = jnp.asarray(
        np.random.default_rng(4).standard_normal((16, 3)), jnp.float32
    )
    r = ensemble_sample(
        lambda x: logd(x.astype(jnp.float32)),
        jax.random.PRNGKey(4), x0s, n_samples=20, n_warmup=10,
    )
    assert r.samples.dtype == jnp.float32
    assert r.final_x.dtype == jnp.float32
    assert r.accept_rate.dtype == jnp.float32


def test_ensemble_validation():
    logd, _, _ = _corr_gaussian()
    key = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="walkers"):
        ensemble_sample(logd, key, jnp.zeros(3))
    with pytest.raises(ValueError, match="even"):
        ensemble_sample(logd, key, jnp.zeros((5, 3)))
    with pytest.raises(ValueError, match="stretch scale"):
        ensemble_sample(logd, key, jnp.zeros((8, 3)), a=1.0)
    with pytest.raises(ValueError, match="partner"):
        ensemble_sample(logd, key, jnp.zeros((8, 3)), partner="roulette")
    with pytest.raises(ValueError, match="mass"):
        ensemble_sample(logd, key, jnp.zeros((8, 3)), mass=jnp.ones(3))


def test_ensemble_outside_support_recovers():
    # walkers STARTING at logdensity = -inf must be able to move into
    # the support (the emcee convention; -inf - -inf handled in-band)
    def logd(x):
        r2 = jnp.sum(x * x)
        return jnp.where(r2 < 4.0, -0.5 * r2, -jnp.inf)

    # half the walkers just outside the r=2 ball: a stretch toward an
    # inside partner (z < 2/|x0| happens with probability ~0.15 per try)
    # can land inside. NOTE walkers FAR outside cannot recover — the
    # stretch move only proposes at z in [1/a, a] along the partner line
    # (a property of the algorithm, not this implementation).
    x0s = jnp.concatenate(
        [jnp.full((8, 2), 2.2), jnp.zeros((8, 2))]
    )
    r = ensemble_sample(logd, jax.random.PRNGKey(5), x0s, n_samples=500,
                        n_warmup=300)
    draws = np.asarray(r.samples).reshape(-1, 2)
    assert np.all(np.isfinite(draws[-1000:]))
    assert np.all(np.sum(draws[-1000:] ** 2, axis=1) < 4.0)


def test_pipeline_ensemble_sampler():
    # sampler='ensemble' through map_then_sample: MAP-initialized
    # walker ball, no mass handoff (affine invariance IS the metric)
    logd, mu, cov = _corr_gaussian()
    out = qnm.map_then_sample(
        logd, jax.random.PRNGKey(6), jnp.zeros(3), n_chains=64,
        sampler="ensemble", n_samples=2500, n_warmup=400, jitter=0.3,
    )
    np.testing.assert_allclose(np.asarray(out.x_map), mu, atol=1e-6)
    draws = np.asarray(out.samples).reshape(-1, 3)
    np.testing.assert_allclose(draws.mean(0), mu, atol=0.1)
    np.testing.assert_allclose(np.cov(draws.T), cov,
                               atol=0.3 * np.abs(cov).max())
    # the lowrank mass handoff cannot apply to an affine-invariant move
    with pytest.raises(ValueError, match="mass"):
        qnm.map_then_sample(
            logd, jax.random.PRNGKey(0), jnp.zeros(3), n_chains=8,
            sampler="ensemble", n_samples=8, n_warmup=4,
            map_engine="lbfgs", mass_form="lowrank",
        )


def test_ensemble_sharded_matches_unsharded():
    # walkers shard over the mesh; partner='shift' is a collective
    # permute under GSPMD (no gather). Parity must be bitwise: the key
    # stream is position-independent.
    from quasinewtonmethods_jl_tpu.parallel import make_mesh, sample_sharded

    logd, _, _ = _corr_gaussian()
    x0s = jnp.asarray(np.random.default_rng(7).standard_normal((16, 3)))
    key = jax.random.PRNGKey(7)
    mesh = make_mesh({"data": 8})
    r_sh = sample_sharded(
        logd, key, x0s, mesh, sampler="ensemble", n_samples=50,
        n_warmup=20, partner="shift",
    )
    r_un = ensemble_sample(logd, key, x0s, n_samples=50, n_warmup=20,
                           partner="shift")
    np.testing.assert_array_equal(
        np.asarray(r_sh.samples), np.asarray(r_un.samples)
    )


def test_ensemble_autocorr_time():
    from quasinewtonmethods_jl_tpu.ensemble import ensemble_autocorr_time

    # iid pseudo-draws: tau == 1, reliable
    iid = np.random.default_rng(8).standard_normal((2000, 32, 3))
    tau, rel = ensemble_autocorr_time(iid)
    np.testing.assert_allclose(tau, 1.0, atol=0.3)
    assert rel.all()

    # a real stretch-move run mixes slower than iid: tau >> 1, and the
    # run is long enough for the estimate to be reliable
    logd, _, _ = _corr_gaussian()
    x0s = jnp.asarray(np.random.default_rng(9).standard_normal((64, 3)))
    r = ensemble_sample(logd, jax.random.PRNGKey(10), x0s,
                        n_samples=4000, n_warmup=500)
    tau, rel = ensemble_autocorr_time(r.samples)
    assert np.all(tau > 5.0)
    assert rel.all()
    # too-short run: the reliability flag must refuse
    tau_s, rel_s = ensemble_autocorr_time(np.asarray(r.samples)[:100])
    assert not rel_s.all()
    with pytest.raises(ValueError, match="draws"):
        ensemble_autocorr_time(np.zeros((4, 8, 2)))
