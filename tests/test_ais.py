"""AIS evidence: exactness on Gaussian targets, Laplace-error repair on
a multimodal target, weight diagnostics, base-extraction paths.

The contract: `ais_evidence` is unbiased in the weights, so with a sane
base + anneal its logZ must land within MC error of ANALYTIC evidence
values — including the multimodal case where `laplace_evidence` is
structurally biased (it integrates one basin)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import GaussianMixture

_LOG_2PI = math.log(2.0 * math.pi)


def _gaussian_target(a):
    """Unnormalized Gaussian -0.5 x' diag(a) x with analytic log Z."""
    a = jnp.asarray(a)

    def logdensity(x):
        return -0.5 * jnp.sum(a * x * x)

    n = a.shape[0]
    logz = 0.5 * n * _LOG_2PI - 0.5 * float(jnp.sum(jnp.log(a)))
    return logdensity, logz


def test_ais_exact_base_is_exact():
    """With the EXACT base q0 = N(0, A^-1), logp - logq0 is the constant
    log Z — every particle's weight equals it, variance is zero, and the
    estimate is exact regardless of anneal length."""
    ld, logz = _gaussian_target([1.0, 4.0, 0.25, 2.0])
    res = qnm.ais_evidence(
        ld, jax.random.PRNGKey(0),
        (jnp.zeros(4), jnp.asarray([1.0, 0.25, 4.0, 0.5])),  # diag cov
        n_particles=64, n_steps=4, n_leapfrog=4,
    )
    np.testing.assert_allclose(float(res.logZ), logz, atol=1e-8)
    np.testing.assert_allclose(float(res.ess), 64.0, rtol=1e-6)


def test_ais_from_solve_result_dense_base():
    """Base extracted from a converged BFGS solve: B is secant-approximate
    so weights have spread, but logZ must land within tight MC error."""
    ld, logz = _gaussian_target([1.0, 3.0, 0.5])
    sol = qnm.optimize(ld, jnp.asarray([1.0, -2.0, 0.5]))
    assert bool(sol.converged)
    res = qnm.ais_evidence(
        ld, jax.random.PRNGKey(1), sol,
        n_particles=512, n_steps=24, n_leapfrog=4,
    )
    assert abs(float(res.logZ) - logz) < 0.05
    # and it agrees with Laplace here (exact-Gaussian case)
    lz_lap = float(qnm.laplace_evidence(sol, obj=ld))
    np.testing.assert_allclose(lz_lap, logz, atol=1e-6)
    assert float(res.ess) > 64


def test_ais_from_fleet_result():
    ld, logz = _gaussian_target([1.0, 2.0])
    x0s = jax.random.normal(jax.random.PRNGKey(2), (16, 2))
    fleet = qnm.optimize_batched(ld, x0s)
    res = qnm.ais_evidence(
        ld, jax.random.PRNGKey(3), fleet,
        n_particles=256, n_steps=16, n_leapfrog=4,
    )
    assert abs(float(res.logZ) - logz) < 0.1


def test_ais_repairs_laplace_multimodal_bias():
    """Two normalized-component modes (weights 0.75/0.25): true
    log Z = (n/2) log 2π. Laplace at the heavy mode misses the light
    basin — bias ≈ log 0.75 = -0.29. AIS from a COVERING base (wide
    Gaussian over both basins) must land on the true value."""
    mix = GaussianMixture(
        means=[[4.0, 4.0], [-4.0, -4.0]], weights=[0.75, 0.25], sigmas=1.0
    )
    logz_true = 0.5 * 2 * _LOG_2PI

    sol = qnm.optimize(mix.logdensity, jnp.asarray([3.5, 4.5]))
    lz_lap = float(qnm.laplace_evidence(sol, obj=mix.logdensity))
    assert 0.2 < logz_true - lz_lap < 0.4  # the structural one-basin bias

    res = qnm.ais_evidence(
        mix.logdensity, jax.random.PRNGKey(4),
        (jnp.zeros(2), jnp.full((2,), 25.0)),  # covers both basins
        n_particles=2048, n_steps=96, n_leapfrog=8, schedule=2.0,
    )
    assert abs(float(res.logZ) - logz_true) < 0.1
    # AIS is closer to the truth than Laplace by construction here
    assert abs(float(res.logZ) - logz_true) < abs(lz_lap - logz_true)


def test_ais_schedule_and_error_paths():
    ld, _ = _gaussian_target([1.0, 1.0])
    base = (jnp.zeros(2), jnp.ones(2))
    # explicit schedule array must have n_steps+1 entries
    with pytest.raises(ValueError, match="schedule array"):
        qnm.ais_evidence(ld, jax.random.PRNGKey(0), base, n_steps=4,
                         schedule=jnp.linspace(0, 1, 4))
    with pytest.raises(ValueError, match="power must be"):
        qnm.ais_evidence(ld, jax.random.PRNGKey(0), base, schedule=-1.0)
    with pytest.raises(ValueError, match="n_steps"):
        qnm.ais_evidence(ld, jax.random.PRNGKey(0), base, n_steps=0)
    with pytest.raises(TypeError, match="solve result or"):
        qnm.ais_evidence(ld, jax.random.PRNGKey(0), 3.0)
    # explicit valid schedule runs
    res = qnm.ais_evidence(
        ld, jax.random.PRNGKey(5), base, n_particles=32, n_steps=4,
        n_leapfrog=2, schedule=jnp.linspace(0, 1, 5) ** 3,
    )
    assert np.isfinite(float(res.logZ))
    assert res.accept_rate.shape == (4,)


def test_ais_nonfinite_particles_drop_not_poison():
    """A particle that wanders into a -inf region carries -inf weight
    (drops out of the estimate) rather than NaN-poisoning logsumexp."""

    def ld(x):
        # log-barrier target: -inf outside |x| < 3
        inside = jnp.all(jnp.abs(x) < 3.0)
        return jnp.where(inside, -0.5 * jnp.sum(x * x), -jnp.inf)

    res = qnm.ais_evidence(
        ld, jax.random.PRNGKey(6), (jnp.zeros(2), jnp.full((2,), 4.0)),
        n_particles=256, n_steps=16, n_leapfrog=4,
    )
    assert np.isfinite(float(res.logZ))
    assert np.all(np.isnan(np.asarray(res.logw)) == False)  # noqa: E712


def test_ais_resampling_smc_mode():
    """A displaced target (mode 5σ from the base center) with a short
    anneal collapses plain-AIS weights; resample=True banks partial
    evidence and resamples, keeping the estimate accurate."""
    n = 4
    logz_true = 0.5 * n * _LOG_2PI

    def ld(x):
        return -0.5 * jnp.sum((x - 5.0) ** 2)

    base = (jnp.zeros(n), jnp.ones(n))
    kw = dict(n_particles=512, n_steps=24, n_leapfrog=4)
    plain = qnm.ais_evidence(ld, jax.random.PRNGKey(7), base, **kw)
    smc = qnm.ais_evidence(ld, jax.random.PRNGKey(7), base,
                           resample=True, **kw)
    assert int(smc.n_resamples) > 0
    assert int(plain.n_resamples) == 0
    assert abs(float(smc.logZ) - logz_true) < 0.3
    # SMC's final-segment weights stay healthy where plain AIS collapses
    assert float(smc.ess) > float(plain.ess)


def test_ais_resample_threshold_validation():
    base = (jnp.zeros(2), jnp.ones(2))
    with pytest.raises(ValueError, match="resample_threshold"):
        qnm.ais_evidence(lambda x: -jnp.sum(x * x), jax.random.PRNGKey(0),
                         base, resample=True, resample_threshold=1.5)


def test_smc_adaptive_exact_base_single_jump():
    """With the EXACT base, logp − logq0 is constant, so the weight ESS
    stays N for ANY increment — the adaptive schedule must take one full
    jump to b = 1 and the estimate is exact."""
    ld, logz = _gaussian_target([1.0, 4.0, 0.25, 2.0])
    res = qnm.ais_evidence(
        ld, jax.random.PRNGKey(0),
        (jnp.zeros(4), jnp.asarray([1.0, 0.25, 4.0, 0.5])),
        n_particles=64, n_steps=32, n_leapfrog=2, schedule="adaptive",
    )
    assert int(res.n_rungs) == 1
    np.testing.assert_allclose(float(res.logZ), logz, atol=1e-8)
    # ladder: [0, 1, 1, ..., 1] (padded), acceptance zero-padded
    np.testing.assert_allclose(np.asarray(res.betas)[1:], 1.0)
    assert np.all(np.asarray(res.accept_rate)[1:] == 0.0)


def test_smc_adaptive_displaced_target():
    """The displaced target (mode 5σ from the base): adaptive SMC must
    find its own ladder (monotone 0 → 1 within the cap), keep the weight
    ESS healthy via resampling, and land on the analytic evidence."""
    n = 4
    logz_true = 0.5 * n * _LOG_2PI

    def ld(x):
        return -0.5 * jnp.sum((x - 5.0) ** 2)

    res = qnm.ais_evidence(
        ld, jax.random.PRNGKey(7), (jnp.zeros(n), jnp.ones(n)),
        n_particles=512, n_steps=64, n_leapfrog=4,
        schedule="adaptive", resample=True,
    )
    t = int(res.n_rungs)
    assert 1 < t <= 64
    betas = np.asarray(res.betas)
    assert betas[0] == 0.0
    assert np.all(np.diff(betas[: t + 1]) > 0)
    np.testing.assert_allclose(betas[t:], 1.0)
    assert abs(float(res.logZ) - logz_true) < 0.3
    # the self-tuned ladder keeps the final-segment weights healthy
    assert float(res.ess) > 0.25 * 512


def test_smc_adaptive_floor_guarantees_termination():
    """adapt_target ≈ 1 is unreachable on a displaced target — the
    remaining-budget floor must still walk b to exactly 1 within the
    rung cap (degrading to the linear ladder), never stalling."""

    def ld(x):
        return -0.5 * jnp.sum((x - 5.0) ** 2)

    res = qnm.ais_evidence(
        ld, jax.random.PRNGKey(8), (jnp.zeros(2), jnp.ones(2)),
        n_particles=64, n_steps=8, n_leapfrog=2,
        schedule="adaptive", adapt_target=0.999,
    )
    assert int(res.n_rungs) == 8
    assert float(np.asarray(res.betas)[8]) == 1.0
    assert np.isfinite(float(res.logZ))


def test_smc_adaptive_validation():
    ld = lambda x: -jnp.sum(x * x)  # noqa: E731
    base = (jnp.zeros(2), jnp.ones(2))
    with pytest.raises(ValueError, match="adapt_target"):
        qnm.ais_evidence(ld, jax.random.PRNGKey(0), base,
                         schedule="adaptive", adapt_target=1.5)
    with pytest.raises(ValueError, match="power, an array, or"):
        qnm.ais_evidence(ld, jax.random.PRNGKey(0), base,
                         schedule="geometric")


def test_smc_adaptive_f32():
    res = qnm.ais_evidence(
        lambda x: -0.5 * jnp.sum((x - 2.0) ** 2), jax.random.PRNGKey(1),
        (jnp.zeros(3, jnp.float32), jnp.ones(3, jnp.float32)),
        n_particles=64, n_steps=16, n_leapfrog=2,
        schedule="adaptive", resample=True,
    )
    assert res.logw.dtype == jnp.float32
    assert res.betas.dtype == jnp.float32
    assert np.isfinite(float(res.logZ))


def test_ais_f32_under_x64():
    res = qnm.ais_evidence(
        lambda x: -0.5 * jnp.sum(x * x), jax.random.PRNGKey(1),
        (jnp.zeros(3, jnp.float32), jnp.ones(3, jnp.float32)),
        n_particles=32, n_steps=4, n_leapfrog=2, resample=True,
    )
    assert res.logw.dtype == jnp.float32
    assert np.isfinite(float(res.logZ))


def test_smc_adaptive_no_resample_cess_keeps_adapting():
    """resample=False adaptive mode bisects on the CONDITIONAL ESS of
    each increment (CESS) — the combined ESS is monotone non-increasing
    without resampling, so the old criterion degenerated to the linear
    floor after the first crossing (advisor finding, round 4). CESS keeps
    the ladder genuinely adaptive: on the displaced target the found
    ladder must be non-uniform (adaptive rungs concentrate where the
    target changes fastest) and the estimate still lands."""
    n = 4
    logz_true = 0.5 * n * _LOG_2PI

    def ld(x):
        return -0.5 * jnp.sum((x - 5.0) ** 2)

    res = qnm.ais_evidence(
        ld, jax.random.PRNGKey(11), (jnp.zeros(n), jnp.ones(n)),
        n_particles=512, n_steps=64, n_leapfrog=4,
        schedule="adaptive", resample=False,
    )
    t = int(res.n_rungs)
    # the degenerate (combined-ESS) criterion crosses its target early on
    # this displaced target and then floor-walks to exactly the 64-rung
    # cap; a genuinely per-rung criterion finishes far earlier
    assert 1 < t < 32
    betas = np.asarray(res.betas)
    db = np.diff(betas[: t + 1])
    assert np.all(db > 0)
    np.testing.assert_allclose(betas[t:], 1.0)
    # non-uniform ladder = the rung budget concentrates where the target
    # changes fastest
    assert db.max() > 2.0 * db.min()
    # mechanism test, not an accuracy bar: without resampling the weight
    # degeneracy bias is real — the accuracy bar lives in the
    # resample=True test above
    assert abs(float(res.logZ) - logz_true) < 1.0
