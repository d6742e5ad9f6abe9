"""Pathfinder: spectral Gaussian ops, GPD/PSIS machinery, and end-to-end
variational quality on targets with known moments.

The reference's role in its ecosystem is HMC chain initialization
(reference README.md:14); pathfinder is the modern version of that
handoff — these tests pin the algorithm at the distribution level (khat,
moments) and the internals against dense linear algebra."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.pathfinder import (
    _apply_H,
    _apply_sqrt_H,
    _log_q,
    _logdet_H,
    gpd_fit_khat,
)


def _random_spectral(key, n, r):
    k1, k2, k3 = jax.random.split(key, 3)
    Q, _ = jnp.linalg.qr(jax.random.normal(k1, (n, r)))
    sig = jnp.exp(jax.random.normal(k2, (r,)))
    gamma = jnp.exp(jax.random.normal(k3, ()))
    return gamma, Q, sig


def _dense_H(gamma, Q, sig, n):
    return gamma * (jnp.eye(n) - Q @ Q.T) + Q @ jnp.diag(sig) @ Q.T


# ---------------------------------------------------------------------------
# spectral-form Gaussian ops vs dense linear algebra


def test_apply_H_and_sqrt_match_dense():
    n, r = 12, 6
    gamma, Q, sig = _random_spectral(jax.random.key(0), n, r)
    H = _dense_H(gamma, Q, sig, n)
    v = jax.random.normal(jax.random.key(1), (n,))
    np.testing.assert_allclose(_apply_H(gamma, Q, sig, v), H @ v, rtol=1e-10)
    # sqrt: applying twice = applying H
    s = _apply_sqrt_H(gamma, Q, sig, v)
    np.testing.assert_allclose(
        _apply_sqrt_H(gamma, Q, sig, s), H @ v, rtol=1e-9
    )


def test_logdet_and_logq_match_dense():
    n, r = 10, 4
    gamma, Q, sig = _random_spectral(jax.random.key(2), n, r)
    H = _dense_H(gamma, Q, sig, n)
    ld = _logdet_H(gamma, sig, n)
    np.testing.assert_allclose(ld, jnp.linalg.slogdet(H)[1], rtol=1e-10)
    mu = jax.random.normal(jax.random.key(3), (n,))
    z = jax.random.normal(jax.random.key(4), (3, n))
    expect = jax.vmap(
        lambda zz: -0.5
        * (
            n * math.log(2 * math.pi)
            + jnp.linalg.slogdet(H)[1]
            + (zz - mu) @ jnp.linalg.solve(H, zz - mu)
        )
    )(z)
    np.testing.assert_allclose(
        _log_q(gamma, Q, sig, ld, mu, z), expect, rtol=1e-9
    )


# ---------------------------------------------------------------------------
# GPD fit + PSIS


@pytest.mark.parametrize("k_true", [0.2, 0.5, 0.9])
def test_gpd_fit_recovers_k(k_true):
    # GPD inverse-CDF sampling: x = sigma/k ((1-u)^(-k) - 1)
    rng = np.random.default_rng(42)
    u = rng.uniform(size=4000)
    sigma = 1.3
    x = np.sort(sigma / k_true * ((1 - u) ** (-k_true) - 1))
    khat, sig_hat = gpd_fit_khat(jnp.asarray(x))
    assert abs(float(khat) - k_true) < 0.08, (float(khat), k_true)
    assert abs(float(sig_hat) - sigma) / sigma < 0.15


def test_psis_smooth_preserves_bulk_and_bounds_tail():
    rng = np.random.default_rng(0)
    logw = jnp.asarray(rng.standard_normal(500))
    out, khat = qnm.psis_smooth(logw)
    S = 500
    M = int(math.ceil(min(0.2 * S, 3 * math.sqrt(S))))
    order = np.argsort(np.asarray(logw))
    bulk = order[: S - M]
    # bulk untouched
    np.testing.assert_allclose(np.asarray(out)[bulk], np.asarray(logw)[bulk])
    # tail bounded by the raw maximum, and finite
    assert float(out.max()) <= float(logw.max()) + 1e-12
    assert np.isfinite(np.asarray(out)).all()
    # normal-tailed weights are thin-tailed: khat should be small
    assert float(khat) < 0.7


def test_psis_smooth_jits():
    logw = jax.random.normal(jax.random.key(5), (256,))
    out, khat = jax.jit(qnm.psis_smooth)(logw)
    assert out.shape == (256,) and np.isfinite(float(khat))


# ---------------------------------------------------------------------------
# end-to-end: exact Gaussian target


def _gaussian_target(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    cov = A @ A.T / n + 0.5 * np.eye(n)
    mu = rng.standard_normal(n)
    P = jnp.asarray(np.linalg.inv(cov))
    MU = jnp.asarray(mu)

    def logdensity(x):
        d = x - MU
        return -0.5 * d @ (P @ d)

    return logdensity, mu, cov


def test_pathfinder_gaussian_moments_and_khat():
    n = 8
    logdensity, mu, cov = _gaussian_target(n)
    res = qnm.pathfinder(
        logdensity, jax.random.key(0), jnp.zeros(n),
        n_paths=4, n_draws=2000, max_iters=40, elbo_draws=32,
    )
    assert (np.asarray(res.status) == int(qnm.Status.CONVERGED)).all()
    assert float(res.khat) < 0.7
    d = np.asarray(res.draws)
    assert d.shape == (2000, n)
    np.testing.assert_allclose(d.mean(0), mu, atol=0.12)
    np.testing.assert_allclose(np.cov(d.T), cov, atol=0.3)
    # per-path ELBO of an (unnormalized) Gaussian at the exact fit is the
    # negative log normalizer: 0.5 log det(2*pi*cov)
    elbo_exact = 0.5 * np.linalg.slogdet(2 * np.pi * cov)[1]
    np.testing.assert_allclose(np.asarray(res.elbo), elbo_exact, atol=0.3)


def test_pathfinder_deterministic():
    logdensity, *_ = _gaussian_target(5, seed=1)
    r1 = qnm.pathfinder(logdensity, jax.random.key(7), jnp.zeros(5),
                        n_paths=2, n_draws=64, max_iters=20)
    r2 = qnm.pathfinder(logdensity, jax.random.key(7), jnp.zeros(5),
                        n_paths=2, n_draws=64, max_iters=20)
    np.testing.assert_array_equal(np.asarray(r1.draws), np.asarray(r2.draws))


def test_pathfinder_skewed_target_is_corrected_by_psis():
    # product of Gamma(a_i, b_i): mean a/b, var a/b^2 — skewed, so the
    # selected Gaussians are wrong in the tails; PSIS resampling must
    # still produce calibrated moments.
    a = jnp.asarray([4.0, 6.0, 8.0])
    b = jnp.asarray([1.0, 2.0, 0.5])

    def logdensity(x):
        # x unconstrained via exp (gamma on log scale, Jacobian included)
        t = jnp.exp(x)
        return jnp.sum(a * x - b * t)

    res = qnm.pathfinder(
        logdensity, jax.random.key(1), jnp.zeros(3),
        n_paths=4, n_draws=4000, max_iters=40, elbo_draws=32,
    )
    assert float(res.khat) < 0.7
    t = np.exp(np.asarray(res.draws))
    np.testing.assert_allclose(t.mean(0), a / b, rtol=0.08)
    np.testing.assert_allclose(t.var(0), a / b**2, rtol=0.25)


def test_pathfinder_invalid_path_excluded():
    n = 4

    def logdensity(x):
        # NaN wall far from the origin: the deliberately bad start dies
        good = -0.5 * jnp.sum(x * x)
        return jnp.where(jnp.max(jnp.abs(x)) > 50.0, jnp.nan, good)

    x0s = jnp.stack([jnp.zeros(n), jnp.full(n, 1e3), 0.5 * jnp.ones(n)])
    res = qnm.pathfinder(logdensity, jax.random.key(2), x0s, n_draws=500,
                         max_iters=30)
    status = np.asarray(res.status)
    assert status[1] == int(qnm.Status.NONFINITE_VALUE)
    assert not np.isfinite(float(res.elbo[1]))
    # draws come only from the valid paths and are finite + in-range
    d = np.asarray(res.draws)
    assert np.isfinite(d).all() and (np.abs(d) < 50).all()
    np.testing.assert_allclose(d.mean(0), np.zeros(n), atol=0.15)


def test_pathfinder_mass_handoff_to_chees():
    logdensity, mu, cov = _gaussian_target(6, seed=2)
    res = qnm.pathfinder(logdensity, jax.random.key(3), jnp.zeros(6),
                         n_paths=2, n_draws=64, max_iters=30)
    mass = res.mass()
    # chain starts = pathfinder draws; metric = selected low-rank H
    x0 = res.draws[:16]
    out = qnm.chees_sample(
        logdensity, jax.random.key(4), x0, n_samples=50, n_warmup=50,
        mass=mass,
    )
    assert np.isfinite(np.asarray(out.samples)).all()


def test_pathfinder_f32():
    logdensity, *_ = _gaussian_target(5, seed=3)
    res = qnm.pathfinder(
        lambda x: logdensity(x.astype(jnp.float64)).astype(jnp.float32),
        jax.random.key(5), jnp.zeros(5, jnp.float32),
        n_paths=2, n_draws=128, max_iters=20,
    )
    assert res.draws.dtype == jnp.float32
    assert np.isfinite(np.asarray(res.draws)).all()


def test_pathfinder_rank2_x0_and_bad_rank():
    logdensity, *_ = _gaussian_target(4, seed=4)
    with pytest.raises(ValueError):
        qnm.pathfinder(logdensity, jax.random.key(6), jnp.zeros((2, 3, 4)))


# ---------------------------------------------------------------------------
# pipeline integration: map_then_sample(init='pathfinder')


def _aniso(x):
    return -0.5 * jnp.sum(x * x * jnp.arange(1.0, x.shape[0] + 1.0))


def test_map_then_sample_pathfinder_init():
    out = qnm.map_then_sample(
        _aniso, jax.random.key(0), jnp.zeros(5), n_chains=16,
        n_samples=100, n_warmup=100, init="pathfinder",
        pathfinder_kwargs=dict(n_paths=4, max_iters=30),
    )
    assert out.samples.shape == (100, 16, 5)
    assert hasattr(out.map_result, "khat")  # PathfinderResult in map slot
    assert float(out.map_result.khat) < 0.7
    # the handed-off metric is the selected LowRankMass
    from quasinewtonmethods_jl_tpu.sampling import LowRankMass

    assert isinstance(out.mass, LowRankMass)
    v = np.asarray(out.samples).reshape(-1, 5).var(0)
    np.testing.assert_allclose(v, 1.0 / np.arange(1.0, 6.0), rtol=0.35)


def test_map_then_sample_pathfinder_with_transform():
    t = qnm.transforms.Positive(3)

    def gld(x):  # Gamma(3, 1) product: mean 3
        return jnp.sum(2.0 * jnp.log(x) - x)

    out = qnm.map_then_sample(
        gld, jax.random.key(1), jnp.ones(3), n_chains=8,
        n_samples=100, n_warmup=100, init="pathfinder", transform=t,
        pathfinder_kwargs=dict(n_paths=4, max_iters=30),
    )
    m = np.asarray(out.samples_constrained).reshape(-1, 3).mean(0)
    np.testing.assert_allclose(m, 3.0, rtol=0.2)


def test_map_then_sample_pathfinder_misuse():
    with pytest.raises(ValueError, match="polish"):
        qnm.map_then_sample(_aniso, jax.random.key(2), jnp.zeros(5),
                            init="pathfinder", polish_steps=1)
    with pytest.raises(ValueError, match=r"\(n,\) center"):
        qnm.map_then_sample(_aniso, jax.random.key(2), jnp.zeros((4, 5)),
                            init="pathfinder")
    with pytest.raises(ValueError, match="init must be"):
        qnm.map_then_sample(_aniso, jax.random.key(2), jnp.zeros(5),
                            init="laplace")
