"""SVGD particle inference: moment recovery, mode coverage, determinism,
resume identity, in-band failure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm


def _corr_gaussian_2d():
    cov = np.array([[1.0, 0.6], [0.6, 0.8]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def logdensity(x):
        return -0.5 * x @ (prec @ x)

    return logdensity, cov


def test_gaussian_moments_recovered():
    logdensity, cov = _corr_gaussian_2d()
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((256, 2)) * 3.0 + 2.0
    )
    res = qnm.svgd_sample(logdensity, x0, n_steps=600)
    P = np.asarray(res.particles)
    np.testing.assert_allclose(P.mean(axis=0), 0.0, atol=0.1)
    np.testing.assert_allclose(np.cov(P.T), cov, atol=0.2)
    assert np.all(np.isfinite(np.asarray(res.logp)))
    assert float(res.bandwidth) > 0.0
    assert int(res.n_steps) == 600


def test_mixture_both_modes_covered():
    # equal two-mode mixture at ±2: a mode-seeking fleet would collapse
    # onto one basin; the repulsion must populate both
    def logdensity(x):
        a = -0.5 * jnp.sum((x - 2.0) ** 2)
        b = -0.5 * jnp.sum((x + 2.0) ** 2)
        return jnp.logaddexp(a, b) - jnp.log(2.0)

    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((128, 1)) * 3.0
    )
    res = qnm.svgd_sample(logdensity, x0, n_steps=800)
    P = np.asarray(res.particles)[:, 0]
    frac_right = float((P > 0).mean())
    assert 0.3 < frac_right < 0.7
    # particles sit in the basins, not between them
    assert float(np.abs(np.abs(P) - 2.0).mean()) < 0.8


def test_deterministic():
    logdensity, _ = _corr_gaussian_2d()
    x0 = jnp.asarray(np.random.default_rng(2).standard_normal((32, 2)))
    r1 = qnm.svgd_sample(logdensity, x0, n_steps=50)
    r2 = qnm.svgd_sample(logdensity, x0, n_steps=50)
    np.testing.assert_array_equal(
        np.asarray(r1.particles), np.asarray(r2.particles)
    )


def test_resume_chunked_equals_long():
    logdensity, _ = _corr_gaussian_2d()
    x0 = jnp.asarray(np.random.default_rng(3).standard_normal((64, 2)))
    long = qnm.svgd_sample(logdensity, x0, n_steps=120)
    part = qnm.svgd_sample(logdensity, x0, n_steps=40)
    resumed = qnm.svgd_sample_from_state(logdensity, part.state, n_steps=80)
    assert int(resumed.n_steps) == 120
    np.testing.assert_array_equal(
        np.asarray(resumed.particles), np.asarray(long.particles)
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.state.acc), np.asarray(long.state.acc)
    )


def test_checkpoint_roundtrip(tmp_path):
    from quasinewtonmethods_jl_tpu.utils.checkpoint import (
        load_state, save_state,
    )

    logdensity, _ = _corr_gaussian_2d()
    x0 = jnp.asarray(np.random.default_rng(4).standard_normal((16, 2)))
    part = qnm.svgd_sample(logdensity, x0, n_steps=10)
    path = tmp_path / "svgd.npz"
    save_state(str(path), part.state)
    loaded = load_state(str(path))
    assert type(loaded).__name__ == "SVGDState"
    a = qnm.svgd_sample_from_state(logdensity, loaded, n_steps=10)
    b = qnm.svgd_sample_from_state(logdensity, part.state, n_steps=10)
    np.testing.assert_array_equal(
        np.asarray(a.particles), np.asarray(b.particles)
    )


def test_nan_particle_freezes_in_band():
    # objective NaN for x0 < 0: a particle starting there must freeze and
    # report NaN logp; the rest of the fleet proceeds
    def logdensity(x):
        return jnp.where(x[0] > 0, -0.5 * jnp.sum((x - 2.0) ** 2), jnp.nan)

    x0 = jnp.asarray([[-5.0, 0.0], [1.0, 0.0], [2.0, 1.0], [3.0, -1.0]])
    res = qnm.svgd_sample(logdensity, x0, n_steps=100)
    P = np.asarray(res.particles)
    lp = np.asarray(res.logp)
    assert np.isnan(lp[0])
    np.testing.assert_allclose(P[0], [-5.0, 0.0], atol=1e-12)  # frozen
    assert np.all(np.isfinite(lp[1:]))
    np.testing.assert_allclose(P[1:, 0].mean(), 2.0, atol=0.6)


def test_validation():
    f = lambda x: -jnp.sum(x * x)
    with pytest.raises(ValueError, match="particles"):
        qnm.svgd_sample(f, jnp.zeros(3))
    with pytest.raises(ValueError, match="particles"):
        qnm.svgd_sample(f, jnp.zeros((1, 3)))
    with pytest.raises(ValueError, match="n_steps"):
        qnm.svgd_sample(f, jnp.zeros((4, 3)), n_steps=0)
    with pytest.raises(ValueError, match="step_size"):
        qnm.svgd_sample(f, jnp.zeros((4, 3)), step_size=-1.0)


def test_transform_composition():
    # Gamma(3, 2) posterior through the Positive bijection: SVGD runs in
    # unconstrained z, moments checked on the constrained scale
    from quasinewtonmethods_jl_tpu import transforms

    a, b = 3.0, 2.0

    def gamma_logpdf(x):
        return jnp.sum((a - 1.0) * jnp.log(x) - b * x)

    tm = transforms.transform_objective(gamma_logpdf, transforms.Positive(1))
    z0 = jnp.asarray(np.random.default_rng(5).standard_normal((256, 1)))
    res = qnm.svgd_sample(tm, z0, n_steps=800)
    xs = np.asarray(jax.vmap(tm.transform.forward)(res.particles))
    np.testing.assert_allclose(xs.mean(), a / b, atol=0.15)
    np.testing.assert_allclose(xs.var(), a / b**2, atol=0.25)
