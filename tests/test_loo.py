"""PSIS-LOO: analytic parity on the conjugate normal-normal model,
effective-parameter recovery, outlier k-hat flagging, paired model
comparison, callable/shape/validation paths.

The conjugate fixture gives EXACT leave-one-out predictives:
y_i ~ N(theta, 1), theta ~ N(0, tau^2) — the LOO posterior from y_{-i}
is N(m_i, v_i) in closed form and p(y_i | y_{-i}) = N(y_i; m_i, 1+v_i),
so elpd_loo has an analytic value the estimator must hit within MC
error."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm

_LOG_2PI = math.log(2.0 * math.pi)


def _norm_logpdf(y, mu, var):
    return -0.5 * ((y - mu) ** 2 / var + np.log(var) + _LOG_2PI)


def _conjugate_fixture(key, n_obs=25, n_draws=8192, tau2=4.0, shift=0.0):
    """Data, exact posterior draws, (S, N) loglik matrix, analytic
    elpd_loo. `shift` biases the model's predictions (for compare)."""
    rng = np.random.default_rng(17)
    y = rng.standard_normal(n_obs)
    v_post = 1.0 / (n_obs + 1.0 / tau2)
    m_post = v_post * y.sum()
    theta = m_post + math.sqrt(v_post) * jax.random.normal(
        key, (n_draws,), jnp.float64
    )
    ll = jnp.asarray(
        _norm_logpdf(y[None, :], np.asarray(theta)[:, None] + shift, 1.0)
    )
    # analytic LOO: posterior from y_{-i} -> predictive N(m_i, 1 + v_i)
    v_i = 1.0 / (n_obs - 1 + 1.0 / tau2)
    m_i = v_i * (y.sum() - y)
    elpd_true = float(_norm_logpdf(y, m_i + shift, 1.0 + v_i).sum())
    return y, theta, ll, elpd_true


def test_loo_matches_analytic_conjugate_value():
    _, _, ll, elpd_true = _conjugate_fixture(jax.random.PRNGKey(0))
    res = qnm.loo_psis(ll)
    assert abs(float(res.elpd) - elpd_true) < 0.25, (
        float(res.elpd), elpd_true,
    )
    # one scalar parameter; p_loo must say so
    assert 0.5 < float(res.p_loo) < 1.6
    # well-specified model: every observation's weights are reliable
    assert float(jnp.max(res.khat)) < 0.7
    assert res.elpd_pointwise.shape == (25,)
    assert float(res.se) > 0


def test_loo_flags_influential_outlier():
    """An 8-sigma outlier makes ITS leave-one-out weights heavy-tailed:
    its Pareto k-hat must be the largest of the panel."""
    rng = np.random.default_rng(18)
    y = rng.standard_normal(30)
    y[11] = 8.0
    n_obs = len(y)
    v_post = 1.0 / (n_obs + 0.25)
    m_post = v_post * y.sum()
    theta = m_post + math.sqrt(v_post) * np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (4096,), jnp.float64)
    )
    ll = jnp.asarray(_norm_logpdf(y[None, :], theta[:, None], 1.0))
    res = qnm.loo_psis(ll)
    assert int(jnp.argmax(res.khat)) == 11


def test_loo_compare_prefers_the_true_model():
    """Same draws, predictions biased by +1.5 in model b: the paired
    difference must decisively favor model a, and the paired se must be
    far smaller than the marginal ses (the pointwise terms are
    correlated)."""
    key = jax.random.PRNGKey(2)
    _, _, ll_a, _ = _conjugate_fixture(key)
    _, _, ll_b, _ = _conjugate_fixture(key, shift=1.5)
    ra, rb = qnm.loo_psis(ll_a), qnm.loo_psis(ll_b)
    diff, se = qnm.loo_compare(ra, rb)
    assert float(diff) > 0
    assert float(diff) > 2.0 * float(se)
    assert float(se) < float(ra.se) + float(rb.se)


def test_loo_callable_and_draw_shapes():
    """Callable loglik over (S, n) and (draws, chains, n) posterior draws
    matches the precomputed-matrix path exactly."""
    y = np.asarray([0.3, -1.2, 0.7, 2.0])

    def pointwise(theta):
        return -0.5 * ((jnp.asarray(y) - theta[0]) ** 2 + _LOG_2PI)

    theta = jax.random.normal(jax.random.PRNGKey(3), (512, 1), jnp.float64)
    ll = jax.vmap(pointwise)(theta)
    ref = qnm.loo_psis(ll)
    via_2d = qnm.loo_psis(pointwise, draws=theta)
    np.testing.assert_allclose(
        float(via_2d.elpd), float(ref.elpd), rtol=1e-12
    )
    via_3d = qnm.loo_psis(pointwise, draws=theta.reshape(64, 8, 1))
    np.testing.assert_allclose(
        float(via_3d.elpd), float(ref.elpd), rtol=1e-12
    )


def test_loo_validation():
    with pytest.raises(ValueError, match="needs draws"):
        qnm.loo_psis(lambda t: t)
    with pytest.raises(ValueError, match="must be \\(S draws"):
        qnm.loo_psis(jnp.ones((8,)))
    with pytest.raises(ValueError, match="at least 8 draws"):
        qnm.loo_psis(jnp.ones((4, 3)))
    with pytest.raises(ValueError, match="draws must be"):
        qnm.loo_psis(lambda t: t, draws=jnp.ones(5))
    ra = qnm.loo_psis(jnp.zeros((16, 3)) - 1.0)
    rb = qnm.loo_psis(jnp.zeros((16, 5)) - 1.0)
    with pytest.raises(ValueError, match="different observation"):
        qnm.loo_compare(ra, rb)


def test_waic_agrees_with_loo_and_analytic():
    """On the well-specified conjugate fixture WAIC ≈ PSIS-LOO ≈ the
    analytic elpd_loo, and p_waic recovers the single parameter."""
    _, _, ll, elpd_true = _conjugate_fixture(jax.random.PRNGKey(5))
    w = qnm.waic(ll)
    lo = qnm.loo_psis(ll)
    assert abs(float(w.elpd) - elpd_true) < 0.3
    assert abs(float(w.elpd) - float(lo.elpd)) < 0.2
    assert 0.5 < float(w.p_waic) < 1.6
    # loo_compare duck-types on elpd_pointwise: LOO vs WAIC of the SAME
    # model must be indistinguishable
    d, se = qnm.loo_compare(lo, w)
    assert abs(float(d)) < max(2.0 * float(se), 0.2)


def test_waic_validation():
    with pytest.raises(ValueError, match="needs draws"):
        qnm.waic(lambda t: t)
    with pytest.raises(ValueError, match="at least 2 draws"):
        qnm.waic(jnp.ones((1, 3)))
    with pytest.raises(ValueError, match="must be \\(S draws"):
        qnm.waic(jnp.ones((8,)))
