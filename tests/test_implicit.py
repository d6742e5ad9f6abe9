"""Implicit differentiation (IFT) through the solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm


def test_quadratic_analytic_jacobian(rng):
    """f(x, p) = -0.5||x - p||^2: x* = p, so d(sum x*)/dp = 1⃗ and
    d f*/dp = 0 (envelope: f* = 0 identically)."""
    n = 6
    f = lambda x, p: -0.5 * jnp.sum((x - p) ** 2)
    p0 = jnp.asarray(rng.standard_normal(n))
    x0 = jnp.zeros(n)

    def loss(p):
        x_star, fun = qnm.optimize_implicit(f, x0, p)
        return jnp.sum(x_star), fun

    (g_x, g_f) = (jax.grad(lambda p: loss(p)[0])(p0),
                  jax.grad(lambda p: loss(p)[1])(p0))
    np.testing.assert_allclose(np.asarray(g_x), 1.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_f), 0.0, atol=1e-7)


def test_weighted_quadratic_mixed_sensitivity(rng):
    """f(x, p) = -0.5 sum(d * (x - a)^2) with p = (d, a): check against the
    closed form x* = a -> dx*/da = I, dx*/dd = 0."""
    n = 4
    d0 = jnp.asarray(rng.uniform(0.5, 2.0, n))
    a0 = jnp.asarray(rng.standard_normal(n))

    def f(x, p):
        return -0.5 * jnp.sum(p["d"] * (x - p["a"]) ** 2)

    def loss(p):
        x_star, _ = qnm.optimize_implicit(f, jnp.zeros(n), p)
        return jnp.vdot(jnp.arange(1.0, n + 1.0), x_star)

    g = jax.grad(loss)({"d": d0, "a": a0})
    np.testing.assert_allclose(np.asarray(g["a"]), np.arange(1.0, n + 1.0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g["d"]), 0.0, atol=1e-6)


@pytest.mark.parametrize("method", ["bfgs", "lbfgs"])
def test_map_prior_sensitivity_vs_finite_differences(method, rng):
    """Empirical-Bayes-style check: gradient of the logistic MAP w.r.t. the
    log prior scale matches central finite differences."""
    nobs, dim = 120, 8
    X = jnp.asarray(rng.standard_normal((nobs, dim)))
    w_true = jnp.asarray(rng.standard_normal(dim))
    y = (np.asarray(X @ w_true) + 0.5 * rng.standard_normal(nobs) > 0).astype(float)
    y = jnp.asarray(y)

    def f(w, log_scale):
        logits = X @ w
        loglik = jnp.sum(y * jax.nn.log_sigmoid(logits)
                         + (1 - y) * jax.nn.log_sigmoid(-logits))
        return loglik - 0.5 * jnp.sum(w * w) * jnp.exp(-2.0 * log_scale)

    opts = qnm.ImplicitOptions(method=method)

    def loss(ls_):
        x_star, _ = qnm.optimize_implicit(f, jnp.zeros(dim), ls_, opts)
        return jnp.sum(x_star ** 2)

    p0 = jnp.asarray(0.3)
    g = float(jax.grad(loss)(p0))
    h = 1e-4
    fd = (float(loss(p0 + h)) - float(loss(p0 - h))) / (2 * h)
    assert g == pytest.approx(fd, rel=2e-4)


def test_envelope_theorem_on_value(rng):
    """d f*/dp must equal the partial derivative at the mode (finite-diff)."""
    dim = 5
    A = rng.standard_normal((dim, dim))
    Q = jnp.asarray(A @ A.T + dim * np.eye(dim))

    def f(x, p):
        return -0.5 * x @ Q @ x + p @ x  # x* = Q^{-1} p, f* = 0.5 p'Q^{-1}p

    p0 = jnp.asarray(rng.standard_normal(dim))

    def fstar(p):
        _, fun = qnm.optimize_implicit(f, jnp.zeros(dim), p)
        return fun

    g = np.asarray(jax.grad(fstar)(p0))
    expected = np.asarray(jnp.linalg.solve(Q, p0))  # d/dp 0.5 p'Q^{-1}p
    np.testing.assert_allclose(g, expected, atol=1e-6)


def test_zero_gradient_through_x0(rng):
    f = lambda x, p: -0.5 * jnp.sum((x - p) ** 2)
    p0 = jnp.ones(3)

    def loss(x0):
        x_star, _ = qnm.optimize_implicit(f, x0, p0)
        return jnp.sum(x_star)

    g = jax.grad(loss)(jnp.asarray([0.3, -0.4, 2.0]))
    np.testing.assert_array_equal(np.asarray(g), 0.0)
