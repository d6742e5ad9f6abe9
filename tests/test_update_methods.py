"""Broyden-family inverse updates (DFP, SR1) — beyond-reference breadth.

The reference is BFGS-only; these tests pin the DFP/SR1 formulas (secant
equation, known quadratic behavior, the SR1 skip safeguard) and the
driver integration (`optimize(..., update_method=...)`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity
from quasinewtonmethods_jl_tpu.ops.bfgs import (
    bfgs_update,
    dfp_update,
    sr1_update,
)


def _random_spd(rng, n):
    A = rng.standard_normal((n, n)) * 0.3
    return jnp.asarray(A @ A.T + np.eye(n))


def _random_pair(rng, n):
    s = jnp.asarray(rng.standard_normal(n) * 0.1)
    y = s + 0.02 * jnp.asarray(rng.standard_normal(n))  # s'y > 0 w.h.p.
    g = jnp.asarray(rng.standard_normal(n))
    gold = g + y  # y = gold - g
    return s, g, gold, y


@pytest.mark.parametrize("update", [bfgs_update, dfp_update, sr1_update])
def test_secant_equation(update, rng):
    """Every Broyden-family inverse update must satisfy B_new y = s."""
    n = 7
    B = _random_spd(rng, n)
    s, g, gold, y = _random_pair(rng, n)
    B_new, d, m = update(B, s, g, gold)
    np.testing.assert_allclose(
        np.asarray(B_new @ y), np.asarray(s), atol=1e-10
    )
    # returned direction/derivative are consistent with B_new
    np.testing.assert_allclose(np.asarray(B_new @ g), np.asarray(d), atol=1e-10)
    np.testing.assert_allclose(float(jnp.dot(d, g)), float(m), atol=1e-10)


def test_dfp_preserves_definiteness(rng):
    """DFP keeps B positive definite when s'y > 0 (like BFGS)."""
    n = 6
    B = _random_spd(rng, n)
    s, g, gold, y = _random_pair(rng, n)
    B_new, _, _ = dfp_update(B, s, g, gold)
    eigs = np.linalg.eigvalsh(np.asarray(B_new))
    assert np.all(eigs > 0)
    # and symmetry
    np.testing.assert_allclose(
        np.asarray(B_new), np.asarray(B_new).T, atol=1e-12
    )


def test_sr1_skip_safeguard(rng):
    """The SR1 skip rule is ANGLE-based (|u'y| < tol*||u||*||y||): when
    u = s - By is (numerically) orthogonal to y the denominator vanishes
    relative to the update magnitude; the standard rule skips instead of
    dividing — B must come back unchanged and finite."""
    n = 5
    B = _random_spd(rng, n)
    _s_raw, g, gold, y = _random_pair(rng, n)
    v = jnp.asarray(rng.standard_normal(n))
    w = v - (jnp.dot(v, y) / jnp.dot(y, y)) * y  # w exactly _|_ y (to fp)
    s = B @ y + w  # u = w, u'y ~ 0 at O(eps) angle -> skip fires
    gold = g + y
    B_new, d, m = sr1_update(B, s, g, gold)
    np.testing.assert_array_equal(np.asarray(B_new), np.asarray(B))
    assert np.all(np.isfinite(np.asarray(d))) and np.isfinite(float(m))


def test_sr1_exact_on_quadratic_after_n_updates(rng):
    """On a quadratic with n independent steps, SR1 reconstructs the true
    inverse Hessian exactly after n updates (its hallmark property —
    BFGS/DFP only approach it)."""
    n = 5
    A = np.asarray(_random_spd(rng, n))  # maximize -0.5 x'Ax
    B = jnp.eye(n)
    rng2 = np.random.default_rng(7)
    for _ in range(n):
        s = jnp.asarray(rng2.standard_normal(n))
        # gradient of -0.5x'Ax is -Ax; y = g_old - g_new = A s
        y = jnp.asarray(A) @ s
        g = jnp.asarray(rng2.standard_normal(n))  # arbitrary eval point
        gold = g + y
        B, _, _ = sr1_update(B, s, g, gold)
    np.testing.assert_allclose(
        np.asarray(B), np.linalg.inv(A), atol=1e-8
    )


@pytest.mark.parametrize("update_method", ["dfp", "sr1"])
def test_driver_converges_with_alternative_updates(update_method, rng):
    def quad(x):
        diag = jnp.arange(1.0, x.shape[0] + 1.0, dtype=x.dtype)
        return -0.5 * jnp.sum(diag * x * x)

    x0 = jnp.asarray(rng.standard_normal(10))
    res = qnm.optimize(quad, x0, update_method=update_method)
    assert int(res.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=1e-8)

    # mildly nonlinear: logistic-style MAP stays in the concave world
    # (solid ridge: DFP's weaker curvature correction stalls at the fp
    # noise floor on near-flat tails, a legit in-band exit — the test pins
    # convergence on a well-conditioned instance)
    def logistic(x):
        z = jnp.linspace(-1, 1, x.shape[0])
        return jnp.sum(z * x - jnp.logaddexp(0.0, x)) - 0.25 * jnp.sum(x * x)

    res2 = qnm.optimize(logistic, x0, update_method=update_method, tol=1e-6)
    assert int(res2.status) == qnm.Status.CONVERGED


def test_driver_rosenbrock_sr1(rng):
    """SR1 on the (nonconvex approach path of the) Rosenbrock fixture: the
    m <= 0 reset must absorb indefinite B and still reach the optimum."""
    x0 = jnp.asarray(rng.standard_normal(6) * 0.5)
    res = qnm.optimize(rosenbrock_logdensity, x0, update_method="sr1",
                       max_iterations=50_000)
    assert int(res.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(np.asarray(res.x), 1.0, rtol=1e-5)


def test_update_method_resume_and_default(rng):
    def quad(x):
        return -0.5 * jnp.sum(x * x)

    x0 = jnp.asarray(rng.standard_normal(6))
    part = qnm.optimize(quad, x0, update_method="dfp", max_iterations=2)
    res = qnm.optimize_from_state(quad, part.state, update_method="dfp")
    assert int(res.status) == qnm.Status.CONVERGED
    # default stays exact-BFGS: identical to an explicit "bfgs" run
    a = qnm.optimize(quad, x0)
    b = qnm.optimize(quad, x0, update_method="bfgs")
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    assert int(a.iterations) == int(b.iterations)


def test_update_method_validation(rng):
    with pytest.raises(ValueError, match="update_method"):
        qnm.optimize(
            lambda x: -jnp.sum(x * x), jnp.ones(3), jit=False,
            update_method="broyden",
        )
