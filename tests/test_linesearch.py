"""Unit tests for the backtracking line search (both interpolation orders).

Covers the reference semantics (src/QuasiNewtonMethods.jl:165-232): immediate
acceptance at alpha=1, quadratic/cubic backtracking, the finite-halving
phase, NaN-robust clamping, and the in-band alpha==0 failure sentinel —
including failure paths the reference's own suite never exercises
(SURVEY.md §4 "What's untested").
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quasinewtonmethods_jl_tpu.ops.linesearch import (
    BackTracking,
    backtracking_linesearch,
)
from quasinewtonmethods_jl_tpu.utils.scalars import nanmax, nanmin, sqrt_tolerance


def run_ls(phi, f0, m, **kw):
    return backtracking_linesearch(phi, jnp.float64(f0), jnp.float64(m), BackTracking(**kw))


def test_full_step_accepted_on_concave_quadratic():
    # phi(a) = -(a-1)^2: phi(1)=0 >= phi(0) + 1*c1*m with m=phi'(0)=2.
    phi = lambda a: -((a - 1.0) ** 2)
    res = run_ls(phi, -1.0, 2.0)
    assert float(res.alpha) == 1.0
    assert int(res.iterations) == 0
    assert int(res.n_fev) == 1
    assert not bool(res.failed)


@pytest.mark.parametrize("order", [2, 3])
def test_backtracks_to_bracket(order):
    # Steep quadratic: phi(a) = a - 10 a^2, m = 1. Armijo at a=1 fails
    # (phi(1) = -9 < 1e-4); must backtrack into (0, 0.1] region and accept.
    phi = lambda a: a - 10.0 * a * a
    res = run_ls(phi, 0.0, 1.0, order=order)
    a = float(res.alpha)
    assert 0.0 < a < 1.0
    assert float(phi(jnp.float64(a))) >= a * 1e-4 * 1.0 - 1e-15
    assert not bool(res.failed)


def test_clamping_bounds_respected():
    # Every backtracking round must shrink alpha into [rho_lo*a, rho_hi*a].
    phi = lambda a: a - 1e6 * a * a  # very steep -> interpolation proposes tiny steps
    res = run_ls(phi, 0.0, 1.0)
    # After k rounds alpha >= rho_lo^k; with the accepted alpha a*, check
    # a* <= rho_hi (at least one shrink happened) and alpha respects rho_lo^k.
    k = int(res.iterations)
    assert k >= 1
    assert float(res.alpha) <= 0.5 ** 1 + 1e-15
    assert float(res.alpha) >= 0.1**k - 1e-300


def test_finite_phase_halves_until_finite():
    # phi non-finite for a > 0.1: forces the halving phase (reference
    # :176-184) before the Armijo loop can run.
    def phi(a):
        val = a - 0.5 * a * a
        return jnp.where(a > 0.1, jnp.inf * jnp.ones_like(val), val)

    res = run_ls(phi, 0.0, 1.0)
    assert bool(jnp.isfinite(res.f_final))
    assert 0.0 < float(res.alpha) <= 0.1
    assert not bool(res.failed)


def test_failure_returns_zero_alpha():
    # phi is -inf for every a > 0: Armijo can never genuinely hold. The
    # search must terminate in bounded time with the in-band alpha == 0
    # failure sentinel (reference :193/:284) — either by exhausting the
    # iteration budget or by alpha underflowing to exactly 0.
    phi = lambda a: jnp.where(a > 0, -jnp.inf * jnp.ones(()), jnp.zeros(()))
    res = run_ls(phi, 0.0, 1.0, iterations=50)
    assert float(res.alpha) == 0.0
    assert bool(res.failed)
    assert int(res.iterations) <= 50


def test_nan_objective_is_survivable():
    # NaN region near a=1; interpolation from NaN values must fall back to
    # the clamped bracket (nanmin/nanmax, reference :224-225) and still find
    # an acceptable step.
    def phi(a):
        good = a - 2.0 * a * a
        return jnp.where(a > 0.3, jnp.nan * jnp.ones_like(good), good)

    res = run_ls(phi, 0.0, 1.0)
    assert not bool(res.failed)
    assert 0.0 < float(res.alpha) <= 0.3


@pytest.mark.parametrize("order", [2, 3])
def test_works_under_jit_and_matches_eager(order):
    import jax

    phi = lambda a: a - 10.0 * a * a
    eager = run_ls(phi, 0.0, 1.0, order=order)
    jitted = jax.jit(
        lambda f0, m: backtracking_linesearch(phi, f0, m, BackTracking(order=order))
    )(jnp.float64(0.0), jnp.float64(1.0))
    np.testing.assert_allclose(float(eager.alpha), float(jitted.alpha), rtol=1e-15)
    assert int(eager.n_fev) == int(jitted.n_fev)


def test_invalid_order_rejected():
    with pytest.raises(ValueError):
        BackTracking(order=4)


def test_nan_scalar_helpers():
    nan = jnp.float64(jnp.nan)
    one = jnp.float64(1.0)
    two = jnp.float64(2.0)
    assert float(nanmin(one, two)) == 1.0
    assert float(nanmin(nan, two)) == 2.0
    assert float(nanmin(one, nan)) == 1.0
    assert float(nanmax(one, two)) == 2.0
    assert float(nanmax(nan, two)) == 2.0
    assert float(nanmax(one, nan)) == 1.0
    assert sqrt_tolerance(jnp.float64) == pytest.approx(2.0**-26)
    assert sqrt_tolerance(jnp.float32) == pytest.approx(2.0**-11)
