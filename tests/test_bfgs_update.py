"""Unit tests for the rank-2 inverse-BFGS update kernel.

The fused-form update (ops/bfgs.py, mirroring src/QuasiNewtonMethods.jl:34-69)
must agree with the independently derived Sherman–Morrison textbook form, and
must satisfy the structural invariants the reference relies on: symmetry of
B⁻¹, the secant equation B⁻¹_new y = s, and positive m for positive-curvature
pairs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quasinewtonmethods_jl_tpu.ops.bfgs import (
    bfgs_update,
    bfgs_update_reference,
    initial_inv_hessian,
)


def _random_spd(n, rng):
    A = rng.standard_normal((n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


@pytest.mark.parametrize("n", [2, 7, 16, 60])
def test_matches_sherman_morrison_form(n, rng):
    B = _random_spd(n, rng)
    s = jnp.asarray(rng.standard_normal(n) * 0.1)
    g_new = jnp.asarray(rng.standard_normal(n))
    # Build a grad_old guaranteeing positive curvature: y = g_old - g_new,
    # choose y correlated with s.
    y = s + 0.01 * jnp.asarray(rng.standard_normal(n))
    g_old = g_new + y

    B1, d1, m1 = bfgs_update(B, s, g_new, g_old)
    B2, d2, m2 = bfgs_update_reference(B, s, g_new, g_old)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B2), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(m1), float(m2), rtol=1e-9)


def test_secant_equation_and_symmetry(rng):
    n = 12
    B = _random_spd(n, rng)
    s = jnp.asarray(rng.standard_normal(n) * 0.1)
    g_new = jnp.asarray(rng.standard_normal(n))
    y = s + 0.01 * jnp.asarray(rng.standard_normal(n))
    g_old = g_new + y

    B1, d, m = bfgs_update(B, s, g_new, g_old)
    # Inverse-BFGS secant: B⁻¹_new @ y == s
    np.testing.assert_allclose(np.asarray(B1 @ y), np.asarray(s), atol=1e-9)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B1.T), atol=1e-10)
    # d is exactly B_new @ grad_new, m = dᵀ grad_new
    np.testing.assert_allclose(np.asarray(B1 @ g_new), np.asarray(d), atol=1e-9)
    np.testing.assert_allclose(float(jnp.dot(d, g_new)), float(m), rtol=1e-12)


def test_positive_curvature_preserves_positive_m(rng):
    """With SPD B and sᵀy > 0, B_new is SPD so m = gᵀB_new g > 0."""
    n = 9
    B = _random_spd(n, rng)
    for _ in range(10):
        s = jnp.asarray(rng.standard_normal(n) * 0.1)
        y = s * rng.uniform(0.5, 2.0) + 0.01 * jnp.asarray(rng.standard_normal(n))
        g_new = jnp.asarray(rng.standard_normal(n))
        g_old = g_new + y
        _, _, m = bfgs_update(B, s, g_new, g_old)
        assert float(m) > 0.0


def test_zero_curvature_propagates_nan(rng):
    """sᵀy == 0 -> inf/NaN in-band, never an exception: the driver's
    m <= 0 test is false for NaN and the line search fails out, matching
    the reference's IEEE failure path (SURVEY.md §5)."""
    n = 4
    B = initial_inv_hessian(n, jnp.float64)
    s = jnp.zeros(n, jnp.float64)
    g_new = jnp.ones(n, jnp.float64)
    g_old = 2.0 * jnp.ones(n, jnp.float64)
    _, _, m = bfgs_update(B, s, g_new, g_old)
    assert not bool(jnp.isfinite(m))
    assert not bool(m <= 0.0)  # NaN must NOT trigger the reset branch


def test_initial_inv_hessian_identity():
    B = initial_inv_hessian(5, jnp.float32)
    np.testing.assert_array_equal(np.asarray(B), np.eye(5, dtype=np.float32))
