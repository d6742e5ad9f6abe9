"""Minimization-convention adapter: qnm.minimize.

The shim must be lossless against the native maximization engines: same
iterates/iteration counts as optimizing the negated objective natively,
signs flipped only on fun/last_value/grad, state left in the internal
convention so native resume works.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm


def rosenbrock_min(x):
    """The STANDARD (minimized, positive) Rosenbrock."""
    x0, x1 = x[::2], x[1::2]
    return jnp.sum(100.0 * (x1 - x0**2) ** 2 + (1.0 - x0) ** 2)


def quad_min(x):
    diag = jnp.arange(1.0, x.shape[0] + 1.0, dtype=x.dtype)
    return 0.5 * jnp.sum(diag * x * x)


def test_minimize_rosenbrock_scalar(rng):
    x0 = jnp.asarray(rng.standard_normal(8))
    res = qnm.minimize(rosenbrock_min, x0)
    assert int(res.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(np.asarray(res.x), 1.0, rtol=1e-6)
    # minimized value: small and NON-NEGATIVE (the sign flip worked)
    assert 0.0 <= float(res.fun) < 1e-12
    # grad is the gradient OF THE MINIMIZED fun
    np.testing.assert_allclose(
        np.asarray(res.grad), np.asarray(jax.grad(rosenbrock_min)(res.x)),
        atol=1e-10,
    )


def test_minimize_matches_native_negated(rng):
    """Adapter is a pure relabeling: identical trajectory to the native
    maximizer of the negated objective."""
    x0 = jnp.asarray(rng.standard_normal(6))

    def neg(x):
        return -quad_min(x)

    native = qnm.optimize(neg, x0)
    mini = qnm.minimize(quad_min, x0)
    assert int(native.iterations) == int(mini.iterations)
    np.testing.assert_array_equal(np.asarray(native.x), np.asarray(mini.x))
    np.testing.assert_array_equal(
        np.asarray(native.fun), -np.asarray(mini.fun)
    )
    np.testing.assert_array_equal(
        np.asarray(native.grad), -np.asarray(mini.grad)
    )


@pytest.mark.parametrize("method", ["bfgs", "lbfgs"])
def test_minimize_batched(method, rng):
    X0 = jnp.asarray(rng.standard_normal((5, 10)))
    res = qnm.minimize(quad_min, X0, method=method, tol=1e-9)
    assert np.all(np.asarray(res.status) == qnm.Status.CONVERGED)
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=1e-8)
    assert np.all(np.asarray(res.fun) >= 0.0)


def test_minimize_analytic_value_and_grad(rng):
    x0 = jnp.asarray(rng.standard_normal(4))
    calls = []

    def vag(x):
        calls.append(1)
        diag = jnp.arange(1.0, x.shape[0] + 1.0, dtype=x.dtype)
        return 0.5 * jnp.sum(diag * x * x), diag * x

    res = qnm.minimize(quad_min, x0, value_and_grad_fn=vag, jit=False)
    assert int(res.status) == qnm.Status.CONVERGED
    assert calls  # the analytic path was actually used
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=1e-8)


def test_minimize_state_resumes_natively(rng):
    """res.state stays in the internal maximization convention: feeding it
    to the native resume entry point continues the solve."""
    x0 = jnp.asarray(rng.standard_normal(8))
    part = qnm.minimize(rosenbrock_min, x0, max_iterations=5)
    assert int(part.status) == qnm.Status.MAX_ITERATIONS

    def neg(x):
        return -rosenbrock_min(x)

    res = qnm.optimize_from_state(neg, part.state)
    assert int(res.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(np.asarray(res.x), 1.0, rtol=1e-6)


def test_minimize_failure_stays_in_band():
    res = qnm.minimize(lambda x: jnp.nan * jnp.sum(x), jnp.ones(3))
    assert int(res.status) == qnm.Status.NONFINITE_VALUE
    assert np.isnan(float(res.fun))


def test_minimize_bad_method():
    with pytest.raises(ValueError, match="method"):
        qnm.minimize(quad_min, jnp.ones(3), method="newton")


def test_minimize_jit_cache_reuse(rng):
    """The negation wrapper hashes by the wrapped callable, so two
    minimize calls with the same function share one compiled executable."""
    from quasinewtonmethods_jl_tpu.minimize import _Negated

    assert _Negated(quad_min) == _Negated(quad_min)
    assert hash(_Negated(quad_min)) == hash(_Negated(quad_min))
    assert _Negated(quad_min) != _Negated(rosenbrock_min)


def test_minimize_method_tr_with_bounds():
    # minimization convention end to end through the TR engine
    def fun(x):
        return jnp.sum((x - 2.0) ** 2)

    res = qnm.minimize(fun, jnp.zeros(3), method="tr",
                       bounds=(jnp.full(3, -1.0), jnp.full(3, 1.0)),
                       tol=1e-8)
    assert int(res.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-8)
    assert float(res.fun) == pytest.approx(3.0, abs=1e-8)  # minimized value
    # grad in the minimization convention: 2(x-2) = -2 at the face
    np.testing.assert_allclose(np.asarray(res.grad), -2.0, atol=1e-6)


def test_minimize_method_tr_unbounded_matches_bfgs():
    def fun(x):
        return jnp.sum((x - 1.0) ** 2) + 0.5 * jnp.sum(x[:-1] * x[1:])

    x0 = jnp.asarray(np.random.default_rng(3).standard_normal(5))
    r_tr = qnm.minimize(fun, x0, method="tr", tol=1e-9)
    r_bf = qnm.minimize(fun, x0, method="bfgs", tol=1e-9)
    assert int(r_tr.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(np.asarray(r_tr.x), np.asarray(r_bf.x),
                               atol=1e-7)
