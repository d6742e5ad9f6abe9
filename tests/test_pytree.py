"""Structured-parameter (pytree) solves."""

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm


def logreg_logdensity(params):
    # dict params: weights vector + bias scalar + log-scale prior
    w, b = params["w"], params["b"]
    X = jnp.asarray(
        np.random.default_rng(3).standard_normal((50, 4)), w.dtype
    )
    y = (X @ jnp.asarray([1.0, -1.0, 0.5, 0.0], w.dtype) + 0.3 > 0).astype(w.dtype)
    logits = X @ w + b
    loglik = jnp.sum(
        y * jax.nn.log_sigmoid(logits) + (1 - y) * jax.nn.log_sigmoid(-logits)
    )
    return loglik - 0.05 * (jnp.sum(w * w) + b * b)


def test_optimize_pytree_dict(rng):
    x0 = {"w": jnp.zeros(4), "b": jnp.zeros(())}
    params, res = qnm.optimize_pytree(logreg_logdensity, x0)
    assert bool(res.converged)
    assert set(params) == {"w", "b"}
    assert params["w"].shape == (4,)
    assert params["b"].shape == ()
    # mode must agree with the flat solve of the same problem
    flat0, unravel = jax.flatten_util.ravel_pytree(x0)
    res_flat = qnm.optimize(lambda f: logreg_logdensity(unravel(f)), flat0)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(res_flat.x), atol=1e-8
    )


def test_optimize_lbfgs_pytree_nested(rng):
    x0 = {"blocks": [jnp.asarray(rng.standard_normal(8)),
                     jnp.asarray(rng.standard_normal(3))],
          "scale": jnp.zeros(())}

    def f(p):
        a, b = p["blocks"]
        return -(jnp.sum((a - 1.0) ** 2) + jnp.sum((b + 2.0) ** 2)
                 + (p["scale"] - 0.5) ** 2)

    params, res = qnm.optimize_lbfgs_pytree(f, x0)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(params["blocks"][0]), 1.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["blocks"][1]), -2.0, atol=1e-7)
    np.testing.assert_allclose(float(params["scale"]), 0.5, atol=1e-7)


def test_pytree_jit_cache_reuse(rng):
    """Same objective + structure twice must not retrace (hashable adapter)."""
    x0 = {"w": jnp.zeros(4), "b": jnp.zeros(())}
    _, r1 = qnm.optimize_pytree(logreg_logdensity, x0)
    x0b = {"w": jnp.ones(4), "b": jnp.ones(())}
    _, r2 = qnm.optimize_pytree(logreg_logdensity, x0b)
    assert bool(r1.converged) and bool(r2.converged)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-7)


def test_pytree_rejects_int_params():
    import pytest

    with pytest.raises(TypeError):
        qnm.optimize_pytree(lambda p: -jnp.sum(p["a"] ** 2.0), {"a": jnp.arange(3)})


def test_optimize_batched_pytree(rng):
    batch = 12

    def f(p):
        return -(jnp.sum((p["w"] - 1.0) ** 2) + (p["b"] + 2.0) ** 2)

    x0 = {
        "w": jnp.asarray(rng.standard_normal((batch, 5))),
        "b": jnp.asarray(rng.standard_normal(batch)),
    }
    params, res = qnm.optimize_batched_pytree(f, x0, backend="fused", kernel="xla")
    assert np.all(np.asarray(res.status) == qnm.Status.CONVERGED)
    assert params["w"].shape == (batch, 5)
    assert params["b"].shape == (batch,)
    np.testing.assert_allclose(np.asarray(params["w"]), 1.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["b"]), -2.0, atol=1e-7)
