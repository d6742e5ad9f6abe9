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


def test_map_then_sample_pytree():
    """Structured params end-to-end: MAP + draws come back in the tree
    structure, names label the flat summary, and the flat result keeps
    the full pipeline surface."""
    mu = jnp.asarray([1.0, -2.0])

    def logd(params):
        return (
            -0.5 * jnp.sum((params["beta"] - mu) ** 2)
            - 0.5 * (params["scales"]["sigma"] - 0.5) ** 2
        )

    tree0 = {"beta": jnp.zeros(2), "scales": {"sigma": jnp.asarray(0.0)}}
    out = qnm.map_then_sample_pytree(
        logd, jax.random.PRNGKey(3), tree0, n_chains=16, n_samples=300,
        n_warmup=200,
    )
    assert out.samples["beta"].shape == (300, 16, 2)
    assert out.samples["scales"]["sigma"].shape == (300, 16)
    np.testing.assert_allclose(np.asarray(out.x_map["beta"]), mu, atol=1e-5)
    np.testing.assert_allclose(
        float(out.x_map["scales"]["sigma"]), 0.5, atol=1e-5
    )
    draws = np.asarray(out.samples["beta"]).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(0), mu, atol=0.15)
    assert out.names == ("beta[0]", "beta[1]", "scales.sigma")
    # the flat surface carries the summary/diagnostics story
    s = qnm.posterior_summary(out.flat.samples)
    tbl = s.table(names=list(out.names))
    assert "scales.sigma" in tbl
    assert out.flat.diagnostics is not None


def test_pytree_names_shapes():
    names = qnm.pytree_names(
        {"A": jnp.zeros((2, 2)), "b": jnp.asarray(1.0)}
    )
    assert names == ["A[0,0]", "A[0,1]", "A[1,0]", "A[1,1]", "b"]
