"""Checkpoint/resume and stats-utility tests."""

import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity
from quasinewtonmethods_jl_tpu.utils import load_state, save_state, solve_stats


def test_bfgs_checkpoint_roundtrip_and_resume(tmp_path, rng):
    x0 = jnp.asarray(rng.standard_normal(10))
    part = qnm.optimize(rosenbrock_logdensity, x0, max_iterations=5)
    p = tmp_path / "state.npz"
    save_state(p, part.state)

    restored = load_state(p, qnm.BFGSState)
    for a, b in zip(part.state, restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    res = qnm.optimize_from_state(rosenbrock_logdensity, restored)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, rtol=1e-5)


def test_lbfgs_checkpoint_roundtrip_and_resume(tmp_path, rng):
    x0 = jnp.asarray(rng.standard_normal(12))
    part = qnm.optimize_lbfgs(rosenbrock_logdensity, x0, max_iterations=6)
    p = tmp_path / "lbfgs.npz"
    save_state(p, part.state)
    restored = load_state(p)
    assert isinstance(restored, qnm.LBFGSState)
    res = qnm.optimize_lbfgs_from_state(rosenbrock_logdensity, restored)
    assert bool(res.converged)


def test_checkpoint_class_mismatch_rejected(tmp_path, rng):
    x0 = jnp.asarray(rng.standard_normal(4))
    part = qnm.optimize(rosenbrock_logdensity, x0, max_iterations=2)
    p = tmp_path / "state.npz"
    save_state(p, part.state)
    with pytest.raises(TypeError):
        load_state(p, qnm.LBFGSState)


def test_save_rejects_non_state(tmp_path):
    with pytest.raises(TypeError):
        save_state(tmp_path / "x.npz", (1, 2, 3))


def test_solve_stats(rng):
    x0 = jnp.asarray(rng.standard_normal(6))
    res = qnm.optimize(rosenbrock_logdensity, x0)
    st = solve_stats(res)
    assert st["converged_fraction"] == 1.0
    assert st["n_fev_total"] >= st["n_gev_total"] > 0
    assert st["iterations_max"] > 0

    X0 = jnp.asarray(rng.standard_normal((4, 6)))
    stb = solve_stats(qnm.optimize_batched(rosenbrock_logdensity, X0, backend="vmap"))
    assert stb["converged_fraction"] == 1.0


def test_practically_converged_helper(rng):
    from quasinewtonmethods_jl_tpu.utils import practically_converged

    # scalar converged result
    res = qnm.optimize(rosenbrock_logdensity, jnp.asarray(rng.standard_normal(6)))
    assert practically_converged(res, tol=1e-8)

    # batched with a hard-failed lane (NaN start): that lane must be excluded
    X0 = np.asarray(rng.standard_normal((6, 4)))
    X0[2] = np.nan
    resb = qnm.optimize_batched(rosenbrock_logdensity, jnp.asarray(X0), backend="vmap")
    mask = practically_converged(resb, tol=1e-8)
    assert mask.shape == (6,)
    assert not mask[2]
    assert mask.sum() == 5


def test_checkpoint_preserves_key_impl(tmp_path):
    """A state saved with a non-default PRNG impl (rbg) must resume under
    the SAME impl, not be silently reinterpreted as threefry (advisor
    round-3 finding): the impl name is stored alongside __key_fields__."""
    import jax
    import quasinewtonmethods_jl_tpu as qnm

    def logd(t):
        return -0.5 * jnp.sum(t * t)

    x0 = jnp.zeros((4, 3))
    r = qnm.hmc_sample(
        logd, jax.random.key(9, impl="rbg"), x0, n_samples=0, n_warmup=3
    )
    p = tmp_path / "rbg_state"
    save_state(p, r.state)
    st = load_state(p)
    assert str(jax.random.key_impl(st.key)) == "rbg"
    a = qnm.hmc_sample_from_state(logd, st, n_samples=5)
    b = qnm.hmc_sample_from_state(logd, r.state, n_samples=5)
    np.testing.assert_array_equal(np.asarray(a.samples), np.asarray(b.samples))
