"""Microcanonical Langevin Monte Carlo: correctness of the isokinetic
dynamics, the fleet-native (eps, L) tuning, the bias-vs-target contract,
and the library's resume/failure conventions.

MCLMC is unadjusted — its correctness bar is not MH exactness but a
CONTROLLED discretization bias: warmup must land the per-step energy
error variance at ``desired_energy_var`` per dimension, and the moment
bias must shrink when that target is tightened (the convergence-order
probe). The algebraic core (the closed-form velocity update on the unit
sphere) is pinned against its small-step ODE limit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.mclmc import (
    _mom_update,
    mclmc_sample,
    mclmc_sample_from_state,
)


def test_mom_update_unit_norm_and_ode_limit():
    """The closed-form velocity update stays on the sphere exactly and
    matches du/dt = P_perp(u) g/(d-1) to first order in dt."""
    rng = np.random.default_rng(0)
    u = rng.standard_normal((5, 8))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    g = rng.standard_normal((5, 8))
    dt = 1e-6
    u_new, dk = _mom_update(jnp.asarray(dt), jnp.asarray(u), jnp.asarray(g))
    u_new = np.asarray(u_new)
    np.testing.assert_allclose(
        np.linalg.norm(u_new, axis=1), 1.0, rtol=1e-12
    )
    proj = g - (u * g).sum(1, keepdims=True) * u  # P_perp(u) g
    expected = u + dt * proj / (8 - 1)
    expected /= np.linalg.norm(expected, axis=1, keepdims=True)
    np.testing.assert_allclose(u_new, expected, atol=1e-10)
    # zero gradient: identity with zero kinetic change
    u2, dk2 = _mom_update(jnp.asarray(0.1), jnp.asarray(u),
                          jnp.zeros((5, 8)))
    np.testing.assert_allclose(np.asarray(u2), u, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dk2), 0.0, atol=1e-12)


def test_standard_gaussian_moments_and_energy_target():
    def logd(x):
        return -0.5 * jnp.sum(x * x)

    n, chains = 16, 256
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (chains, n))
    r = mclmc_sample(logd, key, x0, n_samples=2000, n_warmup=600)
    s = np.asarray(r.samples).reshape(-1, n)
    # unadjusted: generous-but-meaningful bars at the default 5e-4 target
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.05)
    assert 0.94 < s.var(0).min() and s.var(0).max() < 1.06
    # warmup landed the energy-error variance at its target (within the
    # EMA's slack) and nothing diverged
    assert float(r.energy_var) < 5e-4 * 4
    assert int(np.asarray(r.divergences).sum()) == 0
    assert np.asarray(r.energy_changes).shape == (2000, chains)
    assert float(r.step_size) > 0 and float(r.L) > 0


def test_bias_shrinks_with_energy_target():
    """The convergence-order probe: tightening desired_energy_var must
    tighten the variance bias (O(eps^2), varE ~ eps^6)."""
    def logd(x):
        return -0.5 * jnp.sum(x * x)

    n, chains = 8, 512
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (chains, n))
    biases = {}
    for tgt in (5e-3, 5e-6):
        r = mclmc_sample(logd, key, x0, n_samples=1200, n_warmup=500,
                         desired_energy_var=tgt)
        v = np.asarray(r.samples).reshape(-1, n).var(0).mean()
        biases[tgt] = abs(v - 1.0)
    assert biases[5e-6] < biases[5e-3]
    assert biases[5e-6] < 0.02


def test_adapt_mass_ill_scaled_gaussian():
    scales = jnp.asarray(np.geomspace(0.1, 10.0, 6))

    def logd(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    key = jax.random.PRNGKey(2)
    x0 = jax.random.normal(key, (512, 6)) * scales
    r = mclmc_sample(logd, key, x0, n_samples=2500, n_warmup=800,
                     adapt_mass=True)
    s = np.asarray(r.samples).reshape(-1, 6)
    ratio = s.var(0) / np.asarray(scales) ** 2
    assert np.all(ratio > 0.85) and np.all(ratio < 1.15), ratio
    # the learned preconditioner tracks the marginal scales
    m = np.asarray(r.mass_diag)
    assert np.all(np.abs(np.log(m / np.asarray(scales) ** 2)) < 1.0)


def test_explicit_mass_diag_and_dense():
    scales = jnp.asarray([0.2, 1.0, 5.0])

    def logd(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, (256, 3)) * scales
    md = scales**2
    r_diag = mclmc_sample(logd, key, x0, mass=md, n_samples=1500,
                          n_warmup=400)
    r_dense = mclmc_sample(logd, key, x0, mass=jnp.diag(md),
                           n_samples=1500, n_warmup=400)
    # a dense mass contributes exactly its diagonal
    np.testing.assert_array_equal(
        np.asarray(r_diag.samples), np.asarray(r_dense.samples)
    )
    v = np.asarray(r_diag.samples).reshape(-1, 3).var(0)
    ratio = v / np.asarray(scales) ** 2
    assert np.all(ratio > 0.85) and np.all(ratio < 1.15), ratio


def test_chunked_resume_identity():
    def logd(x):
        return -0.5 * jnp.sum(x * x)

    key = jax.random.PRNGKey(4)
    x0 = jax.random.normal(key, (32, 5))
    r_long = mclmc_sample(logd, key, x0, n_samples=300, n_warmup=200)
    r1 = mclmc_sample(logd, key, x0, n_samples=100, n_warmup=200)
    r2 = mclmc_sample_from_state(logd, r1.state, n_samples=200)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(r1.samples), np.asarray(r2.samples)]),
        np.asarray(r_long.samples),
    )
    # warmup split mid-adaptation replays too (the plan is announced)
    ra = mclmc_sample(logd, key, x0, n_samples=0, n_warmup=120,
                      total_warmup=200)
    rb = mclmc_sample_from_state(logd, ra.state, n_samples=100,
                                 n_warmup=80)
    rw = mclmc_sample(logd, key, x0, n_samples=100, n_warmup=200)
    np.testing.assert_array_equal(
        np.asarray(rb.samples), np.asarray(rw.samples)
    )
    with pytest.raises(ValueError, match="warmup after sampling"):
        mclmc_sample_from_state(logd, r1.state, n_samples=1, n_warmup=1)
    with pytest.raises(ValueError, match="plan exceeded"):
        mclmc_sample_from_state(logd, ra.state, n_warmup=200)
    with pytest.raises(ValueError, match="before the announced"):
        mclmc_sample(logd, key, x0, n_samples=10, n_warmup=10,
                     total_warmup=20)


def test_checkpoint_roundtrip(tmp_path):
    from quasinewtonmethods_jl_tpu.utils.checkpoint import (
        load_state,
        save_state,
    )

    def logd(x):
        return -0.5 * jnp.sum(x * x)

    key = jax.random.PRNGKey(5)
    x0 = jax.random.normal(key, (16, 4))
    r1 = mclmc_sample(logd, key, x0, n_samples=50, n_warmup=60)
    path = tmp_path / "mclmc_state"
    save_state(path, r1.state)
    st = load_state(path)
    r2a = mclmc_sample_from_state(logd, r1.state, n_samples=50)
    r2b = mclmc_sample_from_state(logd, st, n_samples=50)
    np.testing.assert_array_equal(
        np.asarray(r2a.samples), np.asarray(r2b.samples)
    )


def test_bounce_keeps_fleet_finite():
    """A hard support boundary (-inf outside a ball): chains bounce
    in-band, everything stays finite, divergences are counted."""
    def bounded(x):
        r2 = jnp.sum(x * x)
        return jnp.where(r2 < 4.0, -0.5 * r2, -jnp.inf)

    key = jax.random.PRNGKey(6)
    x0 = 0.1 * jax.random.normal(key, (128, 4))
    r = mclmc_sample(bounded, key, x0, n_samples=500, n_warmup=300)
    s = np.asarray(r.samples)
    assert np.isfinite(s).all()
    assert np.sqrt((s**2).sum(-1)).max() <= 2.0 + 1e-6


def test_pipeline_and_registry():
    """map_then_sample(sampler='mclmc') hands the MAP mass diagonal to
    the sampler and the registry resolves the name."""
    from quasinewtonmethods_jl_tpu.sampling import get_sampler

    assert get_sampler("mclmc") is not None

    def logd(x):
        return -0.5 * jnp.sum((x - 1.0) ** 2)

    out = qnm.map_then_sample(
        logd, jax.random.PRNGKey(7), jnp.zeros(4), n_chains=32,
        n_samples=400, n_warmup=200, sampler="mclmc",
    )
    assert out.samples.shape == (400, 32, 4)
    pooled = np.asarray(out.samples).reshape(-1, 4)
    np.testing.assert_allclose(pooled.mean(0), 1.0, atol=0.1)
    assert int(np.asarray(out.sampler_result.divergences).sum()) == 0


def test_f32_stays_f32():
    def logd(x):
        return -0.5 * jnp.sum(x * x)

    key = jax.random.PRNGKey(8)
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((64, 4)), jnp.float32
    )
    r = mclmc_sample(logd, key, x0, n_samples=50, n_warmup=50)
    assert r.samples.dtype == jnp.float32
    assert r.step_size.dtype == jnp.float32


def test_input_validation():
    def logd(x):
        return -0.5 * jnp.sum(x * x)

    key = jax.random.PRNGKey(9)
    with pytest.raises(ValueError, match="chains, n"):
        mclmc_sample(logd, key, jnp.zeros(4))
    with pytest.raises(ValueError, match="n >= 2"):
        mclmc_sample(logd, key, jnp.zeros((8, 1)))
    with pytest.raises(ValueError, match="desired_energy_var"):
        mclmc_sample(logd, key, jnp.zeros((8, 4)), desired_energy_var=0.0)
    with pytest.raises(ValueError, match="not both"):
        mclmc_sample(logd, key, jnp.zeros((8, 4)), mass=jnp.ones(4),
                     adapt_mass=True)
    with pytest.raises(ValueError, match="step_size"):
        mclmc_sample(logd, key, jnp.zeros((8, 4)), step_size=-1.0)


def test_mclmc_sharded():
    """Chains shard over the mesh. The warmup's fleet tuning
    (mean ΔE², fleet variance) all-reduces under GSPMD, so its fp
    reduction order differs from the unsharded program — the warmup
    invariant is statistical (the convention the ChEES mesh test set).
    The SAMPLING phase has no cross-chain reductions, so from a shared
    warmed state it must be bitwise layout-invariant."""
    from quasinewtonmethods_jl_tpu.parallel import make_mesh, sample_sharded

    def logd(x):
        return -0.5 * jnp.sum(x * x)

    key = jax.random.PRNGKey(7)
    mesh = make_mesh({"data": 8})

    # full run under the mesh: correct moments, healthy dials
    r = sample_sharded(
        logd, key, jnp.zeros((32, 4)), mesh, sampler="mclmc",
        n_samples=800, n_warmup=400,
    )
    draws = np.asarray(r.samples).reshape(-1, 4)
    np.testing.assert_allclose(draws.mean(axis=0), 0.0, atol=0.12)
    np.testing.assert_allclose(draws.var(axis=0), 1.0, atol=0.2)
    assert int(np.asarray(r.divergences).sum()) == 0

    # sampling phase from one warmed state: bitwise on both layouts
    x0s = jnp.asarray(np.random.default_rng(7).standard_normal((16, 4)))
    warm = mclmc_sample(logd, key, x0s, n_samples=0, n_warmup=60)
    r_un = mclmc_sample_from_state(logd, warm.state, n_samples=50)
    st_sh = warm.state._replace(
        x=jax.device_put(
            warm.state.x,
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data", None)
            ),
        )
    )
    with mesh:
        r_sh = mclmc_sample_from_state(logd, st_sh, n_samples=50)
    np.testing.assert_array_equal(
        np.asarray(r_sh.samples), np.asarray(r_un.samples)
    )


def test_out_of_support_start_enters():
    """Chains starting where f = -inf (outside the support) must be able
    to ENTER once a step lands on a finite point (the ensemble sampler's
    out-of-support convention), not bounce forever."""
    def bounded(x):
        r2 = jnp.sum(x * x)
        return jnp.where(r2 < 4.0, -0.5 * r2, -jnp.inf)

    key = jax.random.PRNGKey(13)
    # all chains start just OUTSIDE the ball (|x| = 2.1 > 2): entry is
    # ballistic (no gradient outside), so it is only reliable for starts
    # within reach of the support — the documented contract
    x0 = (2.1 / 2.0) * jnp.ones((64, 4))
    r = mclmc_sample(bounded, key, x0, n_samples=400, n_warmup=300)
    s = np.asarray(r.samples)
    assert np.isfinite(s).all()
    # entry is best-effort (the outside walk is ballistic — unreached
    # chains may wander; start chains in or near the support): the bulk
    # of the fleet must have entered, and entered chains stay inside
    final_r = np.sqrt((np.asarray(r.final_x) ** 2).sum(-1))
    assert (final_r < 2.0).mean() > 0.55
    entered_at = np.sqrt((s**2).sum(-1)) < 2.0  # (draws, chains)
    # once inside, never outside again (the reflection contract)
    ever_in = np.maximum.accumulate(entered_at, axis=0)
    assert not np.any(ever_in[:-1] & ~entered_at[1:])
