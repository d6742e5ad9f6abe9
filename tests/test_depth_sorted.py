"""Tests for nuts_sample_depth_sorted (round-4 depth-compaction feature)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import funnel_logdensity
from quasinewtonmethods_jl_tpu.sampling import _nuts_take_chains


def _warm_state(logd, chains, n, warmup=60, seed=0, max_depth=6):
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.standard_normal((chains, n)) * 0.5)
    r = qnm.nuts_sample(
        logd, jax.random.PRNGKey(seed), x0, n_samples=0, n_warmup=warmup,
        total_warmup=warmup, max_depth=max_depth,
    )
    return r.state


def _std_normal(x):
    return -0.5 * jnp.sum(x * x)


def test_fallback_bitwise_identical_to_plain_run():
    """When the probe says don't sort, the full output (samples, state)
    must be bitwise what a single plain run of n_samples produces."""
    st = _warm_state(_std_normal, chains=16, n=3)
    res, info = qnm.nuts_sample_depth_sorted(
        _std_normal, st, n_samples=20, probe_draws=4,
        min_persistence=2.0,  # unreachable: always fall back
        max_depth=6,
    )
    assert info.sorted is False
    plain = qnm.nuts_sample_from_state(
        _std_normal, st, n_samples=20, max_depth=6
    )
    np.testing.assert_array_equal(
        np.asarray(res.samples), np.asarray(plain.samples)
    )
    np.testing.assert_array_equal(
        np.asarray(res.state.x), np.asarray(plain.state.x)
    )
    assert int(res.state.i_samp) == int(plain.state.i_samp)


def test_small_budget_degenerates_to_plain_run():
    """Without warmup telemetry (pre-telemetry checkpoint), a budget too
    small for two probe legs degenerates to one plain run."""
    st = _warm_state(_std_normal, chains=8, n=2)
    st = st._replace(warm_dsum=None)
    res, info = qnm.nuts_sample_depth_sorted(
        _std_normal, st, n_samples=6, probe_draws=4, max_depth=6
    )
    assert info.sorted is False
    assert res.samples.shape[0] == 6


def test_sorted_path_matches_hand_composition():
    """Force the sorted path on the funnel (warmup-telemetry route — no
    probe legs spent) and pin the sort/scatter/merge machinery bitwise
    against a hand-built composition from the same telemetry."""
    from quasinewtonmethods_jl_tpu.sampling import _warm_depth_windows

    chains, n, draws, groups = 24, 4, 28, 3
    st = _warm_state(funnel_logdensity, chains, n, warmup=80, seed=3)
    assert st.warm_dsum is not None
    res, info = qnm.nuts_sample_depth_sorted(
        funnel_logdensity, st, n_samples=draws,
        groups=groups, min_persistence=-2.0, min_depth_spread=0.0,
        max_depth=6,
    )
    assert info.sorted is True
    assert res.samples.shape == (draws, chains, n)
    assert info.group_sizes == (8, 8, 8)

    # hand composition: sort key = the warmup tail window-2 mean depth
    _w1s, _w2s, _w2e, W = _warm_depth_windows(int(st.n_warmup_total))
    d2 = np.asarray(st.warm_dsum, dtype=np.float64)[1] / W
    order = np.argsort(d2, kind="stable")
    parts = []
    for gi, idx in enumerate(np.array_split(order, groups)):
        sub = _nuts_take_chains(st, jnp.asarray(idx))
        sub = sub._replace(key=jax.random.fold_in(st.key, 2 + gi))
        parts.append(
            qnm.nuts_sample_from_state(
                funnel_logdensity, sub, n_samples=draws, max_depth=6
            )
        )
    inv = np.empty_like(order)
    inv[order] = np.arange(chains)
    expected = jnp.take(
        jnp.concatenate([r.samples for r in parts], axis=1),
        jnp.asarray(inv), axis=1,
    )
    np.testing.assert_array_equal(
        np.asarray(res.samples), np.asarray(expected)
    )
    # merged state: per-chain fields scattered back, parent key kept,
    # telemetry preserved in original chain order
    fx = jnp.take(
        jnp.concatenate([r.state.x for r in parts]), jnp.asarray(inv),
        axis=0,
    )
    np.testing.assert_array_equal(np.asarray(res.state.x), np.asarray(fx))
    np.testing.assert_array_equal(
        np.asarray(res.state.key), np.asarray(st.key)
    )
    np.testing.assert_array_equal(
        np.asarray(res.state.warm_dsum), np.asarray(st.warm_dsum)
    )
    assert int(res.state.i_samp) == int(st.i_samp) + draws


def test_probe_leg_fallback_without_telemetry():
    """A pre-telemetry state (warm_dsum=None) still sorts via the two
    explicit probe legs, bitwise-reproducible by hand composition."""
    chains, n, draws, probe, groups = 16, 3, 20, 4, 2
    st0 = _warm_state(funnel_logdensity, chains, n, warmup=60, seed=9)
    st = st0._replace(warm_dsum=None)
    res, info = qnm.nuts_sample_depth_sorted(
        funnel_logdensity, st, n_samples=draws, probe_draws=probe,
        groups=groups, min_persistence=-2.0, min_depth_spread=0.0,
        max_depth=6,
    )
    assert info.sorted is True
    assert res.samples.shape == (draws, chains, n)
    p1 = qnm.nuts_sample_from_state(
        funnel_logdensity, st, n_samples=probe, max_depth=6
    )
    p2 = qnm.nuts_sample_from_state(
        funnel_logdensity, p1.state, n_samples=probe, max_depth=6
    )
    d2 = np.asarray(p2.mean_tree_depth, dtype=np.float64)
    order = np.argsort(d2, kind="stable")
    remaining = draws - 2 * probe
    parts = []
    for gi, idx in enumerate(np.array_split(order, groups)):
        sub = _nuts_take_chains(p2.state, jnp.asarray(idx))
        sub = sub._replace(key=jax.random.fold_in(p2.state.key, 2 + gi))
        parts.append(
            qnm.nuts_sample_from_state(
                funnel_logdensity, sub, n_samples=remaining, max_depth=6
            )
        )
    inv = np.empty_like(order)
    inv[order] = np.arange(chains)
    main = jnp.take(
        jnp.concatenate([r.samples for r in parts], axis=1),
        jnp.asarray(inv), axis=1,
    )
    expected = jnp.concatenate([p1.samples, p2.samples, main])
    np.testing.assert_array_equal(
        np.asarray(res.samples), np.asarray(expected)
    )


def test_warmup_depth_telemetry_chunked_equals_long():
    """warm_dsum rides the resume discipline: chunked warmup reproduces
    the long run's telemetry exactly (windows indexed by absolute round)."""
    x0 = jnp.asarray(
        np.random.default_rng(2).standard_normal((12, 3)) * 0.5
    )
    l = qnm.nuts_sample(funnel_logdensity, jax.random.PRNGKey(0), x0,
                        n_samples=0, n_warmup=60, total_warmup=60,
                        max_depth=6)
    c1 = qnm.nuts_sample(funnel_logdensity, jax.random.PRNGKey(0), x0,
                         n_samples=0, n_warmup=33, total_warmup=60,
                         max_depth=6)
    c2 = qnm.nuts_sample_from_state(funnel_logdensity, c1.state,
                                    n_warmup=27, max_depth=6)
    np.testing.assert_array_equal(
        np.asarray(l.state.warm_dsum), np.asarray(c2.state.warm_dsum)
    )
    assert float(l.state.warm_dsum.sum()) > 0


def test_sorted_state_resumes():
    st = _warm_state(funnel_logdensity, 12, 3, warmup=60, seed=5)
    res, info = qnm.nuts_sample_depth_sorted(
        funnel_logdensity, st, n_samples=16, probe_draws=3, groups=2,
        min_persistence=-2.0, min_depth_spread=0.0, max_depth=5,
    )
    assert info.sorted is True
    cont = qnm.nuts_sample_from_state(
        funnel_logdensity, res.state, n_samples=4, max_depth=5
    )
    assert cont.samples.shape == (4, 12, 3)
    assert bool(jnp.all(jnp.isfinite(cont.samples)))


def test_requires_completed_warmup():
    st = _warm_state(_std_normal, 8, 2, warmup=20)
    partial = qnm.nuts_sample(
        _std_normal, jax.random.PRNGKey(0),
        jnp.zeros((8, 2)), n_samples=0, n_warmup=10, total_warmup=20,
    )
    with pytest.raises(ValueError, match="completed warmup"):
        qnm.nuts_sample_depth_sorted(
            _std_normal, partial.state, n_samples=8
        )
    del st


def test_group_count_validation():
    st = _warm_state(_std_normal, 8, 2)
    with pytest.raises(ValueError, match="exceeds the chain count"):
        qnm.nuts_sample_depth_sorted(
            _std_normal, st, n_samples=8, groups=9
        )
    with pytest.raises(ValueError, match="groups must be"):
        qnm.nuts_sample_depth_sorted(
            _std_normal, st, n_samples=8, groups=0
        )


def test_sorted_moments_match_plain_run():
    """Statistical sanity on the sorted path: its v-marginal moments
    must agree with the PLAIN full-fleet run from the same state at the
    same budget (short funnel runs are biased toward positive v — a
    known pathology both paths share, so absolute truth bars would test
    the sampler, not the sorter; this comparison guards against
    cross-fleet key correlation or scatter bugs specifically)."""
    chains, n = 128, 3
    st = _warm_state(funnel_logdensity, chains, n, warmup=150, seed=7)
    plain = qnm.nuts_sample_from_state(
        funnel_logdensity, st, n_samples=160, max_depth=7
    )
    res, info = qnm.nuts_sample_depth_sorted(
        funnel_logdensity, st, n_samples=160, groups=4,
        min_persistence=-2.0, min_depth_spread=0.0, max_depth=7,
    )
    assert info.sorted
    vp = np.asarray(plain.samples[:, :, 0]).ravel()
    vs = np.asarray(res.samples[:, :, 0]).ravel()
    assert abs(vs.mean() - vp.mean()) < 0.5, (vs.mean(), vp.mean())
    assert 0.5 < vs.var() / vp.var() < 2.0, (vs.var(), vp.var())
