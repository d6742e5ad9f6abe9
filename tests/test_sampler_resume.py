"""Sampler checkpoint/resume: chunked warmup+sampling must be
trajectory-identical to one long run (the same test discipline the
optimizer fleets got for `*_from_state` in round 2, one level up —
VERDICT round-2 item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.utils.checkpoint import load_state, save_state


def _logd(t):
    return -0.5 * jnp.sum(t * t * jnp.array([1.0, 4.0, 0.25]))


_X0 = None


def _x0():
    global _X0
    if _X0 is None:
        _X0 = jnp.asarray(np.random.default_rng(0).standard_normal((16, 3)))
    return _X0


def _assert_tree_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hmc_chunked_equals_long():
    key = jax.random.PRNGKey(0)
    long = qnm.hmc_sample(_logd, key, _x0(), n_samples=40, n_warmup=30)
    r1 = qnm.hmc_sample(_logd, key, _x0(), n_samples=0, n_warmup=18)
    r2 = qnm.hmc_sample_from_state(_logd, r1.state, n_samples=15, n_warmup=12)
    r3 = qnm.hmc_sample_from_state(_logd, r2.state, n_samples=25)
    cat = jnp.concatenate([r2.samples, r3.samples], axis=0)
    _assert_tree_equal(long.samples, cat)
    _assert_tree_equal(long.final_x, r3.final_x)
    _assert_tree_equal(long.step_size, r3.step_size)


def test_chees_chunked_equals_long():
    key = jax.random.PRNGKey(1)
    long = qnm.chees_sample(_logd, key, _x0(), n_samples=40, n_warmup=30)
    r1 = qnm.chees_sample(
        _logd, key, _x0(), n_samples=0, n_warmup=18, total_warmup=30
    )
    r2 = qnm.chees_sample_from_state(
        _logd, r1.state, n_samples=15, n_warmup=12
    )
    r3 = qnm.chees_sample_from_state(_logd, r2.state, n_samples=25)
    cat = jnp.concatenate([r2.samples, r3.samples], axis=0)
    _assert_tree_equal(long.samples, cat)
    _assert_tree_equal(long.final_x, r3.final_x)
    # adaptation state replays exactly too (Halton offset, mass freeze)
    _assert_tree_equal(long.traj_length, r3.traj_length)
    _assert_tree_equal(long.mass_diag, r3.mass_diag)
    _assert_tree_equal(long.step_size, r3.step_size)


def test_nuts_chunked_equals_long():
    key = jax.random.PRNGKey(2)
    long = qnm.nuts_sample(_logd, key, _x0(), n_samples=30, n_warmup=20)
    r1 = qnm.nuts_sample(
        _logd, key, _x0(), n_samples=0, n_warmup=12, total_warmup=20
    )
    r2 = qnm.nuts_sample_from_state(_logd, r1.state, n_samples=10, n_warmup=8)
    r3 = qnm.nuts_sample_from_state(_logd, r2.state, n_samples=20)
    cat = jnp.concatenate([r2.samples, r3.samples], axis=0)
    _assert_tree_equal(long.samples, cat)
    _assert_tree_equal(long.final_x, r3.final_x)
    _assert_tree_equal(long.mass_diag, r3.mass_diag)


def test_sampler_state_checkpoint_roundtrip(tmp_path):
    """save_state/load_state round-trips all three sampler states and the
    resumed trajectories match the un-serialized resume exactly."""
    key = jax.random.PRNGKey(3)
    runs = {
        "hmc": qnm.hmc_sample(_logd, key, _x0(), n_samples=0, n_warmup=10),
        "chees": qnm.chees_sample(
            _logd, key, _x0(), n_samples=0, n_warmup=6, total_warmup=10
        ),
        "nuts": qnm.nuts_sample(
            _logd, key, _x0(), n_samples=0, n_warmup=6, total_warmup=10
        ),
    }
    resume = {
        "hmc": qnm.hmc_sample_from_state,
        "chees": qnm.chees_sample_from_state,
        "nuts": qnm.nuts_sample_from_state,
    }
    warm_left = {"hmc": 0, "chees": 4, "nuts": 4}
    for name, r in runs.items():
        p = tmp_path / name
        save_state(p, r.state)
        st = load_state(p)
        assert type(st).__name__ == type(r.state).__name__
        a = resume[name](_logd, st, n_samples=8, n_warmup=warm_left[name])
        b = resume[name](
            _logd, r.state, n_samples=8, n_warmup=warm_left[name]
        )
        _assert_tree_equal(a.samples, b.samples)


def test_resume_lowrank_mode_mismatch_rejected():
    """The round-3 advisor guard extends to 'lowrank': a saved lowrank
    state (lr_Q set) resumed under the default 'diag' (or 'dense') must
    raise; the correct re-pass works."""
    key = jax.random.PRNGKey(9)
    lr = qnm.chees_sample(
        _logd, key, _x0(), n_samples=0, n_warmup=4, total_warmup=10,
        adapt_mass="lowrank", mass_rank=2,
    )
    assert lr.state.lr_Q is not None
    with pytest.raises(ValueError, match="does not match the saved"):
        qnm.chees_sample_from_state(_logd, lr.state, n_warmup=3)
    with pytest.raises(ValueError, match="does not match the saved"):
        qnm.chees_sample_from_state(
            _logd, lr.state, n_warmup=3, adapt_mass="dense"
        )
    qnm.chees_sample_from_state(
        _logd, lr.state, n_warmup=3, adapt_mass="lowrank"
    )
    # and the reverse direction: a diag state resumed under 'lowrank'
    diag = qnm.chees_sample(
        _logd, key, _x0(), n_samples=0, n_warmup=4, total_warmup=10
    )
    with pytest.raises(ValueError, match="does not match the saved"):
        qnm.chees_sample_from_state(
            _logd, diag.state, n_warmup=3, adapt_mass="lowrank"
        )


def test_lowrank_state_checkpoint_roundtrip(tmp_path):
    """lr_Q/lr_sig ride save_state/load_state; a non-lowrank state saves
    its None optional fields by omission and restores the NamedTuple
    default (also the forward-compat path for pre-round-4 checkpoints)."""
    key = jax.random.PRNGKey(10)
    lr = qnm.chees_sample(
        _logd, key, _x0(), n_samples=0, n_warmup=6, total_warmup=10,
        adapt_mass="lowrank", mass_rank=2,
    )
    p = tmp_path / "lr"
    save_state(p, lr.state)
    st = load_state(p)
    _assert_tree_equal(st.lr_Q, lr.state.lr_Q)
    _assert_tree_equal(st.lr_sig, lr.state.lr_sig)
    a = qnm.chees_sample_from_state(
        _logd, st, n_samples=8, n_warmup=4, adapt_mass="lowrank"
    )
    b = qnm.chees_sample_from_state(
        _logd, lr.state, n_samples=8, n_warmup=4, adapt_mass="lowrank"
    )
    _assert_tree_equal(a.samples, b.samples)

    diag = qnm.chees_sample(
        _logd, key, _x0(), n_samples=0, n_warmup=4, total_warmup=10
    )
    p2 = tmp_path / "diag"
    save_state(p2, diag.state)
    st2 = load_state(p2)
    assert st2.lr_Q is None and st2.lr_sig is None


def test_nuts_lowrank_resume_guard_and_checkpoint(tmp_path):
    """The lowrank resume-mode guard and checkpoint round-trip cover
    NUTS too (round 4: adapt_mass='lowrank' extended from ChEES)."""
    key = jax.random.PRNGKey(11)
    lr = qnm.nuts_sample(
        _logd, key, _x0(), n_samples=0, n_warmup=4, total_warmup=10,
        adapt_mass="lowrank", mass_rank=2,
    )
    assert lr.state.lr_Q is not None
    with pytest.raises(ValueError, match="does not match the saved"):
        qnm.nuts_sample_from_state(_logd, lr.state, n_warmup=3)
    p = tmp_path / "nuts_lr"
    save_state(p, lr.state)
    st = load_state(p)
    _assert_tree_equal(st.lr_Q, lr.state.lr_Q)
    a = qnm.nuts_sample_from_state(
        _logd, st, n_samples=6, n_warmup=6, adapt_mass="lowrank"
    )
    b = qnm.nuts_sample_from_state(
        _logd, lr.state, n_samples=6, n_warmup=6, adapt_mass="lowrank"
    )
    _assert_tree_equal(a.samples, b.samples)


def test_typed_prng_key_checkpoint(tmp_path):
    """Typed keys (jax.random.key) survive the .npz round-trip."""
    r = qnm.hmc_sample(
        _logd, jax.random.key(7), _x0(), n_samples=0, n_warmup=5
    )
    p = tmp_path / "typed"
    save_state(p, r.state)
    st = load_state(p)
    a = qnm.hmc_sample_from_state(_logd, st, n_samples=6)
    b = qnm.hmc_sample_from_state(_logd, r.state, n_samples=6)
    _assert_tree_equal(a.samples, b.samples)


def test_phase_guards():
    key = jax.random.PRNGKey(4)
    r = qnm.chees_sample(_logd, key, _x0(), n_samples=5, n_warmup=5)
    with pytest.raises(ValueError, match="after sampling"):
        qnm.chees_sample_from_state(_logd, r.state, n_warmup=3)
    r0 = qnm.chees_sample(
        _logd, key, _x0(), n_samples=0, n_warmup=3, total_warmup=10
    )
    with pytest.raises(ValueError, match="plan exceeded"):
        qnm.chees_sample_from_state(_logd, r0.state, n_warmup=20)
    with pytest.raises(ValueError, match="before the announced"):
        qnm.chees_sample_from_state(_logd, r0.state, n_samples=2, n_warmup=1)
    with pytest.raises(ValueError, match="before the announced"):
        qnm.chees_sample(
            _logd, key, _x0(), n_samples=2, n_warmup=3, total_warmup=10
        )
    with pytest.raises(ValueError, match="exceeds total_warmup"):
        qnm.nuts_sample(
            _logd, key, _x0(), n_samples=0, n_warmup=30, total_warmup=10
        )
    with pytest.raises(ValueError, match="after sampling"):
        qnm.hmc_sample_from_state(
            _logd,
            qnm.hmc_sample(
                _logd, key, _x0(), n_samples=3, n_warmup=2
            ).state,
            n_warmup=1,
        )


def test_resume_respects_mass_freeze_schedule():
    """The EMA freeze step is pinned by the FIRST call's plan: a chunked
    ChEES warmup crossing the freeze boundary must freeze at the same
    global step as the long run (regression for the n_warmup//2-per-chunk
    bug this design avoids)."""
    key = jax.random.PRNGKey(5)
    long = qnm.chees_sample(_logd, key, _x0(), n_samples=0, n_warmup=20)
    r1 = qnm.chees_sample(
        _logd, key, _x0(), n_samples=0, n_warmup=7, total_warmup=20
    )
    # crosses the freeze step (20 // 2 = 10) mid-chunk
    r2 = qnm.chees_sample_from_state(_logd, r1.state, n_warmup=13)
    _assert_tree_equal(long.state.var_ema, r2.state.var_ema)
    _assert_tree_equal(long.state.log_T, r2.state.log_T)


def test_resume_mass_mode_mismatch_rejected():
    """Resuming an adapt_mass='dense' run without re-passing 'dense' (the
    default resolves to 'diag') must raise instead of silently
    row-broadcasting the (n,) fleet variance into the (n, n) covariance
    EMA during remaining warmup (advisor round-3 medium finding). Both
    directions and both samplers."""
    key = jax.random.PRNGKey(6)
    dense = qnm.chees_sample(
        _logd, key, _x0(), n_samples=0, n_warmup=4, total_warmup=10,
        adapt_mass="dense",
    )
    with pytest.raises(ValueError, match="does not match the saved"):
        qnm.chees_sample_from_state(_logd, dense.state, n_warmup=3)
    with pytest.raises(ValueError, match="does not match the saved"):
        qnm.chees_sample_from_state(
            _logd, dense.state, n_warmup=3, adapt_mass="diag"
        )
    # the correct re-pass still works
    qnm.chees_sample_from_state(
        _logd, dense.state, n_warmup=3, adapt_mass="dense"
    )

    diag = qnm.nuts_sample(
        _logd, key, _x0(), n_samples=0, n_warmup=4, total_warmup=10
    )
    with pytest.raises(ValueError, match="does not match the saved"):
        qnm.nuts_sample_from_state(
            _logd, diag.state, n_warmup=3, adapt_mass="dense"
        )
    qnm.nuts_sample_from_state(_logd, diag.state, n_warmup=3)

    dense_n = qnm.nuts_sample(
        _logd, key, _x0(), n_samples=0, n_warmup=4, total_warmup=10,
        adapt_mass="dense",
    )
    with pytest.raises(ValueError, match="does not match the saved"):
        qnm.nuts_sample_from_state(_logd, dense_n.state, n_warmup=3)
