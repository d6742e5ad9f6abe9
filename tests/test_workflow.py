"""One-call MAP-then-sample pipeline: end-to-end correctness + failure
handling over all three samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm


def _corr_gaussian(n):
    rng = np.random.default_rng(11)
    A = rng.standard_normal((n, n)) * 0.4
    cov = A @ A.T + np.eye(n)
    prec_j = jnp.asarray(np.linalg.inv(cov))

    def logdensity(x):
        return -0.5 * x @ (prec_j @ x)

    return logdensity, cov


@pytest.mark.parametrize("sampler", ["chees", "hmc", "nuts"])
def test_pipeline_recovers_gaussian(sampler):
    logdensity, cov = _corr_gaussian(3)
    out = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(0), jnp.full(3, 2.0),
        n_chains=32, sampler=sampler, n_samples=500, n_warmup=300,
        map_tol=1e-10,
    )
    # MAP stage: mode at 0, B ~ cov
    np.testing.assert_allclose(np.asarray(out.x_map), 0.0, atol=1e-8)
    assert np.all(
        np.asarray(out.map_result.status) == qnm.Status.CONVERGED
    )
    # sampling stage: covariance recovered, clean diagnostics
    draws = np.asarray(out.samples).reshape(-1, 3)
    np.testing.assert_allclose(
        np.cov(draws.T), cov, atol=0.35 * np.abs(cov).max()
    )
    assert np.all(out.diagnostics.rhat < 1.1)
    assert np.all(out.diagnostics.ess > 200)
    # the dense-B handoff reaches the hmc sampler
    if sampler == "hmc":
        np.testing.assert_allclose(
            np.asarray(out.mass), cov, atol=0.25 * np.abs(cov).max()
        )


def test_pipeline_explicit_starts_and_kwargs_passthrough():
    def logdensity(x):
        return -0.5 * jnp.sum(x * x)

    x0s = jnp.asarray(np.random.default_rng(1).standard_normal((8, 2)))
    out = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(1), x0s, sampler="nuts",
        n_samples=50, n_warmup=30, max_depth=5,  # sampler kwarg through
    )
    assert out.samples.shape == (50, 8, 2)
    assert float(out.sampler_result.mean_tree_depth.mean()) > 0


def test_pipeline_map_failure_is_loud():
    def nan_obj(x):
        return jnp.nan * jnp.sum(x)

    with pytest.raises(ValueError, match="NONFINITE_VALUE"):
        qnm.map_then_sample(
            nan_obj, jax.random.PRNGKey(2), jnp.zeros(3), n_chains=4,
            n_samples=5, n_warmup=5,
        )


def test_pipeline_rejects_bad_sampler_and_shape():
    f = lambda x: -jnp.sum(x * x)
    with pytest.raises(ValueError, match="sampler"):
        qnm.map_then_sample(f, jax.random.PRNGKey(0), jnp.zeros(2),
                            sampler="slice")
    with pytest.raises(ValueError, match="x0"):
        qnm.map_then_sample(f, jax.random.PRNGKey(0), jnp.zeros((2, 2, 2)))


def test_pipeline_small_sample_smoke_and_kwarg_override():
    """Regressions: (a) n_samples < 8 must return NaN-stat diagnostics,
    not crash in ess(); (b) map_kwargs/sampler_kwargs override pipeline
    defaults instead of colliding; (c) integer x0 is promoted."""
    f = lambda x: -0.5 * jnp.sum(x * x)
    out = qnm.map_then_sample(
        f, jax.random.PRNGKey(3), [0, 0],  # int list x0
        n_chains=8, n_samples=5, n_warmup=5,
        map_kwargs={"tol": 1e-8},          # collides with map_tol default
        n_leapfrog=4, sampler="hmc",       # sampler kwarg through
    )
    assert out.samples.shape == (5, 8, 2)
    assert np.all(np.isnan(out.diagnostics.rhat))
    assert np.all(np.isfinite(out.diagnostics.mean))


def test_pipeline_failed_lanes_reseeded_from_best_mode():
    """Partial MAP convergence: chains must never start at a failed
    lane's off-mode iterate. Lanes started in a NaN pocket fail; their
    chain seeds must come from the converged mode (near 0), not the
    pocket (near 100)."""
    def patchy(x):
        # NaN plateau far from the mode: lanes starting there fail
        bad = jnp.sum(x * x) > 50.0**2
        return jnp.where(bad, jnp.nan, -0.5 * jnp.sum(x * x))

    x0s = jnp.concatenate(
        [jnp.zeros((6, 2)) + 0.5, jnp.full((2, 2), 100.0)], axis=0
    )
    out = qnm.map_then_sample(
        patchy, jax.random.PRNGKey(4), x0s, n_samples=20, n_warmup=20,
    )
    st = np.asarray(out.map_result.status)
    assert (st == qnm.Status.CONVERGED).sum() == 6
    assert (st != qnm.Status.CONVERGED).sum() == 2
    # every chain's draws stay near the mode — nothing sampled at ~100
    assert np.abs(np.asarray(out.samples)).max() < 10.0


def test_single_chain_nuts_keeps_identity_metric():
    """Regression: fleet mass adaptation is meaningless for 1 chain
    (across-chain variance = 0 -> degenerate clamp); tiny fleets must
    silently keep the identity metric."""
    r = qnm.nuts_sample(
        lambda x: -0.5 * jnp.sum(x * x), jax.random.PRNGKey(5),
        jnp.zeros((1, 3)), n_samples=30, n_warmup=30,
    )
    np.testing.assert_array_equal(np.asarray(r.mass_diag), 1.0)
    assert np.isfinite(np.asarray(r.samples)).all()
    assert float(np.asarray(r.step_size)[0]) < 100.0  # not blown up


def test_pipeline_diagnostics_opt_out_keeps_samples_on_device():
    f = lambda x: -0.5 * jnp.sum(x * x)
    out = qnm.map_then_sample(
        f, jax.random.PRNGKey(6), jnp.zeros(2), n_chains=8,
        n_samples=20, n_warmup=20, compute_diagnostics=False,
    )
    assert out.diagnostics is None
    assert isinstance(out.samples, jax.Array)  # not fetched
    assert out.samples.shape == (20, 8, 2)


def test_pipeline_lbfgs_engine_large_n():
    """map_engine='lbfgs': the large-n pipeline — compact-form diag(H)
    mass, no n x n matrix anywhere — must sample a 16x-spread diagonal
    Gaussian correctly through dense-free hmc."""
    scales = jnp.asarray(np.geomspace(0.5, 8.0, 48))

    def logdensity(x):
        return -0.5 * jnp.sum(x * x / scales)

    out = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(7), jnp.zeros(48),
        n_chains=24, map_engine="lbfgs", sampler="hmc",
        n_samples=400, n_warmup=200, n_leapfrog=8, map_tol=1e-8,
    )
    assert out.mass.ndim == 1  # diagonal handoff, not dense
    draws = np.asarray(out.samples).reshape(-1, 48)
    np.testing.assert_allclose(
        draws.var(axis=0), np.asarray(scales), rtol=0.5
    )
    with pytest.raises(ValueError, match="map_engine"):
        qnm.map_then_sample(logdensity, jax.random.PRNGKey(0),
                            jnp.zeros(4), map_engine="newton")


def test_pipeline_polish_and_lowrank_mass():
    """round 3: polish_steps inserts the evidence-grade stage (polished
    modes feed the handoff) and mass_form='lowrank' hands a LowRankMass
    to the sampler (overriding self-adaptation)."""
    from quasinewtonmethods_jl_tpu.sampling import LowRankMass

    rng = np.random.default_rng(0)
    n = 8
    A = rng.standard_normal((n, n))
    C = A @ A.T / n + np.eye(n)
    Ci = jnp.asarray(np.linalg.inv(C))

    def logd(x):
        return -0.5 * x @ Ci @ x

    out = qnm.map_then_sample(
        logd, jax.random.PRNGKey(0), jnp.zeros(n), n_chains=16,
        map_engine="lbfgs", mass_form="lowrank", polish_steps=2,
        n_samples=100, n_warmup=80,
    )
    assert out.polish_result is not None
    assert isinstance(out.mass, LowRankMass)
    assert float(out.polish_result.grad_norm_after.max()) <= float(
        out.polish_result.grad_norm_before.max()
    )
    # default path: no polish stage, result field stays None
    out2 = qnm.map_then_sample(
        logd, jax.random.PRNGKey(0), jnp.zeros(n), n_chains=8,
        n_samples=16, n_warmup=16,
    )
    assert out2.polish_result is None


def test_pipeline_mesh_parity_and_validation():
    """round 4: map_then_sample(mesh=...) runs every stage sharded over
    the chains axis. Same seeds -> same draws as the unsharded pipeline
    (GSPMD partitions the identical program), and the sharded draws stay
    sharded (no gather) through the on-device diagnostics."""
    from quasinewtonmethods_jl_tpu.parallel import make_mesh

    logdensity, cov = _corr_gaussian(3)
    mesh = make_mesh({"data": 8})
    kw = dict(n_chains=16, sampler="chees", n_samples=64, n_warmup=48,
              map_tol=1e-10)
    out_un = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(0), jnp.full(3, 2.0), **kw)
    out_sh = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(0), jnp.full(3, 2.0), mesh=mesh,
        **kw)
    # the samples arrive sharded over chains (axis 1 of (draws, chains, n))
    shardings = {
        d.device for d in out_sh.samples.addressable_shards
    }
    assert len(shardings) == 8
    np.testing.assert_allclose(
        np.asarray(out_sh.samples), np.asarray(out_un.samples),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(out_sh.diagnostics.rhat),
        np.asarray(out_un.diagnostics.rhat), rtol=1e-6, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(out_sh.x_map), np.asarray(out_un.x_map), atol=1e-9
    )
    with pytest.raises(ValueError, match="divide evenly"):
        qnm.map_then_sample(
            logdensity, jax.random.PRNGKey(0), jnp.full(3, 2.0),
            n_chains=12, mesh=mesh, n_samples=16, n_warmup=16)


def test_pipeline_mesh_lbfgs_polish_smoke():
    """mesh= composes with map_engine='lbfgs' + polish (each stage runs
    in the mesh context)."""
    from quasinewtonmethods_jl_tpu.parallel import make_mesh

    def logd(x):
        return -0.5 * jnp.sum(x * x)

    mesh = make_mesh({"data": 4})
    out = qnm.map_then_sample(
        logd, jax.random.PRNGKey(2), jnp.full(4, 1.5), n_chains=8,
        mesh=mesh, map_engine="lbfgs", polish_steps=1,
        n_samples=32, n_warmup=24,
    )
    assert out.samples.shape == (32, 8, 4)
    assert out.polish_result is not None
    assert np.all(np.isfinite(np.asarray(out.samples)))


def test_pipeline_depth_sort_fallback_identity_and_validation():
    """map_then_sample(depth_sort=True): when the probe refuses to sort,
    the pipeline's draws are bitwise what depth_sort=False produces
    (chunked-warmup identity + the sorted path's identical fallback);
    non-NUTS samplers and mesh are rejected."""
    logd, _ = _corr_gaussian(3)
    key = jax.random.PRNGKey(4)
    kw = dict(n_chains=16, sampler="nuts", n_samples=14, n_warmup=20,
              max_depth=5)
    plain = qnm.map_then_sample(logd, key, jnp.zeros(3), **kw)
    ds = qnm.map_then_sample(
        logd, key, jnp.zeros(3), depth_sort=True, probe_draws=3,
        min_persistence=2.0, **kw,
    )
    assert ds.depth_sort_info is not None and not ds.depth_sort_info.sorted
    np.testing.assert_array_equal(
        np.asarray(ds.samples), np.asarray(plain.samples)
    )
    assert plain.depth_sort_info is None

    with pytest.raises(ValueError, match="requires sampler='nuts'"):
        qnm.map_then_sample(
            logd, key, jnp.zeros(3), n_chains=16, sampler="chees",
            n_samples=8, n_warmup=8, depth_sort=True,
        )
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    with pytest.raises(ValueError, match="single-chip"):
        qnm.map_then_sample(
            logd, key, jnp.zeros(3), n_chains=16, sampler="nuts",
            n_samples=8, n_warmup=8, depth_sort=True, mesh=mesh,
        )


def test_pipeline_depth_sort_sorted_path():
    """Forcing the sort (thresholds at the floor) exercises the
    sub-fleet path end to end through the pipeline, including the
    decision record and diagnostics over the scattered draws."""
    from quasinewtonmethods_jl_tpu.models import funnel_logdensity

    res = qnm.map_then_sample(
        funnel_logdensity, jax.random.PRNGKey(5), jnp.zeros(3),
        n_chains=18, sampler="nuts", n_samples=16, n_warmup=24,
        max_depth=5, depth_sort=True, groups=3, probe_draws=3,
        min_persistence=-2.0, min_depth_spread=0.0,
    )
    info = res.depth_sort_info
    assert info.sorted and info.group_sizes == (6, 6, 6)
    assert res.samples.shape == (16, 18, 3)
    assert res.diagnostics is not None
    assert np.isfinite(np.asarray(res.samples)).all()


def test_map_then_sample_evidence_laplace_and_ais():
    """compute_evidence: both rungs agree with the analytic evidence on a
    Gaussian target (Laplace exact by construction, AIS within MC error)."""
    import math

    a = jnp.asarray([1.0, 4.0, 0.25])
    logz_true = 0.5 * 3 * math.log(2 * math.pi) - 0.5 * float(
        jnp.sum(jnp.log(a))
    )

    def ld(x):
        return -0.5 * jnp.sum(a * x * x)

    lap = qnm.map_then_sample(
        ld, jax.random.PRNGKey(40), jnp.ones(3), n_chains=8,
        n_samples=40, n_warmup=40, compute_evidence="laplace",
    )
    np.testing.assert_allclose(float(lap.log_evidence), logz_true,
                               atol=1e-6)
    assert lap.evidence_extra is None

    ais = qnm.map_then_sample(
        ld, jax.random.PRNGKey(40), jnp.ones(3), n_chains=8,
        n_samples=40, n_warmup=40, compute_evidence="ais",
        ais_kwargs=dict(n_particles=256, n_steps=16, n_leapfrog=4),
    )
    assert abs(float(ais.log_evidence) - logz_true) < 0.1
    assert float(ais.evidence_extra.ess) > 32


def test_map_then_sample_evidence_with_transform():
    """Evidence through a transform is the CONSTRAINED model's evidence:
    Gamma(3, 2) unnormalized (a-1)log x - b x has log Z =
    log Γ(3) - 3 log 2."""
    import math
    from quasinewtonmethods_jl_tpu import transforms

    def ld(x):
        return 2.0 * jnp.log(x[0]) - 2.0 * x[0]

    logz_true = math.lgamma(3.0) - 3.0 * math.log(2.0)
    out = qnm.map_then_sample(
        ld, jax.random.PRNGKey(41), jnp.ones(1), n_chains=8,
        n_samples=40, n_warmup=40, transform=transforms.Positive(1),
        compute_evidence="ais",
        ais_kwargs=dict(n_particles=512, n_steps=24, n_leapfrog=4),
    )
    assert abs(float(out.log_evidence) - logz_true) < 0.1


def test_map_then_sample_evidence_validation():
    def ld(x):
        return -0.5 * jnp.sum(x * x)

    with pytest.raises(ValueError, match="compute_evidence must be"):
        qnm.map_then_sample(ld, jax.random.PRNGKey(0), jnp.ones(2),
                            compute_evidence="bogus")
    with pytest.raises(ValueError, match="needs the MAP fleet"):
        qnm.map_then_sample(ld, jax.random.PRNGKey(0), jnp.ones(2),
                            init="pathfinder", compute_evidence="laplace")


# --- map_engine='lm' (round 4): Gaussian-likelihood MAP via LM -------------

def _linear_gaussian(n=3, m=12):
    """r(x) = A x - b: the posterior of obj = -1/2*||r||^2 is EXACTLY
    N(x_hat, inv(A^T A)) — the ground truth for the whole pipeline."""
    rng = np.random.default_rng(7)
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    Aj, bj = jnp.asarray(A), jnp.asarray(b)

    def resid(x):
        return Aj @ x - bj

    def obj(x):
        r = Aj @ x - bj
        return -0.5 * jnp.sum(r * r)

    x_hat = np.linalg.lstsq(A, b, rcond=None)[0]
    cov = np.linalg.inv(A.T @ A)
    return resid, obj, x_hat, cov


def test_pipeline_lm_engine_recovers_linear_gaussian():
    resid, obj, x_hat, cov = _linear_gaussian()
    out = qnm.map_then_sample(
        obj, jax.random.PRNGKey(3), jnp.zeros(3),
        n_chains=32, sampler="hmc", n_samples=500, n_warmup=300,
        map_engine="lm", map_kwargs={"residual_fn": resid},
    )
    np.testing.assert_allclose(np.asarray(out.x_map), x_hat, atol=1e-7)
    assert np.all(np.asarray(out.map_result.status) == qnm.Status.CONVERGED)
    # the handed-over mass IS the exact posterior covariance inv(JTJ)
    np.testing.assert_allclose(np.asarray(out.mass), cov, atol=1e-9)
    # map_result.fun carries the pipeline's MAXIMIZATION convention
    r_at = np.asarray(resid(jnp.asarray(x_hat)))
    np.testing.assert_allclose(
        np.asarray(out.map_result.fun), -0.5 * np.sum(r_at**2), atol=1e-8
    )
    draws = np.asarray(out.samples).reshape(-1, 3)
    np.testing.assert_allclose(draws.mean(axis=0), x_hat,
                               atol=4 * np.sqrt(cov.max() / len(draws) * 32))
    np.testing.assert_allclose(np.cov(draws.T), cov,
                               atol=0.35 * np.abs(cov).max())
    assert np.all(out.diagnostics.rhat < 1.1)


def test_pipeline_lm_engine_with_polish_and_robust_loss():
    resid, obj, x_hat, cov = _linear_gaussian()
    out = qnm.map_then_sample(
        obj, jax.random.PRNGKey(4), jnp.zeros(3),
        n_chains=16, sampler="chees", n_samples=60, n_warmup=40,
        map_engine="lm",
        map_kwargs={"residual_fn": resid, "loss": "linear"},
        polish_steps=1,
    )
    assert out.polish_result is not None
    np.testing.assert_allclose(np.asarray(out.x_map), x_hat, atol=1e-7)


def test_pipeline_lm_engine_validation():
    resid, obj, *_ = _linear_gaussian()
    with pytest.raises(ValueError, match="residual_fn"):
        qnm.map_then_sample(obj, jax.random.PRNGKey(0), jnp.zeros(3),
                            n_chains=8, n_samples=8, n_warmup=4,
                            map_engine="lm")
    with pytest.raises(ValueError, match="value_and_grad_fn"):
        qnm.map_then_sample(obj, jax.random.PRNGKey(0), jnp.zeros(3),
                            n_chains=8, n_samples=8, n_warmup=4,
                            map_engine="lm",
                            map_kwargs={"residual_fn": resid},
                            value_and_grad_fn=lambda x: (0.0, x))
    with pytest.raises(ValueError, match="lowrank"):
        qnm.map_then_sample(obj, jax.random.PRNGKey(0), jnp.zeros(3),
                            n_chains=8, n_samples=8, n_warmup=4,
                            map_engine="lm", mass_form="lowrank",
                            map_kwargs={"residual_fn": resid})


def test_chain_init_from_map_lm_mass_is_inv_jtj():
    from quasinewtonmethods_jl_tpu.sampling import chain_init_from_map

    resid, obj, x_hat, cov = _linear_gaussian()
    fit = qnm.least_squares(lambda x: resid(x), jnp.zeros((8, 3)))
    chains, mass = chain_init_from_map(fit, jitter=0.01,
                                       key=jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(mass), cov, atol=1e-9)
    assert chains.shape == (8, 3)


# --- map_engine='tr' (round 4): exact-Hessian mass handoff ------------------

def test_pipeline_tr_engine_exact_hessian_mass():
    logdensity, cov = _corr_gaussian(3)
    out = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(6), jnp.full(3, 2.0),
        n_chains=32, sampler="hmc", n_samples=400, n_warmup=250,
        map_engine="tr", map_tol=1e-10,
    )
    np.testing.assert_allclose(np.asarray(out.x_map), 0.0, atol=1e-8)
    # the handed-over mass is inv(-H) = the EXACT covariance (not a
    # secant estimate: machine-precision agreement)
    np.testing.assert_allclose(np.asarray(out.mass), cov, atol=1e-9)
    draws = np.asarray(out.samples).reshape(-1, 3)
    np.testing.assert_allclose(np.cov(draws.T), cov,
                               atol=0.35 * np.abs(cov).max())
    assert np.all(out.diagnostics.rhat < 1.1)


def test_pipeline_tr_engine_validation():
    def obj(x):
        return -0.5 * jnp.sum(x * x)

    with pytest.raises(ValueError, match="mass_form"):
        qnm.map_then_sample(obj, jax.random.PRNGKey(0), jnp.zeros(3),
                            n_chains=8, n_samples=8, n_warmup=4,
                            map_engine="tr", mass_form="lowrank")


# --- map_engine='cg' (round 4): shares the matrix-free exact-H handoff -----

def test_pipeline_cg_engine_exact_hessian_mass():
    logdensity, cov = _corr_gaussian(3)
    out = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(6), jnp.full(3, 2.0),
        n_chains=32, sampler="hmc", n_samples=400, n_warmup=250,
        map_engine="cg", map_tol=1e-10,
    )
    np.testing.assert_allclose(np.asarray(out.x_map), 0.0, atol=1e-8)
    # matrix-free engine -> the 'tr' handoff path: mass is the EXACT
    # inverse observed information
    np.testing.assert_allclose(np.asarray(out.mass), cov, atol=1e-9)
    draws = np.asarray(out.samples).reshape(-1, 3)
    np.testing.assert_allclose(np.cov(draws.T), cov,
                               atol=0.35 * np.abs(cov).max())
    assert np.all(out.diagnostics.rhat < 1.1)

    with pytest.raises(ValueError, match="mass_form"):
        qnm.map_then_sample(logdensity, jax.random.PRNGKey(0), jnp.zeros(3),
                            n_chains=8, n_samples=8, n_warmup=4,
                            map_engine="cg", mass_form="lowrank")


# --- init='svgd' (round 4): particle-transport chain initialization --------

def test_pipeline_svgd_init_recovers_gaussian():
    logdensity, cov = _corr_gaussian(3)
    out = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(9), jnp.full(3, 2.0),
        n_chains=32, sampler="hmc", n_samples=400, n_warmup=250,
        init="svgd", svgd_kwargs={"n_steps": 300},
    )
    # map_result is the SVGDResult; chains started at its particles
    assert hasattr(out.map_result, "particles")
    assert out.samples.shape == (400, 32, 3)
    draws = np.asarray(out.samples).reshape(-1, 3)
    np.testing.assert_allclose(draws.mean(axis=0), 0.0, atol=0.15)
    np.testing.assert_allclose(np.cov(draws.T), cov,
                               atol=0.35 * np.abs(cov).max())
    assert np.all(out.diagnostics.rhat < 1.1)
    # the handed-over mass is the SPD particle covariance
    assert np.all(np.linalg.eigvalsh(np.asarray(out.mass)) > 0)


def test_pipeline_svgd_init_validation():
    def obj(x):
        return -0.5 * jnp.sum(x * x)

    with pytest.raises(ValueError, match="polish"):
        qnm.map_then_sample(obj, jax.random.PRNGKey(0), jnp.zeros(3),
                            n_chains=8, n_samples=8, n_warmup=4,
                            init="svgd", polish_steps=1)
    with pytest.raises(ValueError, match="compute_evidence"):
        qnm.map_then_sample(obj, jax.random.PRNGKey(0), jnp.zeros(3),
                            n_chains=8, n_samples=8, n_warmup=4,
                            init="svgd", compute_evidence="laplace")
    with pytest.raises(ValueError, match="center"):
        qnm.map_then_sample(obj, jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                            n_chains=8, n_samples=8, n_warmup=4,
                            init="svgd")
