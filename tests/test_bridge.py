"""Bridge-sampling evidence: exactness with an exact proposal, analytic
parity on Gaussian targets, multimodal evidence from replica-exchange
draws (the Laplace-bias repair WITHOUT a covering-base guess), result
diagnostics, shape/validation paths, pipeline integration.

Contract: `bridge_evidence` is consistent in the draws — with posterior
draws that cover the target's mass and an overlapping proposal, logZ
must land within MC error of analytic evidence; `re2` approximates the
estimator's relative MSE (iid draws) and `n_iter < max_iter` with tiny
`delta` certifies the fixed point converged."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import GaussianMixture

_LOG_2PI = math.log(2.0 * math.pi)


def _gaussian_target(a):
    """Unnormalized Gaussian -0.5 x' diag(a) x with analytic log Z."""
    a = jnp.asarray(a)

    def logdensity(x):
        return -0.5 * jnp.sum(a * x * x)

    n = a.shape[0]
    logz = 0.5 * n * _LOG_2PI - 0.5 * float(jnp.sum(jnp.log(a)))
    return logdensity, logz


def test_bridge_exact_proposal_is_exact():
    """With q2 exactly proportional to the target, both log ratios are the
    CONSTANT log Z: the fixed point lands on it immediately (machine eps)
    and the relative-MSE diagnostic is ~0."""
    ld, logz = _gaussian_target([1.0, 4.0, 0.25, 2.0])
    draws = jax.random.normal(jax.random.PRNGKey(0), (256, 4)) * jnp.sqrt(
        jnp.asarray([1.0, 0.25, 4.0, 0.5])
    )
    res = qnm.bridge_evidence(
        ld, jax.random.PRNGKey(1), draws,
        (jnp.zeros(4), jnp.asarray([1.0, 0.25, 4.0, 0.5])),
    )
    np.testing.assert_allclose(float(res.logZ), logz, atol=1e-8)
    assert float(res.re2) < 1e-12
    assert int(res.n_iter) < 10
    assert float(res.delta) < 1e-10


def test_bridge_from_solve_result_dense_base():
    """Proposal extracted from a converged BFGS solve on a correlated
    Gaussian; posterior draws generated exactly. logZ within tight MC
    error of the analytic value, and sqrt(re2) honestly brackets the
    observed error's order of magnitude."""
    cov = jnp.asarray([[1.0, 0.6], [0.6, 2.0]])
    prec = jnp.linalg.inv(cov)
    logz = 0.5 * 2 * _LOG_2PI + 0.5 * float(jnp.linalg.slogdet(cov)[1])

    def ld(x):
        return -0.5 * x @ prec @ x

    sol = qnm.optimize(ld, jnp.asarray([1.0, -2.0]))
    assert bool(sol.converged)
    draws = jax.random.multivariate_normal(
        jax.random.PRNGKey(2), jnp.zeros(2), cov, (2048,)
    )
    res = qnm.bridge_evidence(ld, jax.random.PRNGKey(3), draws, sol)
    err = abs(float(res.logZ) - logz)
    assert err < 0.05
    assert float(res.re2) < 0.01
    assert int(res.n_iter) < 200  # converged before max_iter


def test_bridge_multimodal_from_pt_draws():
    """The multimodal-evidence workflow AIS needs a covering base for:
    replica-exchange draws (which visit BOTH basins) + a wide proposal
    recover the two-mode mixture's evidence where Laplace carries its
    structural one-basin bias of ~log 0.75."""
    mix = GaussianMixture(
        means=[[4.0, 4.0], [-4.0, -4.0]], weights=[0.75, 0.25], sigmas=1.0
    )
    logz_true = 0.5 * 2 * _LOG_2PI

    pt = qnm.pt_sample(
        mix.logdensity, jax.random.PRNGKey(4),
        jnp.full((64, 2), 4.0),  # all chains start in ONE basin
        n_temps=6, beta_min=0.02,
        n_samples=192, n_warmup=256, n_leapfrog=12, step_size=0.3,
    )
    res = qnm.bridge_evidence(
        mix.logdensity, jax.random.PRNGKey(5), pt.samples,
        (jnp.zeros(2), jnp.full((2,), 25.0)),
    )
    assert abs(float(res.logZ) - logz_true) < 0.1

    sol = qnm.optimize(mix.logdensity, jnp.asarray([3.5, 4.5]))
    lz_lap = float(qnm.laplace_evidence(sol, obj=mix.logdensity))
    assert abs(float(res.logZ) - logz_true) < abs(lz_lap - logz_true)


def test_bridge_shapes_and_validation():
    ld, logz = _gaussian_target([1.0, 2.0])
    base = (jnp.zeros(2), jnp.ones(2))
    d3 = jax.random.normal(jax.random.PRNGKey(6), (64, 8, 2)) * jnp.asarray(
        [1.0, 1.0 / jnp.sqrt(2.0)]
    )
    # 3D (n_samples, chains, n) draws flatten internally
    res3 = qnm.bridge_evidence(ld, jax.random.PRNGKey(7), d3, base)
    assert abs(float(res3.logZ) - logz) < 0.2
    # n_proposal decouples proposal count from draw count
    res_np = qnm.bridge_evidence(
        ld, jax.random.PRNGKey(7), d3, base, n_proposal=2048
    )
    assert abs(float(res_np.logZ) - logz) < 0.2

    with pytest.raises(ValueError, match="draws must be"):
        qnm.bridge_evidence(ld, jax.random.PRNGKey(0), jnp.ones(4), base)
    with pytest.raises(ValueError, match="does not match draw"):
        qnm.bridge_evidence(
            ld, jax.random.PRNGKey(0), jnp.ones((8, 3)), base
        )
    with pytest.raises(ValueError, match="max_iter"):
        qnm.bridge_evidence(
            ld, jax.random.PRNGKey(0), jnp.ones((8, 2)), base, max_iter=0
        )
    with pytest.raises(ValueError, match="n_proposal"):
        qnm.bridge_evidence(
            ld, jax.random.PRNGKey(0), jnp.ones((8, 2)), base, n_proposal=1
        )
    with pytest.raises(TypeError, match="solve result"):
        qnm.bridge_evidence(
            ld, jax.random.PRNGKey(0), jnp.ones((8, 2)), 3.0
        )


def test_bridge_out_of_support_draw_is_inband():
    """A proposal draw landing where the target is -inf (constrained
    support) must contribute zero mass, not NaN-poison the estimate."""
    logz_true = math.lgamma(3.0) - 3.0 * math.log(2.0)  # Gamma(3, 2)

    def ld(x):
        return jnp.where(
            x[0] > 0, 2.0 * jnp.log(jnp.abs(x[0])) - 2.0 * x[0], -jnp.inf
        )

    draws = jax.random.gamma(jax.random.PRNGKey(8), 3.0, (4096, 1)) / 2.0
    # deliberately wide proposal straddling zero: some proposal draws
    # land outside the support
    res = qnm.bridge_evidence(
        ld, jax.random.PRNGKey(9), draws, (jnp.asarray([1.5]),
                                           jnp.asarray([4.0]))
    )
    assert np.isfinite(float(res.logZ))
    assert abs(float(res.logZ) - logz_true) < 0.05


def test_map_then_sample_evidence_bridge():
    """compute_evidence='bridge' agrees with the analytic evidence on a
    Gaussian target using only the pipeline's own draws."""
    a = jnp.asarray([1.0, 4.0, 0.25])
    logz_true = 0.5 * 3 * _LOG_2PI - 0.5 * float(jnp.sum(jnp.log(a)))

    def ld(x):
        return -0.5 * jnp.sum(a * x * x)

    out = qnm.map_then_sample(
        ld, jax.random.PRNGKey(42), jnp.ones(3), n_chains=16,
        n_samples=96, n_warmup=64, compute_evidence="bridge",
    )
    assert abs(float(out.log_evidence) - logz_true) < 0.1
    assert isinstance(out.evidence_extra, qnm.BridgeResult)
    assert float(out.evidence_extra.delta) < 1e-8
