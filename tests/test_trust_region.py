"""Trust-region Newton-Krylov engine: reference-parity bars, Steihaug
negative-curvature handling, fleet masking, failure paths, resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity

EPS64 = float(np.finfo(np.float64).eps)


def _quad(n, kappa=1e4):
    """Ill-conditioned diagonal quadratic (BASELINE config-2 class)."""
    d = jnp.asarray(np.geomspace(1.0, kappa, n))

    def obj(x):
        return -0.5 * jnp.sum(d * x * x)

    return obj, d


def test_exact_quadratic_one_newton_step():
    obj, d = _quad(8, kappa=10.0)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(8))
    # radius never binds; cg_tol ~ 0 disables the Eisenstat-Walker loose
    # early solves so CG solves the Newton system exactly
    res = qnm.optimize_tr(obj, x0, delta0=1e3, cg_tol=1e-8)
    assert int(res.status) == qnm.Status.CONVERGED
    assert int(res.iterations) <= 2
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=1e-10)
    assert float(jnp.max(jnp.abs(res.grad))) < 1e-8


def test_rosenbrock_reference_parity_bars():
    # the reference's own quality bar (runtests.jl): |l*| < 2 eps,
    # max|grad| < 1e-8, x = 1
    x0 = jnp.asarray(np.random.default_rng(42).standard_normal(60))
    res = qnm.optimize_tr(rosenbrock_logdensity, x0)
    assert int(res.status) == qnm.Status.CONVERGED
    assert abs(float(res.fun)) < 2 * EPS64
    assert float(jnp.max(jnp.abs(res.grad))) < 1e-8
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)


def test_rosenbrock_sweep_small_n():
    rng = np.random.default_rng(3)
    for n in (2, 5, 12, 24):
        res = qnm.optimize_tr(
            rosenbrock_logdensity, jnp.asarray(rng.standard_normal(n))
        )
        assert int(res.status) == qnm.Status.CONVERGED, n
        assert abs(float(res.fun)) < 2 * EPS64, n
        assert float(jnp.max(jnp.abs(res.grad))) < 1e-8, n


def test_ill_conditioned_quadratic_n256():
    obj, _ = _quad(256, kappa=1e6)
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(256))
    res = qnm.optimize_tr(obj, x0, max_cg=256)
    assert int(res.status) == qnm.Status.CONVERGED
    assert float(jnp.max(jnp.abs(res.grad))) < 1e-8


def test_negative_curvature_escapes_saddle_region():
    # double well: the minimization Hessian is NEGATIVE definite near 0;
    # Steihaug rides the negative-curvature direction to the boundary
    # (a line-search Newton step would point the wrong way)
    def obj(x):
        return -jnp.sum((x * x - 1.0) ** 2)

    res = qnm.optimize_tr(obj, jnp.full(4, 0.05))
    assert int(res.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(np.abs(np.asarray(res.x)), 1.0, atol=1e-8)


def test_fleet_matches_scalar_and_masks_frozen_lanes():
    rng = np.random.default_rng(7)
    X0 = jnp.asarray(rng.standard_normal((16, 6)))
    fleet = qnm.optimize_tr(rosenbrock_logdensity, X0)
    assert fleet.x.shape == (16, 6)
    assert np.all(np.asarray(fleet.status) == qnm.Status.CONVERGED)
    # lockstep masking must not change any lane's answer
    for i in (0, 5, 15):
        solo = qnm.optimize_tr(rosenbrock_logdensity, X0[i])
        np.testing.assert_allclose(
            np.asarray(fleet.x[i]), np.asarray(solo.x), atol=1e-9
        )


def test_nonfinite_at_x0_in_band():
    def obj(x):
        return jnp.where(x[0] > 0, -jnp.sum(x * x), jnp.nan)

    res = qnm.optimize_tr(obj, jnp.asarray([-1.0, 1.0]))
    assert int(res.status) == qnm.Status.NONFINITE_VALUE
    assert np.isnan(float(res.fun))


def test_nonfinite_region_freezes_iterate():
    # objective is NaN outside the unit ball: rejected trials must leave
    # the iterate at the last good point (the 0*NaN contract)
    def obj(x):
        r2 = jnp.sum(x * x)
        return jnp.where(r2 < 4.0, -(r2 - 1.0) ** 2, jnp.nan)

    res = qnm.optimize_tr(obj, jnp.asarray([0.4, 0.3]), delta0=100.0)
    assert int(res.status) == qnm.Status.CONVERGED
    assert np.all(np.isfinite(np.asarray(res.x)))
    np.testing.assert_allclose(
        float(jnp.sum(res.x * res.x)), 1.0, atol=1e-8
    )


def test_max_iterations_in_band():
    x0 = jnp.asarray(np.random.default_rng(5).standard_normal(10))
    res = qnm.optimize_tr(rosenbrock_logdensity, x0, max_iterations=3)
    assert int(res.status) in (
        qnm.Status.MAX_ITERATIONS, qnm.Status.CONVERGED
    )
    if int(res.status) == qnm.Status.MAX_ITERATIONS:
        assert np.isnan(float(res.fun))
        assert np.isfinite(float(res.last_value))
        assert int(res.iterations) == 3


def test_resume_chunked_equals_long_run():
    x0 = jnp.asarray(np.random.default_rng(9).standard_normal((4, 8)))
    long = qnm.optimize_tr(rosenbrock_logdensity, x0, max_iterations=200)
    part = qnm.optimize_tr(rosenbrock_logdensity, x0, max_iterations=5)
    resumed = qnm.optimize_tr_from_state(
        rosenbrock_logdensity, part.state, max_iterations=200
    )
    assert np.all(np.asarray(resumed.status) == qnm.Status.CONVERGED)
    np.testing.assert_array_equal(
        np.asarray(resumed.x), np.asarray(long.x)
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.iterations), np.asarray(long.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.n_hev), np.asarray(long.n_hev)
    )


def test_checkpoint_roundtrip(tmp_path):
    from quasinewtonmethods_jl_tpu.utils.checkpoint import (
        load_state, save_state,
    )

    x0 = jnp.asarray(np.random.default_rng(2).standard_normal((3, 5)))
    part = qnm.optimize_tr(rosenbrock_logdensity, x0, max_iterations=4)
    path = tmp_path / "tr.npz"
    save_state(str(path), part.state)
    loaded = load_state(str(path))
    assert type(loaded).__name__ == "TRState"
    resumed = qnm.optimize_tr_from_state(rosenbrock_logdensity, loaded)
    direct = qnm.optimize_tr_from_state(rosenbrock_logdensity, part.state)
    np.testing.assert_array_equal(
        np.asarray(resumed.x), np.asarray(direct.x)
    )


def test_analytic_value_and_grad_matches_ad():
    obj, d = _quad(12, kappa=100.0)

    def vag(x):
        return -0.5 * jnp.sum(d * x * x), -d * x

    x0 = jnp.asarray(np.random.default_rng(4).standard_normal(12))
    r_ad = qnm.optimize_tr(obj, x0)
    r_an = qnm.optimize_tr(obj, x0, value_and_grad_fn=vag)
    np.testing.assert_allclose(
        np.asarray(r_ad.x), np.asarray(r_an.x), atol=1e-12
    )
    assert int(r_an.status) == qnm.Status.CONVERGED


def test_misuse_probes():
    with pytest.raises(ValueError, match="rank"):
        qnm.optimize_tr(rosenbrock_logdensity, jnp.zeros((2, 2, 2)))
    with pytest.raises(ValueError, match="max_iterations"):
        qnm.optimize_tr(rosenbrock_logdensity, jnp.zeros(4),
                        max_iterations=0)
    with pytest.raises(ValueError, match="max_cg"):
        qnm.optimize_tr(rosenbrock_logdensity, jnp.zeros(4), max_cg=0)
    with pytest.raises(ValueError, match="delta0"):
        qnm.optimize_tr(rosenbrock_logdensity, jnp.zeros(4), delta0=-1.0)
    with pytest.raises(TypeError):
        qnm.optimize_tr(42, jnp.zeros(4))


# --- box constraints (projected TR, the dogbox rule) ------------------------

def test_bounds_diagonal_quadratic_clips_to_faces():
    # max of -(x-c)'D(x-c): the bounded solution is clip(c, lo, hi)
    c = jnp.asarray([2.0, -3.0, 0.25, 0.0])
    d = jnp.asarray([1.0, 4.0, 2.0, 1.0])

    def obj(x):
        return -jnp.sum(d * (x - c) ** 2)

    lo = jnp.asarray([-1.0, -1.0, -1.0, -1.0])
    hi = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    res = qnm.optimize_tr(obj, jnp.zeros(4), bounds=(lo, hi), tol=1e-7)
    assert int(res.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(
        np.asarray(res.x), np.clip(np.asarray(c), -1.0, 1.0), atol=1e-7
    )


def test_bounds_match_scipy_lbfgsb_same_function():
    # the SAME (split) rosenbrock through scipy's bounded reference
    # solver — same starts, same box, same KKT point. (First version of
    # this test compared against scipy.optimize.rosen — the CHAINED
    # variant, a different function with different bounded KKT points.)
    from scipy.optimize import minimize as sp_minimize

    fun = lambda x: float(-rosenbrock_logdensity(jnp.asarray(x)))
    jac_j = jax.jit(jax.grad(lambda x: -rosenbrock_logdensity(x)))
    jac = lambda x: np.asarray(jac_j(jnp.asarray(x)))

    rng = np.random.default_rng(12)
    x0 = np.clip(rng.standard_normal(6), -0.5, 0.8)
    lo, hi = np.full(6, -0.5), np.full(6, 0.8)  # optimum 1-vector infeasible
    ours = qnm.optimize_tr(
        rosenbrock_logdensity, jnp.asarray(x0),
        bounds=(jnp.asarray(lo), jnp.asarray(hi)), tol=1e-9,
    )
    ref = sp_minimize(fun, x0, jac=jac, method="L-BFGS-B",
                      bounds=list(zip(lo, hi)),
                      options={"ftol": 1e-15, "gtol": 1e-12})
    assert int(ours.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(np.asarray(ours.x), ref.x, atol=1e-5)
    np.testing.assert_allclose(-float(ours.fun), ref.fun, rtol=1e-8)
    # and the claimed KKT point really is one (independent residual)
    g = jac(np.asarray(ours.x))
    kkt = np.max(np.abs(np.asarray(ours.x)
                        - np.clip(np.asarray(ours.x) - g, lo, hi)))
    assert kkt < 1e-7


def test_bounds_per_lane_fleet_and_x0_clipped():
    def obj(x):
        return -jnp.sum((x - 2.0) ** 2)

    lo = jnp.stack([jnp.full(3, -1.0), jnp.full(3, 0.0)])
    hi = jnp.stack([jnp.full(3, 1.0), jnp.full(3, 3.0)])  # lane1 interior
    x0 = jnp.full((2, 3), 5.0)  # outside both boxes -> clipped in
    res = qnm.optimize_tr(obj, x0, bounds=(lo, hi), tol=1e-7)
    assert np.all(np.asarray(res.status) == qnm.Status.CONVERGED)
    np.testing.assert_allclose(np.asarray(res.x[0]), 1.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.x[1]), 2.0, atol=1e-7)


def test_bounds_resume_chunked_equals_long():
    rng = np.random.default_rng(21)
    X0 = jnp.asarray(rng.standard_normal((4, 6)))
    lo, hi = jnp.full(6, -0.5), jnp.full(6, 0.8)
    kw = dict(bounds=(lo, hi), tol=1e-7)
    long = qnm.optimize_tr(rosenbrock_logdensity, X0, **kw)
    part = qnm.optimize_tr(rosenbrock_logdensity, X0, max_iterations=4,
                           **kw)
    resumed = qnm.optimize_tr_from_state(rosenbrock_logdensity, part.state,
                                         **kw)
    np.testing.assert_array_equal(np.asarray(resumed.x), np.asarray(long.x))
    np.testing.assert_array_equal(np.asarray(resumed.n_hev),
                                  np.asarray(long.n_hev))


def test_bounds_validation():
    with pytest.raises(ValueError, match="lower < upper"):
        qnm.optimize_tr(rosenbrock_logdensity, jnp.zeros(3),
                        bounds=(jnp.ones(3), jnp.zeros(3)))
    with pytest.raises(ValueError, match="pair"):
        qnm.optimize_tr(rosenbrock_logdensity, jnp.zeros(3), bounds=3)


# --- round-4 review regressions ---------------------------------------------

def test_resume_from_rank1_state():
    # review finding: _result_from_state squeezes the state of a single
    # solve; resume must re-batch it (like least_squares_from_state)
    x0 = jnp.asarray(np.random.default_rng(31).standard_normal(8))
    long = qnm.optimize_tr(rosenbrock_logdensity, x0)
    part = qnm.optimize_tr(rosenbrock_logdensity, x0, max_iterations=3)
    assert part.state.x.ndim == 1  # squeezed, as the result contract says
    resumed = qnm.optimize_tr_from_state(rosenbrock_logdensity, part.state)
    assert int(resumed.status) == qnm.Status.CONVERGED
    np.testing.assert_array_equal(np.asarray(resumed.x), np.asarray(long.x))
    np.testing.assert_array_equal(int(resumed.n_hev), int(long.n_hev))


def test_certificate_accept_rejects_uphill_plateau():
    # review finding: the endgame certificate-accept must NOT take an
    # ASCENT (minimization) step onto a distant flat plateau. Objective
    # (maximization): a sharp local peak at 0 the iterate is climbing,
    # plus a far plateau at much LOWER logdensity where the gradient
    # vanishes. A grown radius can propose a trial on the plateau whose
    # KKT residual is < tol — without the descent gate it would be
    # accepted and declared CONVERGED at the bad point.
    def obj(x):
        r2 = jnp.sum(x * x)
        peak = -r2  # local max 0 at origin
        # smooth plateau of value -100 for r2 > ~25
        return jnp.where(r2 < 25.0, peak, -100.0 + 0.0 * r2)

    res = qnm.optimize_tr(obj, jnp.full(3, 0.5), delta0=100.0, tol=1e-6)
    assert int(res.status) == qnm.Status.CONVERGED
    # converged at the PEAK, not the plateau
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=1e-6)
    assert float(res.fun) > -1e-6


def test_pipeline_lm_result_sign_consistency():
    # review finding: map_engine='lm' must present fun/last_value/grad
    # in ONE (maximization) convention
    def resid(x):
        return jnp.stack([x[0] - 1.0, 2.0 * x[1] + 1.0, x[0] + x[1]])

    def obj(x):
        r = resid(x)
        return -0.5 * jnp.sum(r * r)

    out = qnm.map_then_sample(
        obj, jax.random.PRNGKey(8), jnp.zeros(2),
        n_chains=8, sampler="chees", n_samples=16, n_warmup=8,
        map_engine="lm", map_kwargs={"residual_fn": resid},
    )
    mr = out.map_result
    ok = np.asarray(mr.status) == qnm.Status.CONVERGED
    assert ok.any()
    np.testing.assert_allclose(
        np.asarray(mr.fun)[ok], np.asarray(mr.last_value)[ok], atol=1e-12
    )
    # grad is the gradient of the MAXIMIZED objective: -J^T r
    x0_lane = np.asarray(mr.x)[np.argmax(ok)]
    g_expected = np.asarray(
        jax.grad(obj)(jnp.asarray(x0_lane))
    )
    np.testing.assert_allclose(
        np.asarray(mr.grad)[np.argmax(ok)], g_expected, atol=1e-10
    )


# ---------------------------------------------------------------------------
# preconditioned Steihaug-CG (precondition='jacobi' | fixed diagonal)


def test_precondition_jacobi_slashes_hvps_on_stiff_quadratic():
    # the geometry the knob is FOR: plain CG needs ~sqrt(cond) inner
    # iterations per outer solve, Jacobi collapses that to O(1); on a
    # DIAGONAL Hessian the Hutchinson estimate is exact from one probe
    obj, _ = _quad(256, kappa=1e4)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(256))
    plain = qnm.optimize_tr(obj, x0, tol=1e-8)
    jac = qnm.optimize_tr(obj, x0, tol=1e-8, precondition="jacobi")
    assert int(plain.status) == qnm.Status.CONVERGED
    assert int(jac.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(np.asarray(jac.x), 0.0, atol=1e-10)
    # measured on this fixture: 1475 -> 40 HVPs; bar kept loose (>= 5x)
    assert int(jac.n_hev) * 5 < int(plain.n_hev)


def test_precondition_fixed_diagonal_exact_scaling():
    obj, d = _quad(128, kappa=1e4)
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(128))
    res = qnm.optimize_tr(obj, x0, tol=1e-8, precondition=d)
    assert int(res.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=1e-12)
    # exact scaling => rescaled Hessian is the identity: CG needs one
    # direction per outer iteration and the iteration count is tiny
    assert int(res.n_hev) <= 3 * int(res.iterations)


def test_precondition_jacobi_reference_parity_bars():
    # the knob must not break the reference's quality bar on its own
    # fixture (off-diagonal Hessian: Jacobi is a rescale, not a win)
    x0 = jnp.asarray(np.random.default_rng(7).standard_normal(12))
    res = qnm.optimize_tr(
        rosenbrock_logdensity, x0, precondition="jacobi"
    )
    assert int(res.status) == qnm.Status.CONVERGED
    assert abs(float(res.fun)) < 2 * EPS64
    assert float(jnp.max(jnp.abs(res.grad))) < 1e-8


def test_precondition_jacobi_fleet_matches_solo():
    # probes are drawn (n,) and broadcast across lanes, keyed off the
    # fleet-max iteration count, so lane i replays the solo trajectory
    X0 = jnp.asarray(np.random.default_rng(5).standard_normal((4, 8)))
    fleet = qnm.optimize_tr(
        rosenbrock_logdensity, X0, precondition="jacobi"
    )
    for i in range(4):
        solo = qnm.optimize_tr(
            rosenbrock_logdensity, X0[i], precondition="jacobi"
        )
        np.testing.assert_allclose(
            np.asarray(fleet.x[i]), np.asarray(solo.x), atol=1e-9
        )
        assert int(fleet.iterations[i]) == int(solo.iterations)


def test_precondition_jacobi_resume_chunked_equals_long():
    # probe determinism through the carried iteration count: a resumed
    # leg must draw the exact probes the uninterrupted run would have
    x0 = jnp.asarray(np.random.default_rng(9).standard_normal(8))
    long = qnm.optimize_tr(
        rosenbrock_logdensity, x0, precondition="jacobi"
    )
    leg1 = qnm.optimize_tr(
        rosenbrock_logdensity, x0, precondition="jacobi", max_iterations=6
    )
    leg2 = qnm.optimize_tr_from_state(
        rosenbrock_logdensity, leg1.state, precondition="jacobi"
    )
    assert bool(jnp.all(leg2.x == long.x))
    assert int(leg2.iterations) == int(long.iterations)
    assert int(leg2.n_hev) == int(long.n_hev)


def test_precondition_bounded_composition():
    # free-subspace CG + M-norm radius together: blocked coordinates get
    # an exactly-zero step and the KKT certificate fires
    n = 32
    d = jnp.asarray(np.geomspace(1.0, 1e3, n))

    def obj(x):
        return -0.5 * jnp.sum(d * (x - 2.0) ** 2)

    lo = -jnp.ones(n)
    hi = jnp.where(jnp.arange(n) % 2 == 0, 1.0, 3.0)
    res = qnm.optimize_tr(
        obj, jnp.zeros(n), bounds=(lo, hi), tol=1e-8,
        precondition="jacobi",
    )
    expected = jnp.where(jnp.arange(n) % 2 == 0, 1.0, 2.0)
    assert int(res.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(expected),
                               atol=1e-9)


def test_precondition_misuse_probes():
    x0 = jnp.zeros(8)
    with pytest.raises(ValueError, match="precondition"):
        qnm.optimize_tr(rosenbrock_logdensity, x0, precondition="nope")
    with pytest.raises(ValueError, match="finite and > 0"):
        qnm.optimize_tr(
            rosenbrock_logdensity, x0, precondition=-jnp.ones(8)
        )
    with pytest.raises(ValueError, match="last axis"):
        qnm.optimize_tr(
            rosenbrock_logdensity, x0, precondition=jnp.ones(4)
        )
    with pytest.raises(ValueError, match="precond_probes"):
        qnm.optimize_tr(
            rosenbrock_logdensity, x0, precondition="jacobi",
            precond_probes=0,
        )
