"""Native host-runtime tests: build, convergence, and JAX-parity oracle.

The C++ solver (native/qnm_host.cpp) is an independent implementation of the
same algorithm (different language, different compiler, same algebra) — so
agreement with the JAX driver on converged optima is strong evidence both
are right. Skipped wholesale if no g++ toolchain is present.
"""

import shutil

import numpy as np
import pytest

if shutil.which("g++") is None:  # pragma: no cover
    pytest.skip("no g++ toolchain", allow_module_level=True)

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.host import optimize_host, rosenbrock_host


@pytest.mark.parametrize("n", [2, 13, 24, 60, 61])
@pytest.mark.parametrize("order", [2, 3])
def test_native_rosenbrock_sweep(n, order, rng):
    x0 = rng.standard_normal(n)
    res = rosenbrock_host(x0, order=order)
    assert res.status == 1  # CONVERGED
    assert abs(res.fun) < 4 * np.finfo(np.float64).eps
    np.testing.assert_allclose(res.x, 1.0, rtol=1e-5)
    assert np.abs(res.grad).max() < 1e-8
    assert res.n_fev >= res.n_gev == res.iterations + 1


def test_native_matches_jax_on_quadratic(rng):
    import jax.numpy as jnp

    import quasinewtonmethods_jl_tpu as qnm

    n = 16
    diag = np.linspace(0.5, 3.0, n)
    x_star = rng.standard_normal(n)

    def vag_np(x):
        r = x - x_star
        return -0.5 * np.sum(diag * r * r), -diag * r

    def f_jax(x):
        r = x - jnp.asarray(x_star)
        return -0.5 * jnp.sum(jnp.asarray(diag) * r * r)

    x0 = rng.standard_normal(n)
    res_c = optimize_host(vag_np, x0)
    res_j = qnm.optimize(f_jax, jnp.asarray(x0))  # both default h0-scaled
    assert res_c.status == int(res_j.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(res_c.x, np.asarray(res_j.x), atol=1e-9)
    np.testing.assert_allclose(res_c.fun, float(res_j.fun), atol=1e-14)
    # Quadratic trajectories are stable: iteration counts must agree exactly.
    assert res_c.iterations == int(res_j.iterations)


def test_native_matches_jax_on_rosenbrock_quality(rng):
    import jax.numpy as jnp

    import quasinewtonmethods_jl_tpu as qnm
    from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity

    x0 = rng.standard_normal(12)
    res_c = rosenbrock_host(x0)
    res_j = qnm.optimize(rosenbrock_logdensity, jnp.asarray(x0))
    assert res_c.status == int(res_j.status) == qnm.Status.CONVERGED
    np.testing.assert_allclose(res_c.x, np.asarray(res_j.x), atol=1e-7)


def test_native_failure_paths():
    def vag(x):
        if np.all(x == 0.0):
            return 1.0, np.ones_like(x)
        return np.nan, np.zeros_like(x)

    res = optimize_host(vag, np.zeros(3), ls_iterations=20)
    assert res.status == 3  # LINESEARCH_FAILURE
    assert np.isnan(res.fun)
    np.testing.assert_array_equal(res.x, np.zeros(3))

    def vag_nan(x):
        return np.nan, np.zeros_like(x)

    res2 = optimize_host(vag_nan, np.ones(3))
    assert res2.status == 4  # NONFINITE_VALUE
    assert np.isnan(res2.fun)

    res3 = optimize_host(
        lambda x: (-(np.sum((x - 1) ** 4)), -4 * (x - 1) ** 3),
        np.zeros(4),
        max_iterations=2,
    )
    assert res3.status == 2  # MAX_ITERATIONS
    assert np.isnan(res3.fun)
    assert res3.iterations == 2


def test_native_reset_path(rng):
    # concave |x|^3 objective exercises the m <= 0 identity-reset branch
    def vag(x):
        return -np.sum(np.abs(x) ** 3), -3.0 * np.sign(x) * x * x

    res = optimize_host(vag, np.asarray([2.0, -3.0, 0.5]), tol=1e-6)
    assert res.status == 1
    np.testing.assert_allclose(res.x, 0.0, atol=1e-2)


def test_host_callback_exception_is_in_band(rng):
    """A Python exception inside the ctypes objective callback must surface
    as the in-band NONFINITE_VALUE failure — previously ctypes swallowed it
    and an undefined return + zeroed gradient buffer produced a silent
    false CONVERGED."""
    def bad(x):
        raise RuntimeError("user bug")

    r = optimize_host(bad, np.ones(4))
    assert r.status == qnm.Status.NONFINITE_VALUE
    assert np.isnan(r.fun)


def test_host_callback_iterate_view_is_read_only(rng):
    """The x passed to callbacks aliases the solver's internal iterate
    buffer; it must be read-only so user code cannot corrupt the solve."""
    saw_readonly = []

    def vag(x):
        saw_readonly.append(not x.flags.writeable)
        return -0.5 * float(x @ x), -np.asarray(x)

    r = optimize_host(vag, np.ones(4))
    assert r.status == qnm.Status.CONVERGED
    assert all(saw_readonly)


def test_host_capped_exit_gradient_is_fresh(rng):
    """On a MAX_ITERATIONS exit the returned gradient must be the LAST one
    evaluated (one iterate behind out_x) — not two evaluations stale, which
    the pre-fix swap bookkeeping returned."""
    x0 = np.asarray(rng.standard_normal(12))
    capped = rosenbrock_host(x0, max_iterations=5)
    assert capped.status == qnm.Status.MAX_ITERATIONS
    # reconstruct the last-evaluated gradient: continue one more iteration
    # budget and compare against a 6-iteration run's history instead —
    # cheaper: the gradient at the PRE-step iterate x_prev = x - step is
    # what was evaluated last. Verify |grad| matches grad(x - step).
    full6 = rosenbrock_host(x0, max_iterations=6)
    # the 5-cap gradient must equal the gradient the 6th iteration would
    # evaluate at ITS x_old — which is the capped run's out_x... that
    # gradient is exactly what the 6-iteration run reports as its last
    # (also capped) gradient's PREDECESSOR. Simplest strong check: the
    # capped gradient is the true analytic gradient at SOME iterate within
    # one step of out_x, and specifically NOT the two-stale one.
    import jax, jax.numpy as jnp
    from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity
    g_fn = jax.grad(rosenbrock_logdensity)
    # candidate iterates around the exit
    g_at_x = np.asarray(g_fn(jnp.asarray(capped.x)))
    # the freshest available evaluation is at the iterate one accepted step
    # back; reconstruct it from the 6-run? Instead assert the documented
    # contract directly: grad must match an analytic gradient at one of
    # the last two iterates to 1e-12 -- with the old bug it matched only
    # the third-to-last.
    diffs = [float(np.max(np.abs(capped.grad - g_at_x)))]
    ok = diffs[0] < 1e-9
    if not ok:
        # one step back: x_prev = x - s (s not exported; approximate via a
        # fresh 4-iteration run whose out_x IS that iterate)
        prev = rosenbrock_host(x0, max_iterations=4)
        g_prev = np.asarray(g_fn(jnp.asarray(prev.x)))
        diffs.append(float(np.max(np.abs(capped.grad - g_prev))))
        ok = diffs[-1] < 1e-9
    assert ok, f"capped gradient matches no recent iterate: {diffs}"


# ----- native L-BFGS ---------------------------------------------------------

from quasinewtonmethods_jl_tpu.host import (  # noqa: E402
    optimize_lbfgs_host,
    rosenbrock_lbfgs_host,
)


@pytest.mark.parametrize("n", [13, 60, 61, 513])
def test_native_lbfgs_rosenbrock(n, rng):
    res = rosenbrock_lbfgs_host(rng.standard_normal(n), history=10)
    assert res.status == 1
    assert abs(res.fun) < 1e-12
    np.testing.assert_allclose(res.x, 1.0, rtol=1e-5)
    assert np.abs(res.grad).max() < 1e-8


def test_native_lbfgs_matches_jax_two_loop(rng):
    """Independent-implementation parity: the C++ two-loop L-BFGS against
    the JAX scalar driver with direction_method='two_loop' (same formulas,
    different language/compiler). On a stable quadratic both must take the
    same trajectory to rounding level."""
    import jax.numpy as jnp

    n = 24
    diag = np.linspace(0.5, 4.0, n)
    x_star = rng.standard_normal(n)

    def jax_obj(x):
        return -0.5 * jnp.sum(jnp.asarray(diag) * (x - jnp.asarray(x_star)) ** 2)

    def np_vag(x):
        r = x - x_star
        return float(-0.5 * np.sum(diag * r * r)), -(diag * r)

    x0 = rng.standard_normal(n)
    rj = qnm.optimize_lbfgs(jax_obj, jnp.asarray(x0), history=6,
                            direction_method="two_loop")
    rc = optimize_lbfgs_host(np_vag, x0, history=6)
    assert rc.status == 1 and int(rj.status) == 1
    assert abs(rc.iterations - int(rj.iterations)) <= 1
    np.testing.assert_allclose(rc.x, x_star, atol=1e-7)
    np.testing.assert_allclose(np.asarray(rj.x), rc.x, atol=1e-7)


def test_native_lbfgs_ring_wraparound(rng):
    """history smaller than the iteration count forces circular wraparound;
    the solve must still converge (ring bookkeeping correctness)."""
    res = rosenbrock_lbfgs_host(rng.standard_normal(30), history=3)
    assert res.status == 1
    assert res.iterations > 3  # the ring definitely wrapped
    np.testing.assert_allclose(res.x, 1.0, rtol=1e-5)


def test_native_lbfgs_failure_paths():
    # non-finite objective at x0
    def bad_vag(x):
        return float("nan"), np.zeros_like(x)

    r = optimize_lbfgs_host(bad_vag, np.ones(5))
    assert r.status == 4 and np.isnan(r.fun)  # NONFINITE_VALUE

    # iteration cap
    def slow_vag(x):
        return float(-np.sum(x**4)), -4 * x**3

    r2 = optimize_lbfgs_host(slow_vag, np.full(4, 2.0), max_iterations=2)
    assert r2.status == 2 and np.isnan(r2.fun)  # MAX_ITERATIONS
    # capped exit still reports the freshest evaluated gradient (finite)
    assert np.all(np.isfinite(r2.grad))


def test_native_lbfgs_invalid_history():
    r = optimize_lbfgs_host(
        lambda x: (float(-x @ x), -2 * x), np.ones(3), history=0
    )
    assert r.status == 4  # in-band rejection, no crash


def test_native_batch_rosenbrock_matches_per_lane(rng):
    """The threaded fleet driver is lane-for-lane bitwise identical to
    per-lane solo calls (same code path, per-thread workspaces), and the
    thread count does not change results (lane pull order is the only
    nondeterminism, and lanes are independent)."""
    from quasinewtonmethods_jl_tpu.host import rosenbrock_batch_host

    x0s = rng.standard_normal((24, 13))
    r1 = rosenbrock_batch_host(x0s, threads=1)
    rN = rosenbrock_batch_host(x0s, threads=0)  # all hardware threads
    assert r1.n_converged == rN.n_converged == 24
    np.testing.assert_array_equal(r1.x, rN.x)
    np.testing.assert_array_equal(r1.fun, rN.fun)
    np.testing.assert_array_equal(r1.iterations, rN.iterations)
    for i in (0, 7, 23):
        solo = rosenbrock_host(x0s[i])
        np.testing.assert_array_equal(r1.x[i], solo.x)
        assert r1.fun[i] == solo.fun
        assert r1.iterations[i] == solo.iterations
        assert r1.n_fev[i] == solo.n_fev


def test_native_batch_callback_engines(rng):
    """The generic batch entry drives both engines through a Python
    callback (GIL-serialized — correctness path, threads=1 and a pool)."""
    from quasinewtonmethods_jl_tpu.host import optimize_batch_host

    diag = np.linspace(1.0, 4.0, 6)

    def vag(x):
        return -0.5 * float(x @ (diag * x)), -(diag * x)

    x0s = rng.standard_normal((8, 6))
    for engine in ("bfgs", "lbfgs"):
        r = optimize_batch_host(vag, x0s, engine=engine)
        assert r.n_converged == 8, (engine, r.status)
        np.testing.assert_allclose(r.x, 0.0, atol=1e-7)
        # a pool with a Python callback is correct (just serialized)
        r2 = optimize_batch_host(vag, x0s, engine=engine, threads=4)
        np.testing.assert_array_equal(r.x, r2.x)
    with pytest.raises(ValueError, match="engine"):
        optimize_batch_host(vag, x0s, engine="cg")
    with pytest.raises(ValueError, match="batch, n"):
        optimize_batch_host(vag, x0s[0])


def test_native_batch_failure_lanes(rng):
    """Failed lanes report in-band per lane (NaN fun + status) without
    disturbing healthy neighbors."""
    from quasinewtonmethods_jl_tpu.host import optimize_batch_host

    def vag(x):
        if x[0] > 1e3:  # lane 1 starts in a poisoned region
            return float("nan"), np.zeros_like(x)
        return -0.5 * float(x @ x), -np.asarray(x)

    x0s = rng.standard_normal((3, 4))
    x0s[1, 0] = 1e9
    r = optimize_batch_host(vag, x0s)
    assert r.n_converged == 2
    assert r.status[0] == 1 and r.status[2] == 1
    assert r.status[1] == 4 and np.isnan(r.fun[1])  # NONFINITE_VALUE
    np.testing.assert_allclose(r.x[[0, 2]], 0.0, atol=1e-7)


@pytest.mark.parametrize("method", ["hz", "pr", "fr", "dy"])
def test_native_cg_rosenbrock(method, rng):
    from quasinewtonmethods_jl_tpu.host import rosenbrock_cg_host

    x0 = rng.standard_normal(24)
    res = rosenbrock_cg_host(x0, method=method)
    assert res.status == 1, (method, res.status)
    assert abs(res.fun) < 1e-12
    np.testing.assert_allclose(res.x, 1.0, rtol=1e-5)
    assert np.abs(res.grad).max() < 1e-8
    # CG's Wolfe evaluates value+grad together at every trial
    assert res.n_fev == res.n_gev


def test_native_cg_matches_jax_on_quadratic(rng):
    """Same optimum as the JAX CG engine (independent implementation of
    the same algorithm — different compiler, same algebra)."""
    import jax.numpy as jnp

    from quasinewtonmethods_jl_tpu.host import optimize_cg_host

    diag = np.linspace(1.0, 30.0, 12)
    x_star = rng.standard_normal(12)

    def vag(x):
        r = x - x_star
        return -0.5 * float(r @ (diag * r)), -(diag * r)

    res = optimize_cg_host(vag, rng.standard_normal(12))
    assert res.status == 1
    np.testing.assert_allclose(res.x, x_star, atol=1e-7)

    diag_j = jnp.asarray(diag)
    xs_j = jnp.asarray(x_star)
    rj = qnm.optimize_cg(
        lambda x: -0.5 * (x - xs_j) @ (diag_j * (x - xs_j)),
        jnp.asarray(rng.standard_normal(12)),
    )
    np.testing.assert_allclose(res.x, np.asarray(rj.x), atol=1e-6)


def test_native_cg_stiff_quadratic_certifies():
    """The approximate-Wolfe endgame: cond-1e3 quadratic certifies 1e-8
    (the JAX engine's measured requirement for linear-convergence
    engines at tight tolerances)."""
    from quasinewtonmethods_jl_tpu.host import optimize_cg_host

    diag = np.geomspace(1.0, 1e3, 40)

    def vag(x):
        return -0.5 * float(x @ (diag * x)), -(diag * x)

    rng_ = np.random.default_rng(5)
    res = optimize_cg_host(vag, rng_.standard_normal(40))
    assert res.status == 1
    assert np.abs(res.grad).max() < 1e-8


def test_native_cg_failure_paths(rng):
    from quasinewtonmethods_jl_tpu.host import optimize_cg_host

    def bad(x):
        return float("nan"), np.zeros_like(x)

    res = optimize_cg_host(bad, rng.standard_normal(4))
    assert res.status == 4 and np.isnan(res.fun)  # NONFINITE_VALUE
    with pytest.raises(ValueError, match="method"):
        optimize_cg_host(bad, rng.standard_normal(4), method="newton")


def test_auglag_host_kkt_and_jax_parity():
    """Native PHR augmented Lagrangian (round 5): KKT multiplier
    recovery on the analytic equality quadratic for all three inner
    engines, an active-inequality shadow price, and parity with the JAX
    scalar auglag on the disk-constrained Rosenbrock."""
    from quasinewtonmethods_jl_tpu.host import optimize_auglag_host

    def vag(z):
        return (
            -((z[0] - 2.0) ** 2) - ((z[1] - 1.0) ** 2),
            np.array([-2 * (z[0] - 2.0), -2 * (z[1] - 1.0)]),
        )

    def eq(z):
        return np.array([z[0] + z[1] - 1.0])

    def eq_vjp(z, w):
        return np.array([w[0], w[0]])

    for engine in ("cg", "bfgs", "lbfgs"):
        r = optimize_auglag_host(
            vag, np.zeros(2), eq=eq, eq_vjp=eq_vjp, engine=engine
        )
        assert r.status == 1, engine
        np.testing.assert_allclose(r.x, [1.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(r.fun, -2.0, atol=1e-6)
        np.testing.assert_allclose(r.lam[0], 2.0, atol=1e-4)
        assert r.viol <= 1e-8

    # active inequality: max -(x^2+y^2) s.t. x+y >= 1 -> (.5,.5), mu = 1
    def vag2(z):
        return -float(z @ z), -2.0 * z

    r2 = optimize_auglag_host(
        vag2, np.zeros(2),
        ineq=lambda z: np.array([z[0] + z[1] - 1.0]),
        ineq_vjp=lambda z, w: np.array([w[0], w[0]]),
    )
    assert r2.status == 1
    np.testing.assert_allclose(r2.x, [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(r2.mu[0], 1.0, atol=1e-4)

    # JAX parity on the disk-constrained Rosenbrock
    import jax
    import jax.numpy as jnp

    def f_rosen(z):
        return -(100.0 * (z[1] - z[0] ** 2) ** 2 + (1.0 - z[0]) ** 2)

    vag_j = jax.value_and_grad(f_rosen)

    def vag_np(z):
        v, g = vag_j(jnp.asarray(z))
        return float(v), np.asarray(g)

    rh = optimize_auglag_host(
        vag_np, np.zeros(2),
        ineq=lambda z: np.array([2.0 - z @ z]),
        ineq_vjp=lambda z, w: -2.0 * w[0] * np.asarray(z),
        engine="cg",
    )
    rj = qnm.optimize_auglag(
        f_rosen, jnp.zeros(2), ineq=lambda z: 2.0 - jnp.sum(z * z),
        engine="cg",
    )
    assert rh.status == 1 and bool(rj.converged)
    np.testing.assert_allclose(rh.x, np.asarray(rj.x), atol=1e-5)


def test_auglag_host_validation_and_failure():
    from quasinewtonmethods_jl_tpu.host import optimize_auglag_host

    def vag(z):
        return -float(z @ z), -2.0 * z

    with pytest.raises(ValueError, match="at least one"):
        optimize_auglag_host(vag, np.zeros(2))
    with pytest.raises(ValueError, match="matching"):
        optimize_auglag_host(
            vag, np.zeros(2), eq=lambda z: np.array([z[0]])
        )
    with pytest.raises(ValueError, match="engine"):
        optimize_auglag_host(
            vag, np.zeros(2), eq=lambda z: np.array([z[0]]),
            eq_vjp=lambda z, w: np.array([w[0], 0.0]), engine="tr",
        )
    # non-finite objective: in-band NONFINITE status, fun NaN
    def bad(z):
        return float("nan"), np.zeros(2)

    r = optimize_auglag_host(
        bad, np.zeros(2), eq=lambda z: np.array([z[0] - 1.0]),
        eq_vjp=lambda z, w: np.array([w[0], 0.0]), max_outer=9,
    )
    assert r.status == 4 and np.isnan(r.fun) and r.n_outer == 1
