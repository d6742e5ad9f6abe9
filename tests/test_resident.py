"""Whole-solve VMEM-resident Pallas engine: lane-for-lane identity with
the per-iteration engines (interpret mode on CPU), plus the dispatch
guards. The on-chip A/B evidence lives in STATUS.md (round 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.batched_solve import optimize_batched_fused
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity
from quasinewtonmethods_jl_tpu.ops.linesearch import BackTracking
from quasinewtonmethods_jl_tpu.resident_solve import (
    optimize_batched_resident,
    resident_feasible,
)


def _assert_result_identical(a, b):
    """Trajectory identity: every discrete quantity (statuses, iteration
    and evaluation counters, resets) must be EXACT; float leaves must
    agree to last-ulp reassociation noise. (Bitwise float equality is
    fixture-dependent: the objective evaluated INSIDE the kernel can
    differ by 1 ulp from the solver-level evaluation — found by fuzzing;
    trip counts and branch decisions still match exactly.)"""
    for f in ["status", "iterations", "n_fev", "n_gev", "n_resets"]:
        av, bv = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        assert np.array_equal(av, bv), f
    for f in ["x", "fun", "grad"]:
        av, bv = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        np.testing.assert_allclose(bv, av, rtol=1e-12, atol=1e-12,
                                   equal_nan=True, err_msg=f)
    for f in ["fresh", "stall"]:
        av = np.asarray(getattr(a.state, f))
        bv = np.asarray(getattr(b.state, f))
        assert np.array_equal(av, bv), f
    for f in ["grad_old", "step", "B"]:
        av = np.asarray(getattr(a.state, f))
        bv = np.asarray(getattr(b.state, f))
        np.testing.assert_allclose(bv, av, rtol=1e-12, atol=1e-12,
                                   equal_nan=True, err_msg=f)


def test_resident_matches_per_iteration_kernel(rng):
    """Same multiply-reduce algebra as the per-iteration Pallas kernel →
    exact trip counts, floats to last-ulp (both in interpret mode)."""
    X = jnp.asarray(rng.standard_normal((8, 6)))
    ref = optimize_batched_fused(
        rosenbrock_logdensity, X, tol=1e-8, kernel="pallas_interpret",
        block_batch=4,
    )
    res = optimize_batched_resident(
        rosenbrock_logdensity, X, tol=1e-8, block_batch=4, interpret=True
    )
    _assert_result_identical(ref, res)


def test_resident_matches_xla_engine_closely(rng):
    """vs the XLA engine only reduction order differs (einsum vs
    multiply-reduce): statuses/counters identical, floats to ~1e-10."""
    X = jnp.asarray(rng.standard_normal((8, 6)))
    ref = optimize_batched_fused(rosenbrock_logdensity, X, tol=1e-8)
    res = optimize_batched_resident(
        rosenbrock_logdensity, X, tol=1e-8, block_batch=4, interpret=True
    )
    for f in ["status", "iterations", "n_fev", "n_gev", "n_resets"]:
        assert np.array_equal(
            np.asarray(getattr(ref, f)), np.asarray(getattr(res, f))
        ), f
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), atol=1e-9
    )


def test_resident_failure_paths_match(rng):
    def nasty(x):
        return jnp.where(jnp.sum(x * x) > 4.0, jnp.nan, -jnp.sum(x * x))

    Xf = jnp.asarray(rng.standard_normal((4, 3))) * 3
    r1 = optimize_batched_fused(nasty, Xf, tol=1e-8)
    r2 = optimize_batched_resident(
        nasty, Xf, tol=1e-8, block_batch=4, interpret=True
    )
    assert np.array_equal(np.asarray(r1.status), np.asarray(r2.status))

    X = jnp.asarray(rng.standard_normal((8, 6)))
    r3 = optimize_batched_fused(
        rosenbrock_logdensity, X, tol=1e-14, max_iterations=5
    )
    r4 = optimize_batched_resident(
        rosenbrock_logdensity, X, tol=1e-14, max_iterations=5,
        block_batch=4, interpret=True,
    )
    assert np.array_equal(np.asarray(r3.status), np.asarray(r4.status))
    assert np.array_equal(
        np.asarray(r3.iterations), np.asarray(r4.iterations)
    )


def test_resident_lane_padding(rng):
    """batch not a multiple of block_batch: padded lanes are stripped and
    real lanes match the unpadded run."""
    X = jnp.asarray(rng.standard_normal((6, 5)))
    res = optimize_batched_resident(
        rosenbrock_logdensity, X, tol=1e-8, block_batch=4, interpret=True
    )
    assert res.x.shape == (6, 5)
    assert np.all(np.asarray(res.status) == qnm.Status.CONVERGED)


def test_resident_dispatch_guards(rng):
    X = jnp.asarray(rng.standard_normal((4, 6)), jnp.float32)
    with pytest.raises(ValueError, match="x0s must be"):
        optimize_batched_resident(rosenbrock_logdensity, X[0])
    from quasinewtonmethods_jl_tpu.ops.wolfe import Wolfe

    with pytest.raises(ValueError, match="BackTracking"):
        optimize_batched_resident(
            rosenbrock_logdensity, X, ls=Wolfe(), interpret=True
        )
    # VMEM infeasible (large n) without interpret -> clear error
    assert not resident_feasible(512, 4)
    with pytest.raises(ValueError, match="infeasible"):
        optimize_batched_resident(
            rosenbrock_logdensity,
            jnp.asarray(rng.standard_normal((4, 512)), jnp.float32),
        )


def test_resident_order3_and_no_h0(rng):
    """Config axes (cubic line search, h0_scale off) stay lane-identical
    to the per-iteration kernel."""
    X = jnp.asarray(rng.standard_normal((4, 5)))
    for kw in [dict(ls=BackTracking(order=3)), dict(h0_scale=False)]:
        ref = optimize_batched_fused(
            rosenbrock_logdensity, X, tol=1e-8,
            kernel="pallas_interpret", block_batch=4, **kw,
        )
        res = optimize_batched_resident(
            rosenbrock_logdensity, X, tol=1e-8, block_batch=4,
            interpret=True, **kw,
        )
        _assert_result_identical(ref, res)


def test_resident_data_closing_objective(rng):
    """Objectives that close over data arrays (datasets, quadratic forms)
    have those arrays hoisted to explicit kernel inputs — pallas_call
    rejects captured constants (regression: the engine-fuzz quadratics
    originally failed to trace)."""
    n = 6
    A = rng.standard_normal((n, n))
    Q = jnp.asarray(A @ A.T / n + np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))

    def quad(x):
        return -0.5 * x @ (Q @ x) + b @ x

    X = jnp.asarray(rng.standard_normal((4, n)))
    ref = optimize_batched_fused(
        quad, X, tol=1e-8, kernel="pallas_interpret", block_batch=4
    )
    # rewrite_dots=False: this test pins the ulp-identity contract for
    # const HOISTING; the default dot rewrite reassociates the matvec
    # reductions and is covered (to tolerance) by
    # test_resident_matvec_objectives_via_dot_rewrite.
    res = optimize_batched_resident(
        quad, X, tol=1e-8, block_batch=4, interpret=True, rewrite_dots=False
    )
    _assert_result_identical(ref, res)


def test_resident_random_configs_trajectory_identity(rng):
    """Bounded fuzz (the one-off deep fuzz found the ulp-contract issue):
    random objectives / dims / orders / caps — trip counts exact, floats
    to last-ulp."""
    for trial in range(4):
        n = int(rng.integers(2, 9))
        batch = int(rng.integers(2, 9))
        kind = ["rosen", "quad", "logsumexp", "nasty"][trial]
        if kind == "rosen":
            obj = rosenbrock_logdensity
        elif kind == "quad":
            A = rng.standard_normal((n, n))
            Q = jnp.asarray(A @ A.T / n + np.eye(n))
            b = jnp.asarray(rng.standard_normal(n))

            def obj(x, Q=Q, b=b):
                return -0.5 * x @ (Q @ x) + b @ x
        elif kind == "logsumexp":
            c = jnp.asarray(rng.standard_normal(n))

            def obj(x, c=c):
                return -jax.nn.logsumexp(x * x + c) - 0.01 * jnp.sum(x * x)
        else:

            def obj(x):
                return jnp.where(jnp.sum(x * x) > 9.0, jnp.nan, -jnp.sum(x * x))

        order = int(rng.choice([2, 3]))
        h0 = bool(rng.choice([True, False]))
        X = jnp.asarray(rng.standard_normal((batch, n)) * rng.uniform(0.5, 3.0))
        kw = dict(
            ls=BackTracking(order=order), tol=1e-8, h0_scale=h0,
            max_iterations=int(rng.choice([5, 300])),
        )
        ref = optimize_batched_fused(
            obj, X, kernel="pallas_interpret", block_batch=4, **kw
        )
        # rewrite_dots=False keeps the last-ulp contract testable for the
        # quad trial (the rewrite reassociates matvec reductions; its own
        # tolerance contract is tested separately)
        res = optimize_batched_resident(
            obj, X, block_batch=4, interpret=True, rewrite_dots=False, **kw
        )
        _assert_result_identical(ref, res)


def test_resident_matvec_objectives_via_dot_rewrite(rng):
    """Round-4 unblocking: matvec-bearing objectives (quadratic form,
    logistic MAP — BASELINE configs 2-3) run through the resident engine
    with every dot_general rewritten to multiply+reduce
    (`ops.dot_rewrite`). Statuses/counters match the fused engine
    exactly on these fixtures; floats to reassociation tolerance. tol is
    1e-6: at 1e-8 this logistic fixture sits on the f64 line-search
    failure knife edge, where one-ulp reassociation noise legitimately
    flips boundary lanes between engines."""
    n, batch = 8, 16
    Q = jnp.asarray(rng.standard_normal((n, n)))
    Q = Q @ Q.T + n * jnp.eye(n)
    A = jnp.asarray(rng.standard_normal((64, n)))
    yv = jnp.asarray((rng.random(64) < 0.5).astype(np.float64))

    def quad(x):
        return -0.5 * x @ Q @ x

    def logistic(w):
        z = A @ w
        return jnp.sum(yv * z - jnp.logaddexp(0.0, z)) - 0.5 * jnp.sum(w * w)

    X0 = jnp.asarray(rng.standard_normal((batch, n)))
    for obj in (quad, logistic):
        fused = optimize_batched_fused(obj, X0, tol=1e-6)
        res = optimize_batched_resident(
            obj, X0, tol=1e-6, block_batch=4, interpret=True
        )
        for f in ["status", "iterations", "n_resets"]:
            assert np.array_equal(
                np.asarray(getattr(fused, f)), np.asarray(getattr(res, f))
            ), f
        assert (np.asarray(res.status) == int(qnm.Status.CONVERGED)).all()
        np.testing.assert_allclose(
            np.asarray(res.x), np.asarray(fused.x), rtol=1e-6, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(res.fun), np.asarray(fused.fun), rtol=1e-9, atol=1e-12
        )


def test_resident_rewrite_off_matches_on_for_dot_free(rng):
    """rewrite_dots is a no-op for dot-free objectives: bitwise-identical
    results either way (the pass only touches dot_general eqns)."""
    X = jnp.asarray(rng.standard_normal((8, 6)))
    a = optimize_batched_resident(
        rosenbrock_logdensity, X, tol=1e-8, block_batch=4, interpret=True,
        rewrite_dots=True,
    )
    b = optimize_batched_resident(
        rosenbrock_logdensity, X, tol=1e-8, block_batch=4, interpret=True,
        rewrite_dots=False,
    )
    _assert_result_identical(a, b)


def test_dot_rewrite_control_flow_reaches_scan():
    """Round-4 raised NotImplementedError for a dot_general hiding inside
    a scan body; round-5's recursion re-binds the scan with the body
    rewritten — the same fixture now SOLVES through the resident engine
    (interpret), converging where the guard used to raise."""
    Q = 0.4 * jnp.eye(4)

    def scan_obj(x):
        def body(c, _):
            return c @ Q, None

        out, _ = jax.lax.scan(body, x, None, length=2)
        return -jnp.sum(out * out) - jnp.sum((x - 1.0) ** 2)

    res = optimize_batched_resident(
        scan_obj, jnp.zeros((4, 4)), block_batch=4, interpret=True,
        tol=1e-6,
    )
    assert (np.asarray(res.status) == int(qnm.Status.CONVERGED)).all()


def test_resident_rejects_64bit_compiled_path():
    """x64 fleets can't lower through Mosaic — the engine must say so up
    front (interpret mode still accepts f64; regression for the deep
    `NotImplementedError: 64-bit types` a TPU x64 run used to hit)."""
    x0 = jnp.zeros((8, 4), jnp.float64)
    with pytest.raises(ValueError, match="64-bit"):
        qnm.optimize_batched_resident(
            lambda t: -jnp.sum(t * t), x0, tol=1e-6
        )


def test_resident_scan_bodied_objective_via_dot_rewrite(rng):
    """Round-5 unblocking: scan-SHAPED log-densities (state-space / AR
    likelihoods with a matvec in the step) were locked out of the
    resident engine by the control-flow guard; the evaluator now
    re-binds scan with its body routed through the dot rewrite.
    Interpret-mode parity vs the fused engine on an AR(1)-with-design
    likelihood (dot_general inside the scan body + one outside)."""
    T, n, batch = 10, 6, 8
    A = jnp.asarray(rng.standard_normal((n, n)) * (0.5 / n))
    ys = jnp.asarray(rng.standard_normal((T, n)))

    def ar1(w):
        def step(carry, y):
            pred = A @ carry + w
            return pred, -0.5 * jnp.sum((y - pred) ** 2)

        _, lls = jax.lax.scan(step, jnp.zeros(n), ys)
        return jnp.sum(lls) - 0.5 * (w @ w)

    X0 = jnp.asarray(rng.standard_normal((batch, n)))
    fused = optimize_batched_fused(ar1, X0, tol=1e-6)
    res = optimize_batched_resident(
        ar1, X0, tol=1e-6, block_batch=4, interpret=True
    )
    for f in ["status", "iterations", "n_resets"]:
        assert np.array_equal(
            np.asarray(getattr(fused, f)), np.asarray(getattr(res, f))
        ), f
    assert (np.asarray(res.status) == int(qnm.Status.CONVERGED)).all()
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(fused.x), rtol=1e-6, atol=1e-9
    )


def test_dot_rewrite_while_and_cond_bodies(rng):
    """The while/cond legs of the control-flow recursion: evaluator
    parity (values + gradients) against the unrewritten functions."""
    from quasinewtonmethods_jl_tpu.ops.dot_rewrite import (
        eval_jaxpr_no_dots,
        jaxpr_has_dots,
    )

    n = 5
    A = jnp.asarray(rng.standard_normal((n, n)) * 0.1)
    w = jnp.asarray(rng.standard_normal(n))

    def obj_while(v):
        def body(c):
            x, k = c
            return (A @ x + 0.01 * v, k + 1)

        x, _ = jax.lax.while_loop(lambda c: c[1] < 5, body, (v, 0))
        return jnp.sum(x)

    def obj_cond(v):
        return jax.lax.cond(
            jnp.sum(v) > 0.0,
            lambda u: jnp.dot(u, A @ u),
            lambda u: jnp.sum(u * u),
            v,
        )

    for obj, arg in [
        (obj_while, w),
        (obj_cond, w),
        (obj_cond, -jnp.abs(w)),  # the dot-free branch
    ]:
        closed = jax.make_jaxpr(obj)(arg)
        assert jaxpr_has_dots(closed.jaxpr)
        out = eval_jaxpr_no_dots(closed.jaxpr, closed.consts, arg)[0]
        np.testing.assert_allclose(float(out), float(obj(arg)), rtol=1e-12)

    # gradient parity through the rewritten program (cond only: JAX has
    # no reverse-mode rule for lax.while_loop — the ORIGINAL objective
    # is equally non-differentiable, so nothing is lost by the rewrite)
    def rewritten(v):
        c = jax.make_jaxpr(obj_cond)(v)
        return eval_jaxpr_no_dots(c.jaxpr, c.consts, v)[0]

    for arg in (w, -jnp.abs(w)):
        np.testing.assert_allclose(
            np.asarray(jax.grad(rewritten)(arg)),
            np.asarray(jax.grad(obj_cond)(arg)),
            rtol=1e-10,
        )
