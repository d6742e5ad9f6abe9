"""Unit tests for ops.dot_rewrite — the Mosaic batched-dots unblocking
pass (round 4). The resident-engine integration is covered in
tests/test_resident.py; here the pass itself is pinned:

* `dot_general_as_mulsum` must reproduce `lax.dot_general`'s output
  layout and values for ARBITRARY dimension_numbers (fuzzed), not just
  the vmap-produced matvec forms;
* `eval_jaxpr_no_dots` must leave dot-free jaxprs bitwise alone, reach
  dots through pjit/custom_vjp wrappers, and refuse dots hidden inside
  control-flow sub-jaxprs.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from quasinewtonmethods_jl_tpu.ops.dot_rewrite import (
    dot_general_as_mulsum,
    eval_jaxpr_no_dots,
    jaxpr_has_dots,
)


def _random_dot_case(rng, max_rank=4, max_dim=5):
    """A random (lhs, rhs, dimension_numbers) triple that lax.dot_general
    accepts: shared batch dims, shared contract dims, free dims each."""
    nb = int(rng.integers(0, 3))
    nc = int(rng.integers(0, 3))
    nlf = int(rng.integers(0, max_rank - nb - nc + 1))
    nrf = int(rng.integers(0, max_rank - nb - nc + 1))
    bdims = [int(d) for d in rng.integers(1, max_dim, nb)]
    cdims = [int(d) for d in rng.integers(1, max_dim, nc)]
    lfdims = [int(d) for d in rng.integers(1, max_dim, nlf)]
    rfdims = [int(d) for d in rng.integers(1, max_dim, nrf)]

    def build(batch, contract, free):
        rank = len(batch) + len(contract) + len(free)
        perm = rng.permutation(rank)
        # role of each axis position after permutation
        roles = (["b"] * len(batch) + ["c"] * len(contract)
                 + ["f"] * len(free))
        dims = batch + contract + free
        shape = [dims[p] for p in perm]
        b_axes = [i for i, p in enumerate(perm) if roles[p] == "b"]
        c_axes = [i for i, p in enumerate(perm) if roles[p] == "c"]
        # order batch/contract axes by their ROLE index so lhs/rhs agree
        b_axes.sort(key=lambda i: perm[i])
        c_axes.sort(key=lambda i: perm[i])
        arr = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        return arr, tuple(b_axes), tuple(c_axes)

    lhs, lb, lc = build(bdims, cdims, lfdims)
    rhs, rb, rc = build(bdims, cdims, rfdims)
    return lhs, rhs, ((lc, rc), (lb, rb))


def test_mulsum_matches_dot_general_fuzz():
    rng = np.random.default_rng(42)
    for i in range(60):
        lhs, rhs, dn = _random_dot_case(rng)
        want = lax.dot_general(lhs, rhs, dn,
                               precision=lax.Precision.HIGHEST)
        got = dot_general_as_mulsum(lhs, rhs, dn)
        assert got.shape == want.shape, (i, dn, lhs.shape, rhs.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=f"case {i}: dn={dn} lhs={lhs.shape} rhs={rhs.shape}",
        )


def test_mulsum_chunked_path(monkeypatch):
    """With a tiny temp budget every contraction takes the chunked
    static-loop path (the VMEM guard that fixed the n=60 on-chip compile
    crash, scripts/tpu_experiments_r4b.py) — values must still match."""
    import quasinewtonmethods_jl_tpu.ops.dot_rewrite as dr

    monkeypatch.setattr(dr, "_TEMP_ELEMS_BUDGET", 16)
    rng = np.random.default_rng(3)
    for i in range(25):
        lhs, rhs, dn = _random_dot_case(rng)
        want = lax.dot_general(lhs, rhs, dn,
                               precision=lax.Precision.HIGHEST)
        got = dr.dot_general_as_mulsum(lhs, rhs, dn)
        assert got.shape == want.shape, (i, dn)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=f"chunked case {i}: dn={dn}",
        )


@pytest.mark.parametrize(
    "shapes,dn",
    [
        # plain matvec / vecmat / matmat
        (((4, 3), (3,)), (((1,), (0,)), ((), ()))),
        (((3,), (3, 4)), (((0,), (0,)), ((), ()))),
        (((4, 3), (3, 5)), (((1,), (0,)), ((), ()))),
        # the vmap-produced lane-batched matvec (batch last on lhs)
        (((8, 4, 3), (8, 3)), (((2,), (1,)), ((0,), (0,)))),
        # inner product and outer product
        (((5,), (5,)), (((0,), (0,)), ((), ()))),
        (((4,), (6,)), (((), ()), ((), ()))),
    ],
)
def test_mulsum_canonical_forms(shapes, dn):
    rng = np.random.default_rng(0)
    lhs = jnp.asarray(rng.standard_normal(shapes[0]), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(shapes[1]), jnp.float32)
    want = lax.dot_general(lhs, rhs, dn, precision=lax.Precision.HIGHEST)
    got = dot_general_as_mulsum(lhs, rhs, dn)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_mulsum_preferred_element_type():
    lhs = jnp.ones((4, 3), jnp.bfloat16)
    rhs = jnp.ones((3,), jnp.bfloat16)
    out = dot_general_as_mulsum(
        lhs, rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    assert out.dtype == jnp.float32


def _collect_dots(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            out.append(eqn)
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                _collect_dots(v.jaxpr, out)


def test_rewritten_jaxpr_only_mosaic_lowerable_dots():
    """Re-tracing the rewritten evaluator must leave ONLY dots Mosaic can
    lower: canonical no-batch 2D matmuls (kept on purpose since round 4 —
    MXU beats the VPU mul+reduce and skips the broadcast temporary). Any
    batched / 1D / multi-contraction dot must be gone."""
    Q = jnp.asarray(np.random.default_rng(1).standard_normal((6, 6)),
                    jnp.float32)

    def quad(x):
        return -0.5 * x @ (Q @ x)

    def vag_b(X):
        fv, gv = jax.vmap(jax.value_and_grad(quad), in_axes=1,
                          out_axes=(0, 1))(X)
        return fv, gv

    X = jnp.ones((6, 8), jnp.float32)
    closed = jax.make_jaxpr(vag_b)(X)
    assert jaxpr_has_dots(closed.jaxpr)

    def rewritten(X):
        return eval_jaxpr_no_dots(closed.jaxpr, closed.consts, X)

    re_jaxpr = jax.make_jaxpr(rewritten)(X)
    dots = []
    _collect_dots(re_jaxpr.jaxpr, dots)
    for eqn in dots:
        (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
        assert not lb and not rb, "batched dot survived the rewrite"
        assert all(v.aval.ndim == 2 for v in eqn.invars)
        assert (tuple(lc), tuple(rc)) == ((1,), (0,)), "non-canonical dot"
    # and values agree
    want = vag_b(X)
    got = rewritten(X)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=1e-5)


def test_dot_free_jaxpr_bitwise_unchanged():
    def rosen(x):
        return -jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                        + (1.0 - x[:-1]) ** 2)

    x = jnp.asarray(np.random.default_rng(2).standard_normal(6))
    closed = jax.make_jaxpr(jax.value_and_grad(rosen))(x)
    want = jax.core.eval_jaxpr(closed.jaxpr, closed.consts, x)
    got = eval_jaxpr_no_dots(closed.jaxpr, closed.consts, x)
    for w, g in zip(want, got):
        assert np.array_equal(np.asarray(w), np.asarray(g))


def test_reaches_dots_through_pjit_wrapper():
    Q = jnp.eye(4) * 2.0

    @jax.jit
    def inner(x):
        return Q @ x

    def obj(x):
        return jnp.sum(inner(x))

    x = jnp.ones((4,))
    closed = jax.make_jaxpr(obj)(x)
    got = eval_jaxpr_no_dots(closed.jaxpr, closed.consts, x)
    np.testing.assert_allclose(np.asarray(got[0]), 8.0)

    def rewritten(x):
        return eval_jaxpr_no_dots(closed.jaxpr, closed.consts, x)

    assert not jaxpr_has_dots(jax.make_jaxpr(rewritten)(x).jaxpr)


def test_control_flow_dot_rewrites_through_scan():
    """Round-5: a dot inside a scan body is rewritten (the evaluator
    re-binds the scan with its body routed through itself) — value
    parity with the unrewritten program, scan preserved in the output
    jaxpr (the loop is NOT unrolled)."""
    Q = 0.5 * jnp.eye(3) + 0.1

    def obj(x):
        def body(c, _):
            return Q @ c, None

        out, _ = lax.scan(body, x, None, length=3)
        return jnp.sum(out)

    x = jnp.arange(1.0, 4.0)
    closed = jax.make_jaxpr(obj)(x)
    out = eval_jaxpr_no_dots(closed.jaxpr, closed.consts, x)[0]
    np.testing.assert_allclose(float(out), float(obj(x)), rtol=1e-12)

    # the rewritten program still contains a scan (not unrolled) and no
    # non-2D dot; this body's (3,3)x(3,) matvec must be mulsum-rewritten
    rewritten = jax.make_jaxpr(
        lambda v: eval_jaxpr_no_dots(closed.jaxpr, closed.consts, v)
    )(x)
    names = [e.primitive.name for e in rewritten.jaxpr.eqns]
    assert "scan" in names
    body_jaxpr = next(
        e for e in rewritten.jaxpr.eqns if e.primitive.name == "scan"
    ).params["jaxpr"].jaxpr
    assert not jaxpr_has_dots(body_jaxpr)


def test_dot_free_control_flow_allowed():
    def obj(x):
        def body(c, _):
            return c * 1.5, None

        out, _ = lax.scan(body, x, None, length=3)
        return jnp.sum(out)

    x = jnp.ones((3,))
    closed = jax.make_jaxpr(obj)(x)
    got = eval_jaxpr_no_dots(closed.jaxpr, closed.consts, x)
    np.testing.assert_allclose(np.asarray(got[0]), float(3 * 1.5 ** 3))
