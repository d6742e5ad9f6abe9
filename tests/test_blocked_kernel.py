"""Plane-blocked two-pass Pallas BFGS update: oracle equivalence + dispatch.

The blocked kernel widens the Pallas envelope past the full-tile VMEM
ceiling (n ~ 95 f32) to any n whose (block_r, n, block_batch) row slabs
fit VMEM — 3 HBM passes over B instead of the XLA fallback's ~6. These
tests pin: (1) exact semantic equivalence with the jnp oracle
`fused_bfgs_update_reference` (interpret mode), (2) the feasibility /
auto-dispatch logic, (3) end-to-end engine convergence through the
blocked path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.batched_solve import (
    _auto_kernel,
    optimize_batched_fused,
)
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity
from quasinewtonmethods_jl_tpu.ops.pallas.bfgs_blocked import (
    blocked_feasible_rows,
    fused_bfgs_update_blocked,
)
from quasinewtonmethods_jl_tpu.ops.pallas.bfgs_kernel import (
    fused_bfgs_update_reference,
)


def _random_problem(rng, n, batch):
    B = np.zeros((n, n, batch))
    for b in range(batch):
        A = rng.standard_normal((n, n)) * 0.2
        B[:, :, b] = A @ A.T + np.eye(n)
    s = jnp.asarray(rng.standard_normal((n, batch)) * 0.1)
    g = jnp.asarray(rng.standard_normal((n, batch)))
    y = s + 0.01 * jnp.asarray(rng.standard_normal((n, batch)))
    gold = g + y
    return jnp.asarray(B), s, g, gold


@pytest.mark.parametrize("block_r", [1, 3, 4, 12])
def test_blocked_interpret_matches_oracle(block_r, rng):
    n, batch = 12, 32
    B, s, g, gold = _random_problem(rng, n, batch)
    # mix of frozen, fresh-identity, reset-bound, and normal lanes
    active = jnp.ones((1, batch)).at[0, :5].set(0.0)
    fresh = jnp.zeros((1, batch)).at[0, 5:9].set(1.0)

    ref = fused_bfgs_update_reference(B, s, g, gold, active, fresh)
    ker = fused_bfgs_update_blocked(
        B, s, g, gold, active, fresh,
        block_r=block_r, block_batch=16, interpret=True,
    )
    for a, b2, name in zip(ker, ref, ["B", "d", "m", "reset"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), atol=1e-10, err_msg=name
        )


def test_blocked_xla_matvec_matches_oracle(rng):
    """The matvec='xla' variant (MXU pass 1 + Pallas pass 2; kept as a
    measured negative result — see CLAUDE.md — but still semantically
    supported) must match the oracle too."""
    n, batch = 12, 32
    B, s, g, gold = _random_problem(rng, n, batch)
    active = jnp.ones((1, batch)).at[0, :5].set(0.0)
    fresh = jnp.zeros((1, batch)).at[0, 5:9].set(1.0)
    ref = fused_bfgs_update_reference(B, s, g, gold, active, fresh)
    ker = fused_bfgs_update_blocked(
        B, s, g, gold, active, fresh,
        block_r=4, block_batch=16, interpret=True, matvec="xla",
    )
    for a, b2, name in zip(ker, ref, ["B", "d", "m", "reset"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), atol=1e-10, err_msg=name
        )


def test_blocked_reset_lane_identity(rng):
    """A lane forced onto the reset path (descent curvature) must come out
    as an exact identity — the in-kernel iota eye uses the *global* row
    offset, which is the part a row-blocked kernel can get wrong."""
    n, batch = 8, 4
    B, s, g, gold = _random_problem(rng, n, batch)
    # lane 1: negative-definite B -> gB'g <= 0 -> m_pre <= 0 -> reset
    B = B.at[:, :, 1].set(-10.0 * jnp.eye(n))
    active = jnp.ones((1, batch))
    fresh = jnp.zeros((1, batch))
    ref = fused_bfgs_update_reference(B, s, g, gold, active, fresh)
    assert float(ref[3][0, 1]) == 1.0  # fixture sanity: the oracle resets
    Bout, d, m, reset = fused_bfgs_update_blocked(
        B, s, g, gold, active, fresh, block_r=2, block_batch=4, interpret=True
    )
    assert float(reset[0, 1]) == 1.0
    np.testing.assert_array_equal(np.asarray(Bout[:, :, 1]), np.eye(n))
    np.testing.assert_allclose(np.asarray(d[:, 1]), np.asarray(g[:, 1]))


def test_blocked_feasible_rows():
    # measured envelope: ~5 slabs of block_r*n*block*itemsize in ~14 MB
    assert blocked_feasible_rows(128, 4) == 32
    assert blocked_feasible_rows(256, 4) == 16
    assert blocked_feasible_rows(512, 4) == 8
    # n = 1024 would need block_r = 4, but block_r is the second-minor dim
    # of the vector blocks and must be a multiple of 8 -> infeasible
    assert blocked_feasible_rows(1024, 4) is None
    # lane-alignment constraints: n % 8, block_batch % 128
    assert blocked_feasible_rows(100, 4) is None
    assert blocked_feasible_rows(128, 4, block_batch=64) is None
    assert blocked_feasible_rows(100, 4, require_lane_alignment=False) == 50
    # f64 halves the row budget: largest 8-multiple divisor within 5 rows
    # of 512 doesn't exist -> infeasible
    assert blocked_feasible_rows(512, 8) is None
    assert blocked_feasible_rows(256, 8) == 8


def test_auto_kernel_dispatch():
    # small n: full-tile kernel; mid n (the measured win region): blocked;
    # larger n and non-multiple-of-8 n: XLA fused update
    assert _auto_kernel("pallas", 60, 4, 128) == ("pallas", 128)
    assert _auto_kernel("pallas", 128, 4, 128) == ("pallas_blocked", 128)
    assert _auto_kernel("pallas", 192, 4, 128) == ("pallas_blocked", 128)
    assert _auto_kernel("pallas", 256, 4, 128) == ("xla", 128)
    assert _auto_kernel("pallas", 512, 4, 128) == ("xla", 128)
    assert _auto_kernel("pallas", 100, 4, 128) == ("xla", 128)
    assert _auto_kernel("xla", 128, 4, 128) == ("xla", 128)
    # 64-bit fleets (x64 debugging on TPU): Mosaic has no 64-bit
    # lowering, so 'pallas' resolves to the XLA update at any n
    assert _auto_kernel("pallas", 60, 8, 128) == ("xla", 128)
    assert _auto_kernel("pallas", 128, 8, 128) == ("xla", 128)


def test_blocked_engine_matches_xla_engine(rng):
    """Whole-solve equivalence: the engine through the blocked kernel must
    reproduce the XLA-update engine lane for lane on a stable problem."""
    def quad(x):
        diag = jnp.arange(1.0, x.shape[0] + 1.0, dtype=x.dtype)
        return -0.5 * jnp.sum(diag * x * x)

    n, batch = 16, 8
    X0 = jnp.asarray(rng.standard_normal((batch, n)))
    r_xla = optimize_batched_fused(quad, X0, kernel="xla")
    r_blk = optimize_batched_fused(
        quad, X0, kernel="pallas_blocked_interpret", block_batch=8
    )
    assert np.all(np.asarray(r_blk.status) == qnm.Status.CONVERGED)
    np.testing.assert_array_equal(
        np.asarray(r_xla.iterations), np.asarray(r_blk.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(r_xla.x), np.asarray(r_blk.x), atol=1e-10
    )


def test_blocked_engine_rosenbrock_converges(rng):
    n, batch = 16, 8
    X0 = jnp.asarray(rng.standard_normal((batch, n)))
    res = optimize_batched_fused(
        rosenbrock_logdensity, X0,
        kernel="pallas_blocked_interpret", block_batch=8,
    )
    assert np.all(np.asarray(res.status) == qnm.Status.CONVERGED)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, rtol=1e-5)
    assert float(jnp.max(jnp.abs(res.grad))) < 1e-8
