"""Plane-blocked two-pass Pallas BFGS update — the mid-size-n hot kernel.

The full-tile fused kernel (`bfgs_kernel.fused_bfgs_update_batched`) needs
the whole (n, n, block_batch) inverse-Hessian tile resident in VMEM, and
Mosaic requires the minor (lane) block dimension to be a multiple of 128 —
so it cannot run past n ≈ 95 f32 (see `pallas_feasible_block`). Until this
round, larger n fell back to the fused XLA update, which compiles to ~6
HBM passes over the B tensor per iteration (stacked matvec read, update
read, select/copy traffic). The algorithm's floor for n too large to keep
B resident is **3 passes**: one read for the two matvecs, then one read +
one write for the rank-2 update. This module hits that floor by blocking
over *rows* (planes) of B instead of whole tiles:

  pass 1  `_matvec_kernel`: grid (batch_blocks, row_blocks); each step owns
          a (block_r, n, block_batch) slab of B and accumulates its
          contribution to BOTH matvecs By = Bᵀy and Bg = Bᵀg (valid by
          symmetry, exactly like the reference's transposed-read matvec,
          src/QuasiNewtonMethods.jl:44-52). The (n, block_batch) outputs
          stay VMEM-resident across the row-block sweep (their block index
          ignores the row dimension), so B is read exactly once.

  XLA     all O(n·batch) algebra between the passes: sᵀy, ρ, the H0 scale,
          yᵀBy, u, c₁, and the closed-form next direction d and
          directional derivative m (identical formulas to the full-tile
          kernel / the jnp oracle) — no B traffic at all.

  pass 2  `_update_kernel`: same grid; each step reads its B slab once,
          applies  B_out = scale·B + c₁·s⊗s − u⊗s − s⊗u  fused with the
          per-lane reset (identity re-init, with the global row offset
          reconstructed from the grid position) and frozen-lane selects,
          and writes the slab back into the *donated* B buffer.

The row-slab height `block_r` must divide n and be a multiple of 8 (it is
the second-minor dim of the (block_r, block_batch) vector blocks), so the
layout shrinks gracefully: VMEM feasibility is ~5 slabs of
block_r·n·block_batch elements, giving block_r = 32 at n=128 down to
block_r = 8 at n=512 (f32, block_batch=128).

Measured on a v5e (idle host, Rosenbrock fleets): at n=128 the engine
through this kernel runs at the exact 3-pass HBM floor (238 us/iter,
batch 1024) — 22% faster than the XLA-update engine (290 us/iter). From
n=256 up the XLA fused update itself reaches ~3 effective passes
(kernel-level microbench: 1103 vs 1108 us/call at n=256, 1728 vs 1711 at
n=512) and this kernel stops paying, so the engine auto-dispatch
(`batched_solve._BLOCKED_MAX_N`) bounds it to n <= 192; larger slabs that
might help (block_r 32+ at n=256) exceed the ~16 MB VMEM scope (compile
failure, measured).

Semantics are bit-for-bit those of `fused_bfgs_update_reference` modulo
float reassociation; the CI oracle test runs both in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bfgs import h0_gamma

__all__ = [
    "fused_bfgs_update_blocked",
    "blocked_feasible_rows",
]

# VMEM working-set budget for one grid step of the update kernel:
# input slab + donated output slab (each double-buffered by the pipeline)
# plus ~1 slab of expression temporaries. Same ~14 MB envelope measured
# for the full-tile kernel (batched_solve._PALLAS_VMEM_BUDGET).
_BLOCKED_VMEM_BUDGET = 14 * 1024 * 1024
_BLOCKED_SLAB_COUNT = 5


def blocked_feasible_rows(
    n: int, itemsize: int, block_batch: int = 128, *,
    require_lane_alignment: bool = True,
) -> Optional[int]:
    """Largest divisor of n usable as the row-slab height `block_r`, or
    None when the layout is infeasible (lane-block constraint or no slab
    fits VMEM). Mosaic constraints: the minor (lane) block dim must be a
    multiple of 128 and the second-minor a multiple of 8 — here those are
    (n, block_batch), so n must be a multiple of 8 (the full-tile kernel
    escapes this only because it never blocks the row axis either).
    block_r is also the second-minor dim of the (block_r, block_batch)
    VECTOR block specs, so it must itself be a multiple of 8 (or equal n):
    measured on v5e, block_r = 4 at n = 512 fails to lower with the same
    divisibility error. ``require_lane_alignment=False`` skips the hardware
    lane checks for interpret-mode (CPU) runs, where Mosaic never lowers
    the kernel."""
    if require_lane_alignment and (block_batch % 128 != 0 or n % 8 != 0):
        return None
    max_rows = _BLOCKED_VMEM_BUDGET // (
        _BLOCKED_SLAB_COUNT * n * block_batch * itemsize
    )
    if max_rows < 1:
        return None
    block_r = None
    for d in range(1, n + 1):
        if n % d != 0 or d > max_rows:
            continue
        if require_lane_alignment and d % 8 != 0 and d != n:
            continue
        block_r = d
    return block_r


def _matvec_kernel(B_ref, y_ref, g_ref, By_ref, Bg_ref):
    """Accumulate the row slab's contribution to By = Bᵀy and Bg = Bᵀg.

    The output blocks' index maps ignore the row-grid dimension, so Mosaic
    keeps them VMEM-resident across the (sequential) row sweep; j == 0
    initializes, later steps accumulate.
    """
    j = pl.program_id(1)
    B = B_ref[:]  # (block_r, n, gb)
    y = y_ref[:]  # (block_r, gb)
    g = g_ref[:]
    partial_By = jnp.sum(B * y[:, None, :], axis=0)  # (n, gb)
    partial_Bg = jnp.sum(B * g[:, None, :], axis=0)

    @pl.when(j == 0)
    def _init():
        By_ref[:] = partial_By
        Bg_ref[:] = partial_Bg

    @pl.when(j != 0)
    def _acc():
        By_ref[:] += partial_By
        Bg_ref[:] += partial_Bg


def _update_kernel(block_r, B_ref, s_row_ref, u_row_ref, s_ref, u_ref,
                   c1_ref, scale_ref, do_upd_ref, reset_ref, Bout_ref):
    """Rank-2 update of one row slab, fused with the reset/frozen selects.

    B_out[r, c] = do_upd ? scale·B + c₁·s[r]s[c] − u[r]s[c] − s[r]u[c]
                : reset  ? I[r, c]  (global row index = j·block_r + r)
                : B  (frozen lanes keep their tensor untouched)
    """
    j = pl.program_id(1)
    B = B_ref[:]  # (block_r, n, gb)
    s_row = s_row_ref[:]  # (block_r, gb)
    u_row = u_row_ref[:]
    s = s_ref[:]  # (n, gb)
    u = u_ref[:]
    c1 = c1_ref[:]  # (1, gb)
    scale = scale_ref[:]
    do_upd = do_upd_ref[:] > 0
    reset = reset_ref[:] > 0

    n = B.shape[1]
    B_upd = (
        scale[None, :, :] * B
        + c1[None, :, :] * (s_row[:, None, :] * s[None, :, :])
        - u_row[:, None, :] * s[None, :, :]
        - s_row[:, None, :] * u[None, :, :]
    )
    row_global = (
        jax.lax.broadcasted_iota(jnp.int32, (block_r, n), 0) + j * block_r
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (block_r, n), 1)
    eye = (row_global == col).astype(B.dtype)[:, :, None]
    Bout_ref[:] = jnp.where(
        do_upd[None, :, :], B_upd, jnp.where(reset[None, :, :], eye, B)
    )


@functools.partial(
    jax.jit, static_argnames=("block_r", "block_batch", "interpret", "matvec")
)
def fused_bfgs_update_blocked(
    B: jax.Array,  # (n, n, batch) inverse-Hessian stack, batch-minor
    step: jax.Array,  # (n, batch) previous accepted steps
    g: jax.Array,  # (n, batch) gradients at the new iterates
    g_old: jax.Array,  # (n, batch) gradients at the previous iterates
    active: jax.Array,  # (1, batch) float mask: 1.0 = lane still running
    fresh: jax.Array,  # (1, batch) float mask: 1.0 = B is a fresh identity
    *,
    block_r: int = 32,
    block_batch: int = 128,
    interpret: bool = False,
    matvec: str = "pallas",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Two-pass plane-blocked fused BFGS update + direction.

    Returns (B_out, d, m, reset_mask) with semantics identical to
    `fused_bfgs_update_reference` / `fused_bfgs_update_batched`. 3 HBM
    passes over B per call (the out-of-VMEM floor); B is donated.

    ``matvec``: 'pallas' computes pass 1 with the row-slab VPU kernel;
    'xla' uses the stacked dot_general (MXU) of the jnp oracle instead —
    same 1-read pass accounting, different unit. The hybrid exists because
    the two passes are separable: at larger n the MXU matvec sustains
    higher effective bandwidth than the VPU multiply-reduce, while pass
    2's donated write is what dodges the XLA path's carry copy either way.
    """
    n, _, batch = B.shape
    if batch % block_batch != 0:
        raise ValueError(
            f"batch ({batch}) must be a multiple of block_batch ({block_batch})"
        )
    if n % block_r != 0:
        raise ValueError(f"n ({n}) must be a multiple of block_r ({block_r})")
    dtype = B.dtype
    one = jnp.asarray(1.0, dtype)
    grid = (batch // block_batch, n // block_r)

    slab_spec = pl.BlockSpec(
        (block_r, n, block_batch),
        lambda i, j: (j, 0, i),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (block_r, block_batch), lambda i, j: (j, i), memory_space=pltpu.VMEM
    )
    full_spec = pl.BlockSpec(
        (n, block_batch), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    sca_spec = pl.BlockSpec(
        (1, block_batch), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    # The row sweep must run sequentially (the matvec accumulates across it
    # and the batch-block outputs flush only when the batch index changes).
    dims = ("parallel", "arbitrary")

    s = step
    y = g_old - g

    # ---- pass 1: both matvecs in one read of B ----
    if matvec == "pallas":
        By, Bg = pl.pallas_call(
            _matvec_kernel,
            grid=grid,
            in_specs=[slab_spec, row_spec, row_spec],
            out_specs=[full_spec, full_spec],
            out_shape=[
                jax.ShapeDtypeStruct((n, batch), dtype),
                jax.ShapeDtypeStruct((n, batch), dtype),
            ],
            compiler_params=pltpu.CompilerParams(dimension_semantics=dims),
            cost_estimate=pl.CostEstimate(
                flops=4 * n * n * batch,
                bytes_accessed=dtype.itemsize * n * n * batch,
                transcendentals=0,
            ),
            interpret=interpret,
        )(B, y, g)
    elif matvec == "xla":
        # the jnp oracle's stacked contraction: one MXU dot reads B once
        # for both matvecs (precision note in fused_bfgs_update_reference)
        yg = jnp.stack([y, g], axis=1)  # (n, 2, batch)
        ByBg = jnp.einsum(
            "rcb,rkb->kcb", B, yg, preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        By, Bg = ByBg[0], ByBg[1]
    else:
        raise ValueError(f"matvec must be 'pallas' or 'xla', got {matvec!r}")

    # ---- O(n·batch) algebra between the passes (identical to the oracle) ----
    sty = jnp.sum(s * y, axis=0, keepdims=True)  # (1, batch)
    rho = one / sty
    yty = jnp.sum(y * y, axis=0, keepdims=True)
    scale = h0_gamma(sty, yty, fresh > 0, dtype)
    By = By * scale
    Bg = Bg * scale
    ytBy = jnp.sum(By * y, axis=0, keepdims=True)
    u = By * rho
    c1 = (one + ytBy * rho) * rho
    w = jnp.sum(s * g, axis=0, keepdims=True)
    v = jnp.sum(u * g, axis=0, keepdims=True)
    gBg = jnp.sum(Bg * g, axis=0, keepdims=True)
    m_pre = gBg + c1 * w * w - 2.0 * w * v
    d_upd = Bg + (c1 * w) * s - w * u - v * s
    gg = jnp.sum(g * g, axis=0, keepdims=True)

    reset = (m_pre <= 0.0) & (active > 0)
    do_upd = (~reset) & (active > 0)
    d = jnp.where(active > 0, jnp.where(reset, g, d_upd), jnp.zeros_like(g))
    m = jnp.where(active > 0, jnp.where(reset, gg, m_pre), jnp.ones_like(m_pre))

    # ---- pass 2: rank-2 update + selects, one read + one donated write ----
    B_out = pl.pallas_call(
        functools.partial(_update_kernel, block_r),
        grid=grid,
        in_specs=[slab_spec, row_spec, row_spec, full_spec, full_spec,
                  sca_spec, sca_spec, sca_spec, sca_spec],
        out_specs=slab_spec,
        out_shape=jax.ShapeDtypeStruct((n, n, batch), dtype),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(dimension_semantics=dims),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * n * batch,
            bytes_accessed=2 * dtype.itemsize * n * n * batch,
            transcendentals=0,
        ),
        interpret=interpret,
    )(B, s, u, s, u, c1, scale, do_upd.astype(dtype), reset.astype(dtype))

    return B_out, d, m, reset.astype(dtype)
