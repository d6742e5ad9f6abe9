"""Whole-solve VMEM-resident Pallas engine — one kernel launch per solve.

Motivation (measured, CLAUDE.md perf history): the fused batched engine's
iteration is ~102 us of device compute but ~230 us of wall, the difference
being the ~118 us per-kernel-sequence invocation tax of the tunneled
runtime, paid EVERY outer iteration; unrolling does not amortize it. This
engine pays it once per SOLVE: the entire driver loop — top-of-iteration
evaluation, fused rank-2 update + direction, masked Armijo backtracking
line search with the objective traced inline — runs inside ONE Pallas
kernel per (n, n, block_batch) tile, with B resident in VMEM across all
iterations. HBM traffic on B drops from 2 passes/iteration to a single
final write-back.

This is the reference's actual design point expressed TPU-natively: the
whole of `optimize!` (reference src/QuasiNewtonMethods.jl:237-292) runs in
registers/L1 with zero per-iteration dispatch; here "registers/L1" becomes
VMEM and "one call" becomes one `pallas_call` program per lane block.

Constraints (checked at dispatch):
  * the objective must trace to Mosaic-lowerable ops. Elementwise /
    reduction objectives (Rosenbrock and friends) lower directly; matvec-
    bearing objectives (x @ Q, datasets) trace to `dot_general` forms
    Mosaic cannot lower (the batched-dots blocker, verified on v5e in
    rounds 2-3: `#tpu.dot_dimension_numbers` parse error) — since round
    4 these are REWRITTEN to broadcast-multiply + reduce_sum
    (`ops.dot_rewrite`, on by default via ``rewrite_dots``), the same
    form the kernel uses for its own B·y, and lower on real TPUs. Since
    round 5 the rewrite also reaches through control flow: a
    scan/while/cond body carrying dots is re-bound with the body routed
    through the evaluator (state-space/AR scan-shaped log-densities run
    here now). Closed-over data arrays are supported: constants are
    hoisted to explicit kernel inputs (`_hoist_consts`) and must fit
    VMEM;
  * the (n, n, block) tile plus expression temporaries must fit VMEM —
    same feasibility rule as the per-iteration kernel
    (`pallas_feasible_block`), n <= ~95 for f32;
  * BackTracking line search only (the Wolfe/fold/compaction options live
    on the general engine).

Each grid program loops until ITS OWN block's lanes finish — per-block
straggler cost instead of the global-fleet straggler the lockstep engine
pays (blocks execute back-to-back on the core; a fast block's budget is
not spent waiting on a slow one).

Semantics are lane-for-lane identical to `optimize_batched_fused` with
`fold_eval=False` (same peel, same masks, same status codes): statuses
and iteration/evaluation counters match EXACTLY; float leaves agree to
last-ulp reassociation noise (the objective evaluated inside the kernel
can differ by 1 ulp from a solver-level evaluation — fuzz-verified).
Regression-tested via interpret mode against both per-iteration engines.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .api import as_value_and_grad, as_value_fn
from .batched_solve import (
    _armijo_propose,
    _result_from_batched_carry,
    _Carry,
    pallas_feasible_block,
)
from .ops.bfgs import h0_gamma
from .ops.dot_rewrite import eval_jaxpr_no_dots
from .ops.linesearch import BackTracking
from .solve import MAX_ITERATIONS_DEFAULT, STALL_LIMIT_DEFAULT, OptimizeResult
from .state import Status
from .utils.scalars import finite_halving_limit, sqrt_tolerance

__all__ = ["optimize_batched_resident", "resident_feasible"]


def resident_feasible(n: int, itemsize: int, block_batch: int = 128) -> bool:
    """Whether the whole-solve kernel can hold its working set in VMEM.

    Reuses the per-iteration kernel's measured budget: the resident kernel
    holds the same peak set (B carry + update temporaries + output tile) —
    the line-search phase only adds (n, block) vectors."""
    return pallas_feasible_block(n, itemsize, block_batch) == block_batch


def _hoist_consts(fn, x_ex, rewrite_dots: bool = True):
    """(pure_fn, consts): trace ``fn`` (one array argument) to a jaxpr and
    return a callable taking the jaxpr's constants explicitly —
    `jax.closure_convert` for CONCRETE closure arrays, which the real one
    leaves baked in (it only hoists tracers).

    With ``rewrite_dots`` (the default), every ``dot_general`` in the
    jaxpr is re-expressed as broadcast-multiply + reduce_sum
    (`ops.dot_rewrite`) so matvec-bearing objectives (quadratics,
    logistic MAP, dataset models) lower through Mosaic instead of hitting
    the batched-dots blocker — the round-4 unblocking of BASELINE
    configs 2-3 on this engine."""
    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(x_ex)
    treedef = jax.tree_util.tree_structure(out_shape)

    def pure(x, *consts):
        if rewrite_dots:
            out = eval_jaxpr_no_dots(closed.jaxpr, list(consts), x)
        else:
            out = jax.core.eval_jaxpr(closed.jaxpr, list(consts), x)
        return jax.tree_util.tree_unflatten(treedef, out)

    return pure, list(closed.consts)


class _LS(NamedTuple):
    a1: jax.Array  # (1, gb)
    a2: jax.Array
    fx0: jax.Array
    fx1: jax.Array
    it: jax.Array  # (1, gb) int32


def _make_kernel(vag_cc: Callable, f_cc: Callable, const_shapes, n_vag: int,
                 n: int, ls: BackTracking,
                 tol: float, max_iterations: int, stall_limit: int,
                 h0_scale: bool, dtype):
    """Build the kernel body. vag_cc/f_cc are the CLOSURE-CONVERTED
    lane-batched objective ((n, gb), *consts) -> ((1, gb), (n, gb)) /
    (1, gb): objectives that close over data arrays (datasets, quadratic
    forms) have those arrays hoisted to explicit kernel inputs —
    pallas_call rejects captured array constants. ``const_shapes`` are the
    ORIGINAL shapes (inputs arrive >=2D for Mosaic; reshaped back before
    the call); the first ``n_vag`` belong to vag_cc, the rest to f_cc."""
    # Python-float constants: jnp scalars made at build time would be
    # captured closure constants, which pallas_call rejects; weakly-typed
    # literals fold into the kernel without changing the compute dtype.
    tol_c = float(tol)
    c1 = float(ls.c1)
    rho_hi = float(ls.rho_hi)
    rho_lo = float(ls.rho_lo)
    eps = float(jnp.finfo(dtype).eps)
    sqrttol = float(sqrt_tolerance(dtype))
    ls_budget = ls.iterations + finite_halving_limit(dtype)
    one = 1.0

    def linesearch(X, d, f0, m, active, f_b):
        """Masked Armijo backtracking over the block's lanes — the merged
        finite+Armijo loop of `_batched_linesearch`, (1, gb) shapes."""
        gb = f0.shape[1]
        ones = jnp.ones((1, gb), dtype)
        fx1 = f_b(X + ones * d)  # alpha = 1 trial
        doomed = ~(jnp.isfinite(m) & jnp.isfinite(f0))

        def suff(c: _LS):
            return c.fx1 >= f0 + c.a2 * c1 * m

        def arm_lane(c: _LS):
            return active & ~doomed & ~suff(c) & (c.it < ls_budget)

        def cond(c: _LS):
            return jnp.any(arm_lane(c))

        def body(c: _LS):
            lane = arm_lane(c)
            it = c.it + lane
            a1, a2 = _armijo_propose(
                m, f0, c.a1, c.a2, c.fx0, c.fx1, it, lane, ls, eps, sqrttol,
                rho_hi, rho_lo,
            )
            fx0 = jnp.where(lane, c.fx1, c.fx0)
            fx1 = jnp.where(lane, f_b(X + a2 * d), c.fx1)
            return _LS(a1, a2, fx0, fx1, it)

        zero_i = jnp.zeros((1, gb), jnp.int32)
        ac = lax.while_loop(cond, body, _LS(ones, ones, f0, fx1, zero_i))
        ok = suff(ac)
        alpha = jnp.where(active & ok, ac.a2, jnp.zeros((), dtype))
        n_ev = active.astype(jnp.int32) + ac.it
        failed = active & (alpha == 0.0)
        return alpha, n_ev, failed

    def kernel(X0_ref, status0_ref, *rest):
        nc = len(const_shapes)
        const_refs, out_refs = rest[:nc], rest[nc:]
        (Xout, Gout, Goldout, Stepout, Bout, funout, statusout,
         itersout, nfevout, ngevout, nresetsout, freshout, stallout) = (
            out_refs
        )
        consts = [
            r[:].reshape(shape) for r, shape in zip(const_refs, const_shapes)
        ]

        def vag_b(X):
            return vag_cc(X, *consts[:n_vag])

        def f_b(X):
            return f_cc(X, *consts[n_vag:])

        gb = X0_ref.shape[1]
        zero_v = jnp.zeros((n, gb), dtype)
        zero_s = jnp.zeros((1, gb), jnp.int32)
        nan_s = jnp.full((1, gb), jnp.nan, dtype)
        eye_b = (
            jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        ).astype(dtype)[:, :, None] * jnp.ones((1, 1, gb), dtype)

        # Big state (X, G, G_old, STEP, B) lives in the OUTPUT refs and is
        # mutated in place each iteration; the while carry holds only the
        # (1, gb) scalars-per-lane. A functional carry was measured ~3x
        # slower per block-iteration on v5e — Mosaic's loop-carried values
        # round-trip through VMEM copies, and the (n, n, gb) B copy
        # dominates; ref mutation eliminates it.
        Xout[:] = X0_ref[:]
        Gout[:] = zero_v
        Goldout[:] = zero_v
        Stepout[:] = zero_v
        Bout[:] = eye_b

        def make_body(first: bool):
            def body(c):
                (fun, fprev, k, status, iters, n_fev, n_gev, n_resets,
                 fresh, stall) = c
                X = Xout[:]
                f0, g = vag_b(X)
                was_active = (status == Status.RUNNING) & (k < max_iterations)
                nonfinite = ~jnp.isfinite(f0)
                converged = jnp.max(jnp.abs(g), axis=0, keepdims=True) < tol_c
                # NOT jnp.where(isnan, True, f0 > fprev): a scalar
                # Python-bool branch inside where crashes the Mosaic
                # compile helper (bisected on v5e — `|` is identical here)
                improved = jnp.isnan(fprev) | (f0 > fprev)
                stall_n = jnp.where(
                    was_active & ~improved, stall + 1, jnp.zeros_like(stall)
                )
                stall_n = jnp.where(was_active, stall_n, stall)
                stalled = (
                    stall_n >= stall_limit
                    if stall_limit
                    else jnp.zeros_like(was_active)
                )
                status_pre = jnp.where(
                    was_active,
                    jnp.where(
                        nonfinite,
                        jnp.int32(Status.NONFINITE_VALUE),
                        jnp.where(
                            converged,
                            jnp.int32(Status.CONVERGED),
                            jnp.where(
                                stalled,
                                jnp.int32(Status.LINESEARCH_FAILURE),
                                jnp.int32(Status.RUNNING),
                            ),
                        ),
                    ),
                    status,
                )
                active = (status_pre == Status.RUNNING) & was_active
                amask = active.astype(dtype)  # (1, gb)

                if first:
                    gg = jnp.sum(g * g, axis=0, keepdims=True)
                    d = g * amask
                    m = jnp.where(active, gg, jnp.ones_like(gg))
                    reset = active
                else:
                    # in-VMEM fused update: identical algebra to the
                    # per-iteration Pallas kernel (ops/pallas/
                    # bfgs_kernel.py); B never leaves VMEM between
                    # iterations and is updated IN PLACE in Bout.
                    B = Bout[:]
                    s = Stepout[:]
                    y = Goldout[:] - g
                    sty = jnp.sum(s * y, axis=0, keepdims=True)
                    rho = one / sty
                    yty = jnp.sum(y * y, axis=0, keepdims=True)
                    if h0_scale:
                        scale = h0_gamma(
                            sty, yty, (fresh > 0) & active, dtype
                        )
                    else:
                        scale = jnp.ones_like(sty)
                    By = jnp.sum(B * y[:, None, :], axis=0) * scale
                    Bg = jnp.sum(B * g[:, None, :], axis=0) * scale
                    ytBy = jnp.sum(By * y, axis=0, keepdims=True)
                    u = By * rho
                    cc1 = (one + ytBy * rho) * rho
                    w = jnp.sum(s * g, axis=0, keepdims=True)
                    v = jnp.sum(u * g, axis=0, keepdims=True)
                    gBg = jnp.sum(Bg * g, axis=0, keepdims=True)
                    m_pre = gBg + cc1 * w * w - 2.0 * w * v
                    d_upd = Bg + (cc1 * w) * s - w * u - v * s
                    gg = jnp.sum(g * g, axis=0, keepdims=True)

                    reset = (m_pre <= 0.0) & active
                    do_upd = (~reset) & active
                    eye = (
                        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
                        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
                    ).astype(dtype)[:, :, None]
                    B_upd = (
                        scale[None] * B
                        + cc1[None] * (s[:, None, :] * s[None, :, :])
                        - u[:, None, :] * s[None, :, :]
                        - s[:, None, :] * u[None, :, :]
                    )
                    Bout[:] = jnp.where(
                        do_upd[None], B_upd, jnp.where(reset[None], eye, B)
                    )
                    d = jnp.where(
                        active, jnp.where(reset, g, d_upd), jnp.zeros_like(g)
                    )
                    m = jnp.where(
                        active,
                        jnp.where(reset, gg, m_pre),
                        jnp.ones_like(m_pre),
                    )

                alpha, ls_fev, ls_failed = linesearch(X, d, f0, m, active, f_b)
                take = active & ~ls_failed
                step = jnp.where(take, alpha * d, jnp.zeros_like(d))
                new_status = jnp.where(
                    active & ls_failed,
                    jnp.int32(Status.LINESEARCH_FAILURE),
                    status_pre,
                )
                top_ev = was_active.astype(jnp.int32)

                Xout[:] = X + step
                Gout[:] = jnp.where(was_active, g, Gout[:])
                Goldout[:] = jnp.where(active, g, Goldout[:])
                Stepout[:] = jnp.where(active, step, Stepout[:])
                return (
                    jnp.where(was_active, f0, fun),
                    jnp.where(was_active, f0, fprev),
                    k + 1,
                    new_status,
                    iters + active.astype(jnp.int32),
                    n_fev + top_ev + ls_fev,
                    n_gev + top_ev,
                    n_resets + reset.astype(jnp.int32),
                    jnp.where(active, reset.astype(jnp.int32), fresh),
                    stall_n,
                )

            return body

        c0 = (nan_s, nan_s, jnp.zeros((), jnp.int32), status0_ref[:],
              zero_s, zero_s, zero_s, zero_s,
              jnp.ones((1, gb), jnp.int32), zero_s)

        def cond(c):
            return jnp.logical_and(
                c[2] < max_iterations, jnp.any(c[3] == Status.RUNNING)
            )

        if max_iterations >= 1:
            c1_ = make_body(True)(c0)
            fc = lax.while_loop(cond, make_body(False), c1_)
        else:
            fc = c0
        (fun, _fprev, _k, status, iters, n_fev, n_gev, n_resets, fresh,
         stall) = fc
        statusout[:] = jnp.where(
            status == Status.RUNNING,
            jnp.int32(Status.MAX_ITERATIONS),
            status,
        )
        funout[:] = fun
        itersout[:] = iters
        nfevout[:] = n_fev
        ngevout[:] = n_gev
        nresetsout[:] = n_resets
        freshout[:] = fresh
        stallout[:] = stall

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "obj", "ls", "tol", "max_iterations", "value_and_grad_fn",
        "block_batch", "h0_scale", "stall_limit", "interpret",
        "rewrite_dots",
    ),
)
def _optimize_batched_resident_jit(
    obj, x0s, ls, tol, max_iterations, value_and_grad_fn, block_batch,
    h0_scale, stall_limit, interpret, rewrite_dots,
):
    vag = as_value_and_grad(obj, value_and_grad_fn)
    f = as_value_fn(obj, value_and_grad_fn)

    def vag_b(X):  # (n, gb) -> ((1, gb), (n, gb))
        fv, gv = jax.vmap(vag, in_axes=1, out_axes=(0, 1))(X)
        return fv[None, :], gv

    def f_b(X):
        return jax.vmap(f, in_axes=1, out_axes=0)(X)[None, :]

    user_batch, n = x0s.shape
    dtype = x0s.dtype
    pad = (-user_batch) % block_batch
    batch = user_batch + pad
    X0 = (
        jnp.concatenate([x0s, jnp.broadcast_to(x0s[:1], (pad, n))]).T
        if pad
        else x0s.T
    )
    status0 = (
        jnp.concatenate(
            [
                jnp.full((user_batch,), Status.RUNNING, jnp.int32),
                jnp.full((pad,), Status.MAX_ITERATIONS, jnp.int32),
            ]
        )
        if pad
        else jnp.full((batch,), Status.RUNNING, jnp.int32)
    )[None, :]

    # Hoist the objective's closed-over data arrays (datasets, quadratic
    # forms, ...) into explicit kernel inputs: pallas_call rejects captured
    # array constants. jax.closure_convert only hoists TRACER constants
    # (its custom_vjp use case), so concrete closure arrays are extracted
    # by tracing to a jaxpr and re-evaluating it with the consts passed in.
    x_ex = jax.ShapeDtypeStruct((n, block_batch), dtype)
    vag_cc, vag_consts = _hoist_consts(vag_b, x_ex, rewrite_dots)
    f_cc, f_consts = _hoist_consts(f_b, x_ex, rewrite_dots)
    all_consts = list(vag_consts) + list(f_consts)
    const_shapes = tuple(jnp.shape(c) for c in all_consts)
    # Mosaic wants >=2D inputs; reshaped back to const_shapes in-kernel
    consts_2d = [
        jnp.asarray(c).reshape((1,) * max(0, 2 - jnp.ndim(c)) + jnp.shape(c))
        for c in all_consts
    ]

    kernel = _make_kernel(
        vag_cc, f_cc, const_shapes, len(vag_consts), n, ls, tol,
        max_iterations, stall_limit, h0_scale, dtype,
    )
    grid = (batch // block_batch,)
    mat = pl.BlockSpec(
        (n, n, block_batch), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    vec = pl.BlockSpec(
        (n, block_batch), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    sca = pl.BlockSpec(
        (1, block_batch), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    sca_i = sca
    const_specs = [
        pl.BlockSpec(
            c.shape,
            (lambda i, _nd=c.ndim: (0,) * _nd),
            memory_space=pltpu.VMEM,
        )
        for c in consts_2d
    ]

    fdt = jax.ShapeDtypeStruct((1, batch), dtype)
    idt = jax.ShapeDtypeStruct((1, batch), jnp.int32)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vec, sca_i] + const_specs,
        out_specs=[vec, vec, vec, vec, mat, sca, sca_i, sca_i, sca_i, sca_i,
                   sca_i, sca_i, sca_i],
        out_shape=[
            jax.ShapeDtypeStruct((n, batch), dtype),  # X
            jax.ShapeDtypeStruct((n, batch), dtype),  # G
            jax.ShapeDtypeStruct((n, batch), dtype),  # G_old
            jax.ShapeDtypeStruct((n, batch), dtype),  # STEP
            jax.ShapeDtypeStruct((n, n, batch), dtype),  # B
            fdt,  # fun
            idt,  # status
            idt, idt, idt, idt, idt, idt,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(X0, status0, *consts_2d)
    (X, G, G_old, STEP, B, fun, status, iters, nfev, ngev, nresets, fresh,
     stall) = outs
    fc = _Carry(
        X=X, G=G, G_old=G_old, STEP=STEP, B=B,
        fun=fun[0], fprev=fun[0], k=jnp.zeros((), jnp.int32),
        status=status[0], iterations=iters[0], n_fev=nfev[0], n_gev=ngev[0],
        n_resets=nresets[0], fresh=fresh[0] > 0, stall=stall[0],
    )
    if pad:
        fc = jax.tree_util.tree_map(
            lambda a: a[..., :user_batch]
            if a.ndim and a.shape[-1] == batch
            else a,
            fc,
        )
    return _result_from_batched_carry(fc)


def optimize_batched_resident(
    obj,
    x0s: jax.Array,
    ls: BackTracking = BackTracking(),
    tol: float = 1e-8,
    max_iterations: int = MAX_ITERATIONS_DEFAULT,
    value_and_grad_fn: Optional[Callable] = None,
    block_batch: int = 128,
    h0_scale: bool = True,
    stall_limit: int = STALL_LIMIT_DEFAULT,
    interpret: bool = False,
    rewrite_dots: bool = True,
) -> OptimizeResult:
    """Batched BFGS with the ENTIRE solve loop inside one Pallas kernel per
    lane block (see module docstring). Result-compatible with
    `optimize_batched_fused`; semantics match `fold_eval=False` exactly
    for dot-free objectives; matvec-bearing objectives (rewritten for
    Mosaic by `ops.dot_rewrite` when ``rewrite_dots``, the default) match
    to reduction-reassociation tolerance.

    Requires a Mosaic-traceable objective and `resident_feasible(n,
    itemsize)`; raises ValueError otherwise (callers that want automatic
    fallback use `optimize_batched_fused`, which stays the default engine).
    """
    x0s = jnp.asarray(x0s)
    if x0s.ndim != 2:
        raise ValueError(f"x0s must be (batch, n), got shape {x0s.shape}")
    if not isinstance(ls, BackTracking):
        raise ValueError(
            "the resident engine supports BackTracking line search only"
        )
    if not interpret and x0s.dtype.itemsize > 4:
        raise ValueError(
            f"resident kernel cannot lower {x0s.dtype} (Mosaic has no "
            "64-bit types); use optimize_batched_fused (its kernel "
            "dispatch falls back to the XLA update) or interpret=True"
        )
    if not interpret and not resident_feasible(
        x0s.shape[1], x0s.dtype.itemsize, block_batch
    ):
        raise ValueError(
            f"resident kernel infeasible for n={x0s.shape[1]} "
            f"block_batch={block_batch} (VMEM); use optimize_batched_fused"
        )
    return _optimize_batched_resident_jit(
        obj, x0s, ls, tol, max_iterations, value_and_grad_fn, block_batch,
        h0_scale, stall_limit, interpret, rewrite_dots,
    )
