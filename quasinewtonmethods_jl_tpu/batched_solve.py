"""Native batched BFGS driver — batch-minor layout, masked lockstep loops.

This is the TPU-first execution engine for fleets of independent solves (the
HMC-chain-init workload, reference README.md:14). Where `parallel.batch`
gets batching "for free" via `jax.vmap` of the scalar solver, this driver is
*written* batched, which buys three things the vmap path cannot express:

  1. **batch-minor layout**: the inverse-Hessian stack is (n, n, batch) and
     every vector is (n, batch), so each per-lane scalar op is a full VPU
     lane vector and the B tensor tiles with only the sublane n->8k padding
     (vs ~2x tile waste for a trailing (60, 60));
  2. **single-fetch updates**: the rank-2 update + next direction + reset
     logic evaluate through one fused formulation (closed-form d and m — no
     second matvec through B_new) in either the jnp fused form or the Pallas
     kernel, instead of the ~6-7 HBM passes the vmapped scalar solver
     compiles to (solver-level selects on B, separate matvec kernels);
  3. **explicit lane masking**: the driver controls exactly which carry
     leaves are touched for frozen lanes, so no B-sized select ever
     materializes outside the update.

Semantics are lane-for-lane those of `solve.optimize` (itself matching the
reference optimize!, src/QuasiNewtonMethods.jl:237-292): same line search,
same reset rule, same in-band status codes; `k` is global (all lanes start
together and run lockstep until every lane finishes or the cap hits).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .api import as_value_and_grad, as_value_fn
from .ops.linesearch import BackTracking
from .ops.pallas.bfgs_kernel import (
    fused_bfgs_update_batched,
    fused_bfgs_update_reference,
)
from .solve import MAX_ITERATIONS_DEFAULT, STALL_LIMIT_DEFAULT, OptimizeResult
from .state import BFGSState, Status
from .utils.scalars import finite_halving_limit, nanmax, nanmin, sqrt_tolerance

__all__ = ["optimize_batched_fused", "optimize_batched_fused_from_state"]


class _Carry(NamedTuple):
    X: jax.Array  # (n, batch) iterates
    G: jax.Array  # (n, batch) gradient at X (last evaluated)
    G_old: jax.Array  # (n, batch)
    STEP: jax.Array  # (n, batch) last accepted step (alpha * d)
    B: jax.Array  # (n, n, batch) inverse Hessians
    fun: jax.Array  # (batch,)
    k: jax.Array  # () global iteration counter
    status: jax.Array  # (batch,) int32
    iterations: jax.Array  # (batch,) int32
    n_fev: jax.Array  # (batch,) int32
    n_gev: jax.Array  # (batch,) int32
    n_resets: jax.Array  # (batch,) int32
    fresh: jax.Array  # (batch,) bool: lane's B is a fresh identity
    stall: jax.Array  # (batch,) int32 consecutive no-improvement iterations


class _LSCarry(NamedTuple):
    a1: jax.Array
    a2: jax.Array
    fx0: jax.Array
    fx1: jax.Array
    it: jax.Array  # (batch,) int32 armijo rounds (or finite halvings)
    n_fev: jax.Array  # (batch,) int32


def _batched_linesearch(phi, f0, m, active, ls: BackTracking, dtype):
    """Masked lockstep backtracking line search over a lane batch.

    Per-lane semantics identical to ops.linesearch.backtracking_linesearch
    (reference :165-232); `active=False` lanes are frozen throughout and
    return alpha = 0 (no step). phi maps an (batch,) alpha vector to the
    (batch,) objective values at X + alpha*d.
    """
    batch = f0.shape[0]
    c1 = jnp.asarray(ls.c1, dtype)
    rho_hi = jnp.asarray(ls.rho_hi, dtype)
    rho_lo = jnp.asarray(ls.rho_lo, dtype)
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    sqrttol = jnp.asarray(sqrt_tolerance(dtype), dtype)
    one = jnp.ones((batch,), dtype)
    zero_i = jnp.zeros((batch,), jnp.int32)

    fx1 = phi(one)
    n_fev = active.astype(jnp.int32)

    # Unlike the scalar search, there is no separate finite-halving phase:
    # every extra lax.while_loop costs a fixed sequential dispatch per OUTER
    # solver iteration even when it runs zero rounds, which measurably taxes
    # the lockstep engine. A non-finite trial fails the Armijo test (NaN >=
    # t is False) and the NaN-robust clamps then shrink alpha by rho_hi
    # (= 0.5 by default — exactly the reference's halving, :182) inside the
    # single Armijo loop. The only behavioral difference vs the two-phase
    # form is the shared iteration budget and a x0.1 shrink for -inf trials.
    fc = _LSCarry(one, one, f0, fx1, zero_i, n_fev)
    budget = ls.iterations + finite_halving_limit(dtype)
    # doomed-lane fast-fail: NaN m/f0 can never satisfy Armijo (see
    # ops/linesearch.py) — exclude such lanes from the loop mask entirely.
    doomed = ~(jnp.isfinite(m) & jnp.isfinite(f0))

    def suff(c: _LSCarry):
        return c.fx1 >= f0 + c.a2 * c1 * m

    def arm_lane(c: _LSCarry):
        return active & ~doomed & ~suff(c) & (c.it < budget)

    def arm_cond(c: _LSCarry):
        return jnp.any(arm_lane(c))

    def arm_body(c: _LSCarry):
        lane = arm_lane(c)
        it = c.it + lane
        quad = -(m * c.a2 * c.a2) / (2.0 * (c.fx1 - f0 - m * c.a2))
        if ls.order == 2:
            at = quad
        else:
            denom = 1.0 / (c.a1 * c.a1 * c.a2 * c.a2 * (c.a2 - c.a1))
            r1 = c.fx1 - f0 - m * c.a2
            r0 = c.fx0 - f0 - m * c.a1
            a = (c.a1 * c.a1 * r1 - c.a2 * c.a2 * r0) * denom
            b = (-c.a1 * c.a1 * c.a1 * r1 + c.a2 * c.a2 * c.a2 * r0) * denom
            degenerate = jnp.abs(a) <= eps + sqrttol * jnp.abs(a)
            disc = nanmax(b * b - 3.0 * a * m, jnp.zeros_like(b))
            cubic = jnp.where(degenerate, m / (2.0 * b), (jnp.sqrt(disc) + b) / (-3.0 * a))
            at = jnp.where(it == 1, quad, cubic)
        a1 = jnp.where(lane, c.a2, c.a1)
        at = nanmin(at, c.a2 * rho_hi)
        a2 = jnp.where(lane, nanmax(at, c.a2 * rho_lo), c.a2)
        fx0 = jnp.where(lane, c.fx1, c.fx0)
        fx1 = jnp.where(lane, phi(a2), c.fx1)
        return _LSCarry(a1, a2, fx0, fx1, it, c.n_fev + lane)

    ac = lax.while_loop(arm_cond, arm_body, fc._replace(it=zero_i))

    ok = suff(ac)
    alpha = jnp.where(active & ok, ac.a2, jnp.zeros((), dtype))
    # alpha == 0 is the in-band failure sentinel (reference :193/:284),
    # covering both budget exhaustion and underflow-to-zero.
    failed = active & (alpha == 0.0)
    return alpha, ac.n_fev, ac.it, failed


class _WLSCarry(NamedTuple):
    lo: jax.Array
    hi: jax.Array
    a: jax.Array
    fa: jax.Array
    sa: jax.Array
    it: jax.Array
    n_ev: jax.Array


def _batched_wolfe(phi_vag, f0, m, active, ls, dtype):
    """Masked lockstep weak-Wolfe search (per-lane semantics of
    ops.wolfe.wolfe_linesearch). phi_vag maps (batch,) alphas to
    ((batch,) values, (batch,) slopes along the ray)."""
    batch = f0.shape[0]
    c1 = jnp.asarray(ls.c1, dtype)
    c2 = jnp.asarray(ls.c2, dtype)
    one = jnp.ones((batch,), dtype)
    zero_i = jnp.zeros((batch,), jnp.int32)

    fa0, sa0 = phi_vag(one)

    def conds(c: _WLSCarry):
        armijo = c.fa >= f0 + c1 * c.a * m
        curv = c.sa <= c2 * m
        return armijo, curv

    doomed = ~(jnp.isfinite(m) & jnp.isfinite(f0))

    def lane_mask(c: _WLSCarry):
        armijo, curv = conds(c)
        return active & ~doomed & ~(armijo & curv) & (c.it < ls.iterations)

    def cond(c: _WLSCarry):
        return jnp.any(lane_mask(c))

    def body(c: _WLSCarry):
        lane = lane_mask(c)
        armijo, _curv = conds(c)
        hi = jnp.where(lane & ~armijo, c.a, c.hi)
        lo = jnp.where(lane & armijo, c.a, c.lo)
        a_next = jnp.where(jnp.isinf(hi), 2.0 * lo, 0.5 * (lo + hi))
        a = jnp.where(lane, a_next, c.a)
        fa_n, sa_n = phi_vag(a)
        return _WLSCarry(
            lo=lo,
            hi=hi,
            a=a,
            fa=jnp.where(lane, fa_n, c.fa),
            sa=jnp.where(lane, sa_n, c.sa),
            it=c.it + lane,
            n_ev=c.n_ev + lane,
        )

    init = _WLSCarry(
        lo=jnp.zeros((batch,), dtype), hi=jnp.full((batch,), jnp.inf, dtype),
        a=one, fa=fa0, sa=sa0, it=zero_i, n_ev=active.astype(jnp.int32),
    )
    fc = lax.while_loop(cond, body, init)
    armijo, curv = conds(fc)
    ok = armijo & curv
    alpha = jnp.where(active & ok, fc.a, jnp.zeros((), dtype))
    failed = active & (alpha == 0.0)
    return alpha, fc.n_ev, fc.it, failed


def _solve_loop_batched(
    vag_b: Callable,
    f_b: Callable,
    carry0: _Carry,
    ls: BackTracking,
    tol,
    max_iterations: int,
    update_fn: Callable,
    h0_scale: bool = True,
    stall_limit: int = STALL_LIMIT_DEFAULT,
) -> _Carry:
    dtype = carry0.X.dtype
    tol = jnp.asarray(tol, dtype)

    def cond(c: _Carry):
        return jnp.logical_and(
            c.k < max_iterations, jnp.any(c.status == Status.RUNNING)
        )

    # k is global (all lanes start together), so the reference's m = -1
    # first-iteration sentinel (:263-264) is handled by PEELING iteration 1
    # out of the while loop instead of a lax.cond inside it: an XLA
    # conditional copies its (n, n, batch)-sized operands in and out every
    # iteration (~190 us/iter measured at batch=4096) just to select a
    # branch whose predicate is true exactly once.
    def make_body(first: bool):
        def body(c: _Carry):
            f0, g = vag_b(c.X)  # (batch,), (n, batch)
            was_active = c.status == Status.RUNNING
            nonfinite = ~jnp.isfinite(f0)
            converged = jnp.max(jnp.abs(g), axis=0) < tol
            improved = jnp.where(jnp.isnan(c.fun), True, f0 > c.fun)
            stall = jnp.where(
                was_active & ~improved, c.stall + 1, jnp.zeros_like(c.stall)
            )
            stall = jnp.where(was_active, stall, c.stall)
            stalled = (
                stall >= stall_limit
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
                c.status,
            )
            active = status_pre == Status.RUNNING
            amask = active.astype(dtype)[None, :]  # (1, batch)

            if first:
                # steepest ascent with m = ||g||^2 (the sentinel path)
                gg = jnp.sum(g * g, axis=0)
                d = g * amask
                m = jnp.where(active, gg, jnp.ones_like(gg))
                B_new, reset = c.B, active
            else:
                fmask = (
                    (c.fresh & active).astype(dtype)[None, :]
                    if h0_scale
                    else jnp.zeros_like(amask)
                )
                B_new, d, m, r = update_fn(c.B, c.STEP, g, c.G_old, amask, fmask)
                m, reset = m[0], r[0] > 0

            from .ops.wolfe import Wolfe

            if isinstance(ls, Wolfe):

                def phi_vag(alpha):
                    fv, gv = vag_b(c.X + alpha[None, :] * d)
                    return fv, jnp.sum(gv * d, axis=0)

                alpha, ls_fev, _ls_it, ls_failed = _batched_wolfe(
                    phi_vag, f0, m, active, ls, dtype
                )
                ls_gev = ls_fev  # every Wolfe trial is a value+grad eval
            else:

                def phi(alpha):
                    return f_b(c.X + alpha[None, :] * d)

                alpha, ls_fev, _ls_it, ls_failed = _batched_linesearch(
                    phi, f0, m, active, ls, dtype
                )
                ls_gev = jnp.zeros_like(ls_fev)
            # failed/frozen lanes take no step — explicit mask, because
            # alpha == 0 times a NaN direction (degenerate update) is NaN
            # and would destroy the lane's last good iterate.
            take = (active & ~ls_failed)[None, :]
            step = jnp.where(take, alpha[None, :] * d, jnp.zeros_like(d))
            new_status = jnp.where(
                active & ls_failed, jnp.int32(Status.LINESEARCH_FAILURE), status_pre
            )
            wmask = was_active[None, :]
            return _Carry(
                X=c.X + step,
                G=jnp.where(wmask, g, c.G),
                G_old=jnp.where(active[None, :], g, c.G_old),
                STEP=jnp.where(active[None, :], step, c.STEP),
                B=B_new,
                fun=jnp.where(was_active, f0, c.fun),
                k=c.k + 1,
                status=new_status,
                iterations=c.iterations + active.astype(jnp.int32),
                n_fev=c.n_fev + was_active.astype(jnp.int32) + ls_fev,
                n_gev=c.n_gev + was_active.astype(jnp.int32) + ls_gev,
                n_resets=c.n_resets + reset.astype(jnp.int32),
                fresh=jnp.where(active, reset, c.fresh),
                stall=stall,
            )

        return body

    if max_iterations >= 1:
        carry1 = make_body(True)(carry0)
        final = lax.while_loop(cond, make_body(False), carry1)
    else:
        final = carry0
    return final._replace(
        status=jnp.where(
            final.status == Status.RUNNING,
            jnp.int32(Status.MAX_ITERATIONS),
            final.status,
        )
    )


def _make_update_fn(kernel: str, block_batch: int):
    if kernel == "pallas":
        return partial(fused_bfgs_update_batched, block_batch=block_batch)
    if kernel == "pallas_interpret":
        return partial(
            fused_bfgs_update_batched, block_batch=block_batch, interpret=True
        )
    if kernel == "xla":
        return fused_bfgs_update_reference
    raise ValueError(f"unknown kernel {kernel!r}; use 'xla' or 'pallas'")


@partial(
    jax.jit,
    static_argnames=(
        "obj",
        "ls",
        "max_iterations",
        "value_and_grad_fn",
        "kernel",
        "block_batch",
        "h0_scale",
        "stall_limit",
    ),
)
def _optimize_batched_fused_jit(
    obj, x0s, ls, tol, max_iterations, value_and_grad_fn, kernel, block_batch,
    h0_scale, stall_limit=STALL_LIMIT_DEFAULT,
):
    vag = as_value_and_grad(obj, value_and_grad_fn)
    f = as_value_fn(obj, value_and_grad_fn)
    # Lane axis is the trailing axis internally; the user objective stays a
    # per-lane (n,) -> scalar function, mapped over lanes.
    vag_b = jax.vmap(vag, in_axes=1, out_axes=(0, 1))
    f_b = jax.vmap(f, in_axes=1, out_axes=0)

    user_batch, n = x0s.shape
    dtype = x0s.dtype

    # Pad the lane axis to a block multiple for the Pallas grid (padded
    # lanes start out non-RUNNING, so they are frozen from step one and
    # stripped from the result below). The padding quantum is static.
    pad = (-user_batch) % block_batch if kernel.startswith("pallas") else 0
    batch = user_batch + pad
    X0 = jnp.concatenate([x0s, jnp.broadcast_to(x0s[:1], (pad, n))]).T if pad else x0s.T

    zero_v = jnp.zeros((n, batch), dtype)
    zero_i = jnp.zeros((batch,), jnp.int32)
    status0 = jnp.concatenate(
        [
            jnp.full((user_batch,), Status.RUNNING, jnp.int32),
            jnp.full((pad,), Status.MAX_ITERATIONS, jnp.int32),
        ]
    ) if pad else jnp.full((batch,), Status.RUNNING, jnp.int32)
    carry0 = _Carry(
        X=X0,
        G=zero_v,
        G_old=zero_v,
        STEP=zero_v,
        B=jnp.broadcast_to(jnp.eye(n, dtype=dtype)[:, :, None], (n, n, batch)),
        fun=jnp.full((batch,), jnp.nan, dtype),
        k=jnp.zeros((), jnp.int32),
        status=status0,
        iterations=zero_i,
        n_fev=zero_i,
        n_gev=zero_i,
        n_resets=zero_i,
        fresh=jnp.ones((batch,), bool),
        stall=zero_i,
    )
    fc = _solve_loop_batched(
        vag_b, f_b, carry0, ls, tol, max_iterations,
        _make_update_fn(kernel, block_batch),
        h0_scale, stall_limit,
    )
    if pad:
        fc = jax.tree_util.tree_map(
            lambda a: a[..., :user_batch] if a.ndim and a.shape[-1] == batch else a, fc
        )
    return _result_from_batched_carry(fc)


def _result_from_batched_carry(fc: _Carry) -> OptimizeResult:
    # Back to the public (batch, ...) convention of the vmap path.
    state = BFGSState(
        x=fc.X.T,
        grad=fc.G.T,
        grad_old=fc.G_old.T,
        step=fc.STEP.T,
        B=jnp.moveaxis(fc.B, -1, 0),
        fun=fc.fun,
        k=fc.iterations,
        status=fc.status,
        n_fev=fc.n_fev,
        n_gev=fc.n_gev,
        n_resets=fc.n_resets,
        fresh=fc.fresh,
        stall=fc.stall,
    )
    nan = jnp.asarray(jnp.nan, fc.X.dtype)
    return OptimizeResult(
        x=state.x,
        fun=jnp.where(fc.status == Status.CONVERGED, fc.fun, nan),
        grad=state.grad,
        status=fc.status,
        iterations=fc.iterations,
        n_fev=fc.n_fev,
        n_gev=fc.n_gev,
        n_resets=fc.n_resets,
        last_value=fc.fun,
        state=state,
    )


def optimize_batched_fused(
    obj,
    x0s: jax.Array,
    ls: BackTracking = BackTracking(),
    tol: float = 1e-8,
    max_iterations: int = MAX_ITERATIONS_DEFAULT,
    value_and_grad_fn: Optional[Callable] = None,
    kernel: str = "xla",
    block_batch: int = 128,
    h0_scale: bool = True,
    stall_limit: int = STALL_LIMIT_DEFAULT,
) -> OptimizeResult:
    """Throughput-path batched BFGS: native batch-minor driver.

    Drop-in result-compatible with `optimize_batched` (leading batch axis on
    every result leaf) but ~6x faster on TPU for small-n fleets (measured:
    ~44k vs ~7k solves/s at batch=4096, n=60). ``kernel`` selects the fused
    update implementation: 'xla' (closed-form jnp) or 'pallas' (explicit
    VMEM-resident kernel with donated B buffers; the lane axis is padded to
    a ``block_batch`` multiple automatically).
    """
    x0s = jnp.asarray(x0s)
    if x0s.ndim != 2:
        raise ValueError(f"x0s must be (batch, n), got shape {x0s.shape}")
    if kernel == "pallas":
        # VMEM feasibility: the kernel holds roughly 4 (n, n, block) f32
        # tiles (in + out + expression temporaries) in ~16 MB of VMEM.
        # Measured: n=60/block=128 fits comfortably; n=128/block=128 needs
        # 32.5 MB and fails to compile. Fall back to the fused XLA
        # formulation (same math, same layout) past the feasible size.
        n = x0s.shape[1]
        est_bytes = 4 * n * n * block_batch * x0s.dtype.itemsize
        if est_bytes > 14 * 1024 * 1024:
            kernel = "xla"
    return _optimize_batched_fused_jit(
        obj, x0s, ls, tol, max_iterations, value_and_grad_fn, kernel,
        block_batch, h0_scale, stall_limit,
    )


@partial(
    jax.jit,
    static_argnames=(
        "obj",
        "ls",
        "max_iterations",
        "value_and_grad_fn",
        "kernel",
        "block_batch",
        "h0_scale",
        "stall_limit",
    ),
)
def _optimize_batched_fused_resume_jit(
    obj, state, ls, tol, max_iterations, value_and_grad_fn, kernel, block_batch,
    h0_scale, stall_limit=STALL_LIMIT_DEFAULT,
):
    vag = as_value_and_grad(obj, value_and_grad_fn)
    f = as_value_fn(obj, value_and_grad_fn)
    vag_b = jax.vmap(vag, in_axes=1, out_axes=(0, 1))
    f_b = jax.vmap(f, in_axes=1, out_axes=0)

    carry0 = _Carry(
        X=state.x.T,
        G=state.grad.T,
        G_old=state.grad_old.T,
        STEP=state.step.T,
        B=jnp.moveaxis(state.B, 0, -1),
        fun=state.fun,
        k=jnp.zeros((), jnp.int32),
        status=jnp.full(state.fun.shape, Status.RUNNING, jnp.int32),
        iterations=state.k,
        n_fev=state.n_fev,
        n_gev=state.n_gev,
        n_resets=state.n_resets,
        fresh=state.fresh,
        stall=state.stall,
    )
    fc = _solve_loop_batched(
        vag_b, f_b, carry0, ls, tol, max_iterations,
        _make_update_fn(kernel, block_batch), h0_scale, stall_limit,
    )
    return _result_from_batched_carry(fc)


def optimize_batched_fused_from_state(
    obj,
    state: BFGSState,
    ls: BackTracking = BackTracking(),
    tol: float = 1e-8,
    max_iterations: int = MAX_ITERATIONS_DEFAULT,
    value_and_grad_fn: Optional[Callable] = None,
    kernel: str = "xla",
    block_batch: int = 128,
    h0_scale: bool = True,
    stall_limit: int = STALL_LIMIT_DEFAULT,
) -> OptimizeResult:
    """Resume a batched fleet from a (possibly checkpointed) batched
    BFGSState — every leaf carries the leading batch axis, exactly as an
    earlier batched result's ``.state``. All lanes are re-armed to RUNNING
    (so converged lanes can also be re-solved under a tighter tol);
    iteration/eval counters continue from the saved values.
    ``max_iterations`` bounds the additional iterations of this resume leg.
    """
    if state.x.ndim != 2:
        raise ValueError("expected a batched BFGSState (leaves with batch axis)")
    if kernel == "pallas":
        n = state.x.shape[1]
        if 4 * n * n * block_batch * state.x.dtype.itemsize > 14 * 1024 * 1024:
            kernel = "xla"
        if state.x.shape[0] % block_batch != 0:
            kernel = "xla"  # resume path does not re-pad the lane axis
    return _optimize_batched_fused_resume_jit(
        obj, state, ls, tol, max_iterations, value_and_grad_fn, kernel,
        block_batch, h0_scale, stall_limit,
    )
