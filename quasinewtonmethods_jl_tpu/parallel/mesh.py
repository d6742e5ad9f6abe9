"""Multi-chip layer: device-mesh sharding for solve fleets and large-n L-BFGS.

The reference is a single-threaded, single-process CPU library (SURVEY.md
§2c) — this module is the net-new distributed capability, built the JAX way:
pick a mesh, annotate shardings, let XLA insert collectives over ICI.

Two strategies map onto quasi-Newton workloads:

  * **Data parallelism** (`optimize_batched_sharded`): a fleet of independent
    solves sharded over the 'data' mesh axis. Lanes never communicate; the
    only collective is the implicit all-reduce in the while-loop predicate
    ("any lane still running"). This is the multi-chip scaling of the
    HMC-chain-init workload — throughput scales linearly with chips.

  * **Model/parameter sharding** (`optimize_lbfgs_sharded`): ONE solve whose
    parameter vector is too large for a chip (or whose objective is itself
    data-sharded). Runs the unmodified L-BFGS driver inside `shard_map` on
    parameter shards; every dot product in the two-loop recursion becomes a
    local partial dot + `psum`, and the convergence check a `pmax` — the
    quasi-Newton analog of sequence/tensor parallelism (SURVEY.md §5).

Both are testable without hardware on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35: public API; jax.experimental alias deprecated in 0.8
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        # public signature renamed check_rep -> check_vma
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map

from ..api import as_value_and_grad, as_value_fn
from ..lbfgs_solve import LBFGSResult, _lbfgs_loop, _result_from_state
from ..ops.linesearch import BackTracking
from ..solve import MAX_ITERATIONS_DEFAULT, STALL_LIMIT_DEFAULT, OptimizeResult
from ..state import LBFGSState, init_lbfgs_state

__all__ = [
    "make_mesh",
    "psum_dot",
    "optimize_batched_sharded",
    "optimize_lbfgs_sharded",
    "optimize_auglag_sharded",
    "optimize_cg_model_sharded",
    "sample_sharded",
]


def make_mesh(axis_sizes: dict, devices=None) -> Mesh:
    """Build a Mesh from {'axis': size}; sizes must multiply to #devices."""
    devices = jax.devices() if devices is None else devices
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes.values())
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(
            f"mesh needs {total} devices, have {len(devices)} "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count for tests)"
        )
    return Mesh(np.asarray(devices[:total]).reshape(sizes), names)


def psum_dot(axis_name: str) -> Callable:
    """dot(a, b) over a sharded vector: local partial dot + psum over ICI."""

    def dot(a, b):
        return lax.psum(jnp.dot(a, b), axis_name)

    return dot


def optimize_batched_sharded(
    obj,
    x0s: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    **kwargs,
) -> OptimizeResult:
    """Data-parallel solve fleet: the batch axis sharded over `axis`.

    Each device owns batch/k lanes of the fused batched driver; XLA
    partitions the entire while-loop program (the lanes are independent, so
    the only cross-device traffic is the loop predicate's all-reduce).
    """
    from ..batched_solve import optimize_batched_fused

    x0s = jnp.asarray(x0s)
    n_shards = mesh.shape[axis]
    if x0s.shape[0] % n_shards != 0:
        raise ValueError(
            f"batch ({x0s.shape[0]}) must divide evenly over mesh axis "
            f"{axis!r} ({n_shards} shards)"
        )
    x0s = jax.device_put(x0s, NamedSharding(mesh, P(axis, None)))
    with mesh:
        return optimize_batched_fused(obj, x0s, **kwargs)


def optimize_tr_sharded(
    obj,
    x0s: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    **kwargs,
):
    """Data-parallel trust-region Newton–Krylov fleet over `axis`.

    Same scaling shape as `optimize_batched_sharded`: lanes are
    independent, the batched HVP sweeps inside Steihaug-CG are
    elementwise in the lane axis, and the only cross-device traffic is
    the two loop predicates' all-reduces (outer TR, inner CG). kwargs
    pass through to `qnm.optimize_tr`.
    """
    from ..trust_region import optimize_tr

    x0s = jnp.asarray(x0s)
    if x0s.ndim != 2:
        raise ValueError(f"x0s must be (batch, n), got shape {x0s.shape}")
    n_shards = mesh.shape[axis]
    if x0s.shape[0] % n_shards != 0:
        raise ValueError(
            f"batch ({x0s.shape[0]}) must divide evenly over mesh axis "
            f"{axis!r} ({n_shards} shards)"
        )
    x0s = jax.device_put(x0s, NamedSharding(mesh, P(axis, None)))
    with mesh:
        return optimize_tr(obj, x0s, **kwargs)


def optimize_cg_sharded(
    obj,
    x0s: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    **kwargs,
):
    """Data-parallel nonlinear-CG fleet over `axis`.

    The lightest fleet to shard: the per-lane state is O(n) (no ring,
    no matrix), every β/direction/warm-start computation is elementwise
    in the lane axis, and the only cross-device traffic is the two loop
    predicates' all-reduces (outer iteration, Wolfe bracket). kwargs
    pass through to `qnm.optimize_cg`.
    """
    from ..cg_solve import optimize_cg

    x0s = jnp.asarray(x0s)
    if x0s.ndim != 2:
        raise ValueError(f"x0s must be (batch, n), got shape {x0s.shape}")
    n_shards = mesh.shape[axis]
    if x0s.shape[0] % n_shards != 0:
        raise ValueError(
            f"batch ({x0s.shape[0]}) must divide evenly over mesh axis "
            f"{axis!r} ({n_shards} shards)"
        )
    x0s = jax.device_put(x0s, NamedSharding(mesh, P(axis, None)))
    with mesh:
        return optimize_cg(obj, x0s, **kwargs)


def optimize_tr_model_sharded(
    obj,
    x0: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    **kwargs,
):
    """ONE large-n trust-region solve with the parameter vector sharded.

    The TR engine is pure jnp (CG dot products, elementwise updates,
    HVPs through the gradient), so GSPMD partitions the whole program
    from the x0 placement alone — no shard_map: every CG reduction
    (rᵀr, dᵀHd, boundary τ) lowers to a local partial + all-reduce over
    ICI, and the HVP's forward-over-reverse sweep partitions like the
    gradient itself. This is the Newton-Krylov counterpart of
    `optimize_lbfgs_sharded` (which needs explicit psum injection
    because its two-loop recursion runs inside shard_map); parity with
    the unsharded engine is iteration-exact up to fp reassociation of
    the partitioned dots.

    Objectives whose gradient mixes coordinates (e.g. Rosenbrock's
    coupling) are still correct — GSPMD inserts the gathers it needs —
    but separable/elementwise objectives partition with no gathers at
    all. kwargs pass through to `qnm.optimize_tr`.
    """
    from ..trust_region import optimize_tr

    x0 = jnp.asarray(x0)
    if x0.ndim != 1:
        raise ValueError(
            f"x0 must be rank 1 (one large-n solve), got shape {x0.shape};"
            " fleets shard over lanes via optimize_tr_sharded"
        )
    n_shards = mesh.shape[axis]
    if x0.shape[0] % n_shards != 0:
        raise ValueError(
            f"n ({x0.shape[0]}) must divide evenly over mesh axis "
            f"{axis!r} ({n_shards} shards)"
        )
    x0 = jax.device_put(x0, NamedSharding(mesh, P(axis)))
    with mesh:
        return optimize_tr(obj, x0, **kwargs)


def optimize_auglag_sharded(
    obj,
    x0s: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    *,
    eq=None,
    ineq=None,
    constraint_data=None,
    **kwargs,
):
    """Data-parallel CONSTRAINED fleet: the masked-lockstep batched
    auglag with lanes sharded over ``axis``.

    Pure-jnp outer+inner loops partition from placement alone (the
    GSPMD-from-placement finding; dryrun section 19 exercises exactly
    this path): per-lane (λ, μ, ρ) ride the sharded carry, the loop
    predicates are the only collectives, and a per-lane
    ``constraint_data`` pytree is sharded alongside its lanes. kwargs
    pass through to `qnm.optimize_auglag` (engine/tol/ctol/...).
    """
    from ..constrained import optimize_auglag

    x0s = jnp.asarray(x0s)
    if x0s.ndim != 2:
        raise ValueError(f"x0s must be (batch, n), got shape {x0s.shape}")
    n_shards = mesh.shape[axis]
    if x0s.shape[0] % n_shards != 0:
        raise ValueError(
            f"batch ({x0s.shape[0]}) must divide evenly over mesh axis "
            f"{axis!r} ({n_shards} shards)"
        )
    x0s = jax.device_put(x0s, NamedSharding(mesh, P(axis, None)))
    if constraint_data is not None:
        constraint_data = jax.tree_util.tree_map(
            lambda l: jax.device_put(
                jnp.asarray(l),
                NamedSharding(
                    mesh, P(axis, *([None] * (jnp.asarray(l).ndim - 1)))
                ),
            ),
            constraint_data,
        )
    with mesh:
        return optimize_auglag(
            obj, x0s, eq=eq, ineq=ineq,
            constraint_data=constraint_data, **kwargs,
        )


def optimize_cg_model_sharded(
    obj,
    x0: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    **kwargs,
):
    """ONE very-large-n nonlinear-CG solve with the parameter vector
    sharded over ``axis``.

    CG is the natural n ≫ 10⁴ single-solve engine — O(n) state (one
    direction vector; no (m, n) ring, no (n, n) matrix) — and the engine
    is pure jnp (β reductions, elementwise direction updates, Wolfe
    bracketing on scalars), so GSPMD partitions the whole program from
    the x0 placement alone: every (batch,)-shaped reduction (g·g, d·y,
    the Hager–Zhang products) lowers to a local partial + all-reduce
    over ICI, and the while-loop predicates are the only other
    collectives. The Newton-Krylov counterpart is
    `optimize_tr_model_sharded`; the explicit-psum L-BFGS flavor
    (`optimize_lbfgs_sharded`) exists because its two-loop recursion
    runs inside shard_map — CG needs none of that. Parity with the
    unsharded engine is iteration-exact up to fp reassociation of the
    partitioned reductions (tested on the CPU mesh). kwargs pass
    through to `qnm.optimize_cg` (method/ls/precondition/...).
    """
    from ..cg_solve import optimize_cg

    x0 = jnp.asarray(x0)
    if x0.ndim != 1:
        raise ValueError(
            f"x0 must be rank 1 (one large-n solve), got shape {x0.shape};"
            " fleets shard over lanes via optimize_cg_sharded"
        )
    n_shards = mesh.shape[axis]
    if x0.shape[0] % n_shards != 0:
        raise ValueError(
            f"n ({x0.shape[0]}) must divide evenly over mesh axis "
            f"{axis!r} ({n_shards} shards)"
        )
    x0 = jax.device_put(x0, NamedSharding(mesh, P(axis)))
    with mesh:
        return optimize_cg(obj, x0, **kwargs)


def least_squares_sharded(
    residual_fn,
    x0s: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    *,
    data=None,
    bounds=None,
    **kwargs,
):
    """Data-parallel Levenberg–Marquardt fleet: lanes sharded over `axis`.

    The multi-chip form of ``qnm.least_squares`` with a rank-2 ``x0s``:
    every lane (its starting point, its ``data`` pytree slice, and — if
    per-lane — its box) lands on the device that owns it, and GSPMD
    partitions the whole fleet program: the batched jacobian (one vmapped
    jacfwd/jacrev), the JᵀJ/Jᵀr einsums, the batched Cholesky +
    triangular solves, and the trial evaluations are all elementwise in
    the lane axis, so the only cross-device traffic is the while-loop
    predicate's all-reduce — identical scaling shape to
    `optimize_batched_sharded`.

    ``data`` leaves must carry the fleet batch axis on front (the same
    contract as `least_squares`); they are placed with the lane axis
    sharded and trailing axes replicated. ``bounds=(lo, hi)`` entries are
    sharded the same way when they carry the batch axis, replicated when
    they broadcast. Remaining kwargs (tol, loss, f_scale, ...) pass
    through.
    """
    from ..least_squares import least_squares

    x0s = jnp.asarray(x0s)
    if x0s.ndim != 2:
        raise ValueError(f"x0s must be (batch, n), got shape {x0s.shape}")
    batch = x0s.shape[0]
    n_shards = mesh.shape[axis]
    if batch % n_shards != 0:
        raise ValueError(
            f"batch ({batch}) must divide evenly over mesh axis "
            f"{axis!r} ({n_shards} shards)"
        )

    def _shard_leaf(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] == batch:
            spec = P(axis, *([None] * (leaf.ndim - 1)))
        else:  # broadcastable (shared across lanes) — replicate
            spec = P(*([None] * leaf.ndim))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    x0s = jax.device_put(x0s, NamedSharding(mesh, P(axis, None)))
    if data is not None:
        data = jax.tree_util.tree_map(_shard_leaf, data)
    if bounds is not None:
        bounds = tuple(_shard_leaf(b) for b in bounds)
    with mesh:
        return least_squares(residual_fn, x0s, data=data, bounds=bounds,
                             **kwargs)


def sample_sharded(
    obj,
    key: jax.Array,
    x0s: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    sampler: str = "chees",
    **kwargs,
):
    """Multi-chip chain fleets: the chains axis sharded over `axis`.

    The sampling half of the workflow scaled the same way as the solve
    fleets: annotate the chains axis, let GSPMD partition the whole
    scanned program. With ``sampler='hmc'`` every chain is independent
    (per-chain adaptation) so there is no cross-device traffic at all;
    with ``sampler='chees'`` the fleet adaptation's across-chain
    reductions (the ChEES gradient's means, the fleet-mean acceptance,
    the fleet-variance mass) lower to all-reduces over ICI — a few
    scalars and one (n,) vector per round; with ``sampler='nuts'`` the
    per-chain trees are independent but the tree loops' early-exit
    any-reduces become cross-device all-reduces; with ``sampler='pt'``
    the temperature axis is replicated (the exchange sweep's masked
    shifts stay device-local) and only the per-temperature fleet-mean
    acceptance all-reduces; with ``sampler='ensemble'`` the walker
    halves live on opposite shard groups — prefer ``partner='shift'``
    (the roll lowers to a collective permute; 'gather' becomes a
    cross-device gather); with ``sampler='mclmc'`` the warmup's fleet
    tuning (the energy-error variance scalar and the (n,) fleet
    variance) all-reduces and the sampling phase is embarrassingly
    chain-parallel. kwargs pass through to the corresponding
    sampler."""
    from ..sampling import get_sampler

    sample_fn = get_sampler(sampler)
    x0s = jnp.asarray(x0s)
    n_shards = mesh.shape[axis]
    if x0s.shape[0] % n_shards != 0:
        raise ValueError(
            f"chains ({x0s.shape[0]}) must divide evenly over mesh axis "
            f"{axis!r} ({n_shards} shards)"
        )
    x0s = jax.device_put(x0s, NamedSharding(mesh, P(axis, None)))
    with mesh:
        return sample_fn(obj, key, x0s, **kwargs)


def optimize_lbfgs_sharded(
    obj,
    x0: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    history: int = 10,
    ls: BackTracking = BackTracking(),
    tol: float = 1e-8,
    max_iterations: int = MAX_ITERATIONS_DEFAULT,
    value_and_grad_fn: Optional[Callable] = None,
    value_fn: Optional[Callable] = None,
    stall_limit: int = STALL_LIMIT_DEFAULT,
) -> LBFGSResult:
    """One large-n L-BFGS solve with the parameter axis sharded over `axis`.

    The objective is evaluated on the FULL parameter vector: each device
    all-gathers x for the user callback (objectives are rarely separable),
    while the solver's own O(m·n) state — history rings, step/gradient
    vectors — stays sharded, with psum dots and a pmax convergence check.
    n must divide evenly over the axis.

    For objectives that ARE separable (log-likelihood sums), pass a
    `value_and_grad_fn` that works on local shards and psums internally;
    the driver only ever consumes its (scalar, local-grad-shard) outputs.
    Also pass `value_fn` (local shard -> psum'd scalar) when the gradient
    is expensive: line-search trials are value-only by design, and without
    it each trial pays the full backward pass just to discard the gradient.
    """
    x0 = jnp.asarray(x0)
    n = x0.shape[0]
    n_shards = mesh.shape[axis]
    if n % n_shards != 0:
        raise ValueError(f"n ({n}) must divide evenly over mesh axis {axis!r}")

    dot = psum_dot(axis)

    def max_abs(g):
        return lax.pmax(jnp.max(jnp.abs(g)), axis)

    if value_and_grad_fn is not None:
        vag_local = value_and_grad_fn
        f_local = value_fn if value_fn is not None else (
            lambda xl: value_and_grad_fn(xl)[0]
        )
    else:
        vag_full = as_value_and_grad(obj, None)
        f_full = as_value_fn(obj, None)

        def _gather(xl):
            return lax.all_gather(xl, axis, tiled=True)

        def f_local(xl):
            return f_full(_gather(xl))

        def vag_local(xl):
            # Differentiate through the all_gather: the cotangent of
            # all_gather is the local slice of the global gradient
            # (a psum_scatter), so each device lands exactly its grad shard.
            return jax.value_and_grad(f_local)(xl)

    result_specs = LBFGSResult(
        x=P(axis),
        fun=P(),
        grad=P(axis),
        status=P(),
        iterations=P(),
        n_fev=P(),
        n_gev=P(),
        n_resets=P(),
        last_value=P(),
        state=LBFGSState(
            x=P(axis), grad=P(axis), grad_old=P(axis), step=P(axis),
            S=P(None, axis), Y=P(None, axis), rho=P(), hist=P(), gamma=P(),
            fun=P(), k=P(), status=P(), n_fev=P(), n_gev=P(), n_resets=P(),
            stall=P(),
        ),
    )

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=result_specs,
        check_rep=False,
    )
    def run(x0_local, tol_arr):
        state = init_lbfgs_state(x0_local, history)
        # sharded path: two_loop with psum dots (the compact form's matmuls
        # would need their own collective plumbing)
        final = _lbfgs_loop(
            vag_local, f_local, state, ls, tol_arr, max_iterations, dot,
            max_abs, direction_method="two_loop", stall_limit=stall_limit,
        )
        return _result_from_state(final)

    with mesh:
        x0_sharded = jax.device_put(x0, NamedSharding(mesh, P(axis)))
        return run(x0_sharded, jnp.asarray(tol, x0.dtype))
