"""Pytree-parameter adapter: solve over structured parameters.

The reference operates on flat vectors (`AbstractStrideArray` inputs,
src/QuasiNewtonMethods.jl:237) — appropriate for its generated-code callers.
Real hand-written statistical models carry structured parameters (dicts of
coefficient blocks, scale scalars, ...), so every solver here accepts an
arbitrary pytree via ravel/unravel around the flat core: the solver state
stays a flat (n,) vector (which is what the dense-B algebra needs anyway),
and the user's logdensity sees their own structure.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from .ops.linesearch import BackTracking
from .solve import MAX_ITERATIONS_DEFAULT, optimize

__all__ = ["optimize_pytree", "optimize_lbfgs_pytree",
           "optimize_batched_pytree", "map_then_sample_pytree",
           "pytree_names", "PytreeSampleResult"]


class _PytreeObjective:
    """Hashable flat-vector adapter around a pytree logdensity.

    Hash/eq delegate to (fn, treedef) so jit caching works across calls with
    the same objective and parameter structure.
    """

    def __init__(self, fn: Callable, unravel: Callable, treedef, shapes):
        self._fn = fn
        self._unravel = unravel
        self._key = (fn, treedef, shapes)

    def __call__(self, flat):
        return self._fn(self._unravel(flat))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _PytreeObjective) and self._key == other._key


def _flatten_problem(obj, x0_tree):
    flat0, unravel = ravel_pytree(x0_tree)
    if flat0.dtype not in (jnp.float32, jnp.float64, jnp.float16, jnp.bfloat16):
        raise TypeError(f"parameters must be floating point, got {flat0.dtype}")
    treedef = jax.tree_util.tree_structure(x0_tree)
    shapes = tuple(
        (tuple(l.shape), jnp.asarray(l).dtype.name)
        for l in jax.tree_util.tree_leaves(x0_tree)
    )
    flat_obj = _PytreeObjective(obj if callable(obj) else obj.logdensity,
                                unravel, treedef, shapes)
    return flat0, unravel, flat_obj


def optimize_pytree(
    obj,
    x0_tree,
    ls: BackTracking = BackTracking(),
    tol: float = 1e-8,
    max_iterations: int = MAX_ITERATIONS_DEFAULT,
):
    """BFGS-maximize ``logdensity(params_pytree)`` over structured params.

    Returns ``(params_opt, result)`` where ``params_opt`` has the structure
    of ``x0_tree`` and ``result`` is the flat OptimizeResult (gradient and
    state in the raveled coordinates).
    """
    flat0, unravel, flat_obj = _flatten_problem(obj, x0_tree)
    res = optimize(flat_obj, flat0, ls=ls, tol=tol, max_iterations=max_iterations)
    return unravel(res.x), res


def optimize_lbfgs_pytree(
    obj,
    x0_tree,
    history: int = 10,
    ls: BackTracking = BackTracking(),
    tol: float = 1e-8,
    max_iterations: int = MAX_ITERATIONS_DEFAULT,
):
    """L-BFGS flavor of `optimize_pytree` (large structured models)."""
    from .lbfgs_solve import optimize_lbfgs

    flat0, unravel, flat_obj = _flatten_problem(obj, x0_tree)
    res = optimize_lbfgs(
        flat_obj, flat0, history=history, ls=ls, tol=tol,
        max_iterations=max_iterations,
    )
    return unravel(res.x), res


def optimize_batched_pytree(
    obj,
    x0_trees,
    ls: BackTracking = BackTracking(),
    tol: float = 1e-8,
    max_iterations: int = MAX_ITERATIONS_DEFAULT,
    **batch_kwargs,
):
    """Batched solves over structured parameters.

    ``x0_trees`` is a pytree whose every leaf carries a leading batch axis
    (the idiomatic "stacked starts" layout). Each lane is raveled to a flat
    vector, the fleet runs on the batched engine, and the optima are
    unraveled back: returns ``(params_opt_trees, result)`` where the params
    pytree again has the leading batch axis and ``result`` is the flat
    batched OptimizeResult.
    """
    from .parallel.batch import optimize_batched

    leaves = jax.tree_util.tree_leaves(x0_trees)
    if not leaves or leaves[0].ndim < 1:
        raise ValueError("x0_trees leaves must carry a leading batch axis")
    lane0 = jax.tree_util.tree_map(lambda l: l[0], x0_trees)
    _flat0, unravel, flat_obj = _flatten_problem(obj, lane0)
    flat_batch = jax.vmap(lambda t: ravel_pytree(t)[0])(x0_trees)
    res = optimize_batched(
        flat_obj, flat_batch, ls=ls, tol=tol, max_iterations=max_iterations,
        **batch_kwargs,
    )
    params = jax.vmap(unravel)(res.x)
    return params, res


def pytree_names(tree):
    """Flat coordinate names in ravel order — 'beta[0]', 'scales.sigma',
    nested paths joined with '.'; multi-element leaves get C-order
    ``[i]`` / ``[i,j]`` suffixes. Feed
    ``posterior_summary(...).table(names=pytree_names(x0_tree))`` to
    label a structured model's summary rows."""
    import numpy as np

    paths, _ = jax.tree_util.tree_flatten_with_path(tree)
    names = []
    for path, leaf in paths:
        base = jax.tree_util.keystr(path, simple=True, separator=".")
        leaf = jnp.asarray(leaf)
        if leaf.ndim == 0:
            names.append(base)
        else:
            for idx in np.ndindex(*leaf.shape):
                names.append(f"{base}[{','.join(map(str, idx))}]")
    return names


class PytreeSampleResult(tuple):
    """(samples, x_map, names, flat) — see `map_then_sample_pytree`."""

    __slots__ = ()

    def __new__(cls, samples, x_map, names, flat):
        return tuple.__new__(cls, (samples, x_map, names, flat))

    @property
    def samples(self):
        return self[0]

    @property
    def x_map(self):
        return self[1]

    @property
    def names(self):
        return self[2]

    @property
    def flat(self):
        return self[3]


def map_then_sample_pytree(obj, key, x0_tree, **kwargs):
    """The one-call MAP→posterior pipeline over STRUCTURED parameters:
    ``obj`` is a logdensity of the pytree (dicts of coefficient blocks,
    scale scalars, ...), and the returned draws carry the same structure.

    Runs `map_then_sample` on the raveled coordinates and unravels the
    outputs: ``result.samples`` is a pytree whose leaves are
    (draws, chains, *leaf.shape); ``result.x_map`` has ``x0_tree``'s
    structure; ``result.names`` labels the flat coordinates (hand them to
    `posterior_summary(result.flat.samples).table(names=...)`);
    ``result.flat`` is the full flat `MapThenSampleResult` (diagnostics,
    sampler state, evidence — everything the pipeline reports, in
    raveled coordinates). All `map_then_sample` kwargs pass through;
    a ``transform=`` composes on the FLAT coordinates.
    """
    flat0, unravel, flat_obj = _flatten_problem(obj, x0_tree)
    from .workflow import map_then_sample

    out = map_then_sample(flat_obj, key, flat0, **kwargs)
    samples_tree = jax.vmap(jax.vmap(unravel))(out.samples)
    return PytreeSampleResult(
        samples_tree, unravel(out.x_map), tuple(pytree_names(x0_tree)), out
    )


# ---------------------------------------------------------------------------
# Round 5: the whole engine family over structured parameters (verdict
# item 5 — CG/TR/LM/auglag/minimize were flat-vector-only while the
# BFGS family had adapters; the callback protocol's structure-agnosticism
# (reference src/QuasiNewtonMethods.jl:8-9) should span every engine).
# ---------------------------------------------------------------------------


class _PytreeVag(_PytreeObjective):
    """Flat adapter for an analytic value_and_grad over pytrees: the
    returned gradient tree is raveled to the flat coordinates."""

    def __call__(self, flat):
        v, g = self._fn(self._unravel(flat))
        return v, ravel_pytree(g)[0]

    def __eq__(self, other):
        return type(other) is _PytreeVag and self._key == other._key

    def __hash__(self):
        return hash((_PytreeVag, self._key))


class _PytreeResidual(_PytreeObjective):
    """Flat adapter for residual_fn(x_tree[, data])."""

    def __call__(self, flat, *args):
        return self._fn(self._unravel(flat), *args)

    def __eq__(self, other):
        return type(other) is _PytreeResidual and self._key == other._key

    def __hash__(self):
        return hash((_PytreeResidual, self._key))


def _flatten_with_vag(obj, x0_tree, value_and_grad_fn):
    flat0, unravel, flat_obj = _flatten_problem(obj, x0_tree)
    flat_vag = None
    if value_and_grad_fn is not None:
        flat_vag = _PytreeVag(
            value_and_grad_fn, unravel, flat_obj._key[1], flat_obj._key[2]
        )
    return flat0, unravel, flat_obj, flat_vag


def _stacked_flat(x0_trees):
    """(flat_batch, lane0) for a pytree whose every leaf carries a
    leading batch axis (lane0 is the first lane's tree — ravel it for
    the per-lane unravel)."""
    leaves = jax.tree_util.tree_leaves(x0_trees)
    if not leaves or jnp.asarray(leaves[0]).ndim < 1:
        raise ValueError("stacked=True needs a leading batch axis on "
                         "every leaf")
    lane0 = jax.tree_util.tree_map(lambda l: l[0], x0_trees)
    flat_batch = jax.vmap(lambda t: ravel_pytree(t)[0])(x0_trees)
    return flat_batch, lane0


def _ravel_bounds(bounds, x0_tree):
    """Bounds for TR over pytrees: each side may be a scalar (broadcast),
    a flat (n,) array, or a pytree matching x0's structure (raveled)."""
    if bounds is None:
        return None
    lo, hi = bounds
    structure = jax.tree_util.tree_structure(x0_tree)

    def side(b):
        if b is None:
            return b
        # a side matching x0's structure is raveled; scalars and flat
        # arrays have leaf structure (≠ any container structure) and
        # pass through — and when x0 itself IS a single leaf, raveling
        # is the identity up to reshape, so the rule stays harmless
        if jax.tree_util.tree_structure(b) == structure:
            return ravel_pytree(b)[0]
        return b

    return (side(lo), side(hi))


def optimize_cg_pytree(obj, x0_tree, *, stacked=False,
                       value_and_grad_fn=None, **kwargs):
    """Nonlinear-CG maximize over structured parameters: returns
    ``(params_opt, result)`` with ``params_opt`` in ``x0_tree``'s
    structure and ``result`` the flat `CGResult`. ``stacked=True`` runs
    the fleet over a pytree whose leaves carry a leading batch axis
    (params come back stacked the same way). An analytic
    ``value_and_grad_fn`` over the pytree is raveled transparently.
    All `optimize_cg` kwargs (method/ls/precondition/...) pass through."""
    from .cg_solve import optimize_cg

    if stacked:
        flat_batch, lane0 = _stacked_flat(x0_tree)
        _f0, unravel, flat_obj, flat_vag = _flatten_with_vag(
            obj, lane0, value_and_grad_fn
        )
        res = optimize_cg(flat_obj, flat_batch,
                          value_and_grad_fn=flat_vag, **kwargs)
        return jax.vmap(unravel)(res.x), res
    flat0, unravel, flat_obj, flat_vag = _flatten_with_vag(
        obj, x0_tree, value_and_grad_fn
    )
    res = optimize_cg(flat_obj, flat0, value_and_grad_fn=flat_vag, **kwargs)
    return unravel(res.x), res


def optimize_tr_pytree(obj, x0_tree, *, stacked=False, bounds=None,
                       value_and_grad_fn=None, **kwargs):
    """Trust-region Newton–Krylov over structured parameters (see
    `optimize_cg_pytree` for the adapter conventions). ``bounds`` sides
    may be scalars, flat (n,) arrays, or pytrees matching ``x0_tree``."""
    from .trust_region import optimize_tr

    if stacked:
        flat_batch, lane0 = _stacked_flat(x0_tree)
        _f0, unravel, flat_obj, flat_vag = _flatten_with_vag(
            obj, lane0, value_and_grad_fn
        )
        res = optimize_tr(flat_obj, flat_batch,
                          bounds=_ravel_bounds(bounds, lane0),
                          value_and_grad_fn=flat_vag, **kwargs)
        return jax.vmap(unravel)(res.x), res
    flat0, unravel, flat_obj, flat_vag = _flatten_with_vag(
        obj, x0_tree, value_and_grad_fn
    )
    res = optimize_tr(flat_obj, flat0,
                      bounds=_ravel_bounds(bounds, x0_tree),
                      value_and_grad_fn=flat_vag, **kwargs)
    return unravel(res.x), res


def least_squares_pytree(residual_fn, x0_tree, *, stacked=False,
                         bounds=None, **kwargs):
    """Levenberg–Marquardt over structured parameters:
    ``residual_fn(params_tree[, data_lane]) -> (m,)``; returns
    ``(params_opt, result)``. ``stacked=True`` fits a fleet (leaves of
    ``x0_tree`` carry the batch axis; a ``data=`` pytree batches per
    lane exactly as in `least_squares`). NOTE: minimization convention,
    as in `least_squares` itself."""
    from .least_squares import least_squares

    if stacked:
        flat_batch, lane0 = _stacked_flat(x0_tree)
        _flat0, unravel = ravel_pytree(lane0)
        flat_res = _PytreeResidual(
            residual_fn, unravel,
            jax.tree_util.tree_structure(lane0),
            tuple((tuple(jnp.shape(l)), jnp.asarray(l).dtype.name)
                  for l in jax.tree_util.tree_leaves(lane0)),
        )
        res = least_squares(flat_res, flat_batch,
                            bounds=_ravel_bounds(bounds, lane0), **kwargs)
        return jax.vmap(unravel)(res.x), res
    flat0, unravel = ravel_pytree(x0_tree)
    flat_res = _PytreeResidual(
        residual_fn, unravel,
        jax.tree_util.tree_structure(x0_tree),
        tuple((tuple(jnp.shape(l)), jnp.asarray(l).dtype.name)
              for l in jax.tree_util.tree_leaves(x0_tree)),
    )
    res = least_squares(flat_res, flat0,
                        bounds=_ravel_bounds(bounds, x0_tree), **kwargs)
    return unravel(res.x), res


def optimize_auglag_pytree(obj, x0_tree, eq=None, ineq=None, *,
                           stacked=False, value_and_grad_fn=None, **kwargs):
    """Constrained (augmented-Lagrangian) maximize over structured
    parameters: ``eq``/``ineq`` consume the SAME pytree as ``obj``
    (eq(params_tree) = 0, ineq(params_tree) >= 0). Returns
    ``(params_opt, result)`` with the flat `AugLagResult` carrying the
    multipliers/violation; ``stacked=True`` runs the constrained fleet."""
    from .constrained import optimize_auglag

    def wrap_constraint(fn, unravel, treedef, shapes):
        if fn is None:
            return None
        return _PytreeResidual(fn, unravel, treedef, shapes)

    if stacked:
        flat_batch, lane0 = _stacked_flat(x0_tree)
        _f0, unravel, flat_obj, flat_vag = _flatten_with_vag(
            obj, lane0, value_and_grad_fn
        )
        treedef, shapes = flat_obj._key[1], flat_obj._key[2]
        res = optimize_auglag(
            flat_obj, flat_batch,
            eq=wrap_constraint(eq, unravel, treedef, shapes),
            ineq=wrap_constraint(ineq, unravel, treedef, shapes),
            value_and_grad_fn=flat_vag, **kwargs,
        )
        return jax.vmap(unravel)(res.x), res
    flat0, unravel, flat_obj, flat_vag = _flatten_with_vag(
        obj, x0_tree, value_and_grad_fn
    )
    treedef, shapes = flat_obj._key[1], flat_obj._key[2]
    res = optimize_auglag(
        flat_obj, flat0,
        eq=wrap_constraint(eq, unravel, treedef, shapes),
        ineq=wrap_constraint(ineq, unravel, treedef, shapes),
        value_and_grad_fn=flat_vag, **kwargs,
    )
    return unravel(res.x), res


def minimize_pytree(fun, x0_tree, *, stacked=False, eq=None, ineq=None,
                    value_and_grad_fn=None, **kwargs):
    """scipy-convention `minimize` over structured parameters — the
    negation shim composed with the ravel adapter. ``eq``/``ineq``
    consume the pytree (constrained solves route through the auglag
    fleet exactly as in `minimize`); returns ``(params_opt, result)``
    with ``result`` in the minimization convention."""
    from .minimize import minimize

    make = _PytreeResidual  # constraint wrapper (tree -> (m,))
    if stacked:
        flat_batch, lane0 = _stacked_flat(x0_tree)
        _f0, unravel, flat_obj, flat_vag = _flatten_with_vag(
            fun, lane0, value_and_grad_fn
        )
        treedef, shapes = flat_obj._key[1], flat_obj._key[2]
        res = minimize(
            flat_obj, flat_batch,
            eq=make(eq, unravel, treedef, shapes) if eq else None,
            ineq=make(ineq, unravel, treedef, shapes) if ineq else None,
            value_and_grad_fn=flat_vag, **kwargs,
        )
        return jax.vmap(unravel)(res.x), res
    flat0, unravel, flat_obj, flat_vag = _flatten_with_vag(
        fun, x0_tree, value_and_grad_fn
    )
    treedef, shapes = flat_obj._key[1], flat_obj._key[2]
    res = minimize(
        flat_obj, flat0,
        eq=make(eq, unravel, treedef, shapes) if eq else None,
        ineq=make(ineq, unravel, treedef, shapes) if ineq else None,
        value_and_grad_fn=flat_vag, **kwargs,
    )
    return unravel(res.x), res


__all__ += [
    "optimize_cg_pytree", "optimize_tr_pytree", "least_squares_pytree",
    "optimize_auglag_pytree", "minimize_pytree",
]
