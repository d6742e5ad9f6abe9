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

__all__ = ["optimize_pytree", "optimize_lbfgs_pytree", "optimize_batched_pytree"]


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
