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
