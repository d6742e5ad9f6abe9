"""Checkpoint / resume for solver state pytrees.

The reference has no checkpointing, but its architecture is
checkpoint-shaped: all solver progress lives in one flat state struct that
can be re-fed to the driver (SURVEY.md §5; test/runtests.jl:42,47 reuses one
state across solves). Here that becomes explicit: a BFGSState / LBFGSState
is a NamedTuple of arrays, serialized to a single .npz file and restored
into the matching class; `optimize_from_state` / `optimize_lbfgs_from_state`
resume from it. Works for batched states too (every leaf just carries its
batch axis).

np.savez is the dependency-free default; for orbax-managed checkpoints the
state pytree can be handed to orbax directly (it is a plain pytree), this
module adds nothing orbax needs.
"""

from __future__ import annotations

import os
from typing import Type, Union

import jax.numpy as jnp
import numpy as np

from ..state import BFGSState, LBFGSState


def _sampler_state_classes():
    # deferred: sampling imports api/jax transforms; keep checkpoint cheap
    from ..cg_solve import CGState
    from ..ensemble import EnsembleState
    from ..least_squares import LMState
    from ..mclmc import MCLMCState
    from ..sampling import ChEESState, HMCState, NUTSState
    from ..tempering import PTState
    from ..svgd import SVGDState
    from ..trust_region import TRState

    return {"HMCState": HMCState, "ChEESState": ChEESState,
            "NUTSState": NUTSState, "PTState": PTState,
            "LMState": LMState, "TRState": TRState,
            "SVGDState": SVGDState, "CGState": CGState,
            "EnsembleState": EnsembleState, "MCLMCState": MCLMCState}


__all__ = ["save_state", "load_state"]

_STATE_CLASSES = {"BFGSState": BFGSState, "LBFGSState": LBFGSState}


def _npz_path(path) -> str:
    # np.savez silently appends ".npz" to extensionless paths, but np.load
    # does not — normalize so save/load round-trip on the same string.
    path = os.fspath(path)
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path: Union[str, os.PathLike], state) -> None:
    """Serialize a solver or sampler state NamedTuple to ``path`` (.npz).

    Accepts BFGSState / LBFGSState and the sampler states (HMCState /
    ChEESState / NUTSState — round-3 sampler checkpoint/resume). The class
    name is stored alongside the fields so `load_state` can verify (or
    infer) the state type.
    """
    import jax

    cls = type(state).__name__
    if cls not in _STATE_CLASSES and cls not in _sampler_state_classes():
        raise TypeError(
            f"expected a solver or sampler state NamedTuple, got {cls}"
        )
    arrays, key_fields, key_impls = {}, [], []
    for k, v in state._asdict().items():
        if v is None:
            # optional fields (e.g. ChEESState.lr_Q outside the 'lowrank'
            # mode) are simply omitted; load_state restores them from the
            # NamedTuple default
            continue
        if hasattr(v, "dtype") and jax.dtypes.issubdtype(
            v.dtype, jax.dtypes.prng_key
        ):
            # typed PRNG keys (jax.random.key) have an opaque dtype;
            # store the raw key data AND the key impl name, so a key from
            # a non-default impl (e.g. rbg) is not silently reinterpreted
            # under threefry on load (advisor round-3 finding)
            arrays[k] = np.asarray(jax.random.key_data(v))
            key_fields.append(k)
            key_impls.append(str(jax.random.key_impl(v)))
        else:
            arrays[k] = np.asarray(v)
    arrays["__class__"] = np.asarray(cls)
    arrays["__key_fields__"] = np.asarray(key_fields)
    arrays["__key_impls__"] = np.asarray(key_impls)
    np.savez(_npz_path(path), **arrays)


def load_state(
    path: Union[str, os.PathLike],
    cls: Union[Type[BFGSState], Type[LBFGSState], None] = None,
):
    """Restore a solver state saved by `save_state`.

    Args:
      path: the .npz file.
      cls: optional expected class; mismatches raise instead of silently
        reinterpreting fields.
    """
    import jax

    with np.load(_npz_path(path), allow_pickle=False) as z:
        saved_cls = str(z["__class__"])
        if cls is not None and cls.__name__ != saved_cls:
            raise TypeError(f"checkpoint holds {saved_cls}, expected {cls.__name__}")
        classes = {**_STATE_CLASSES, **_sampler_state_classes()}
        klass = classes[saved_cls]
        key_field_list = (
            z["__key_fields__"].tolist() if "__key_fields__" in z else []
        )
        # impl recorded per key field since round 4; older checkpoints
        # (no __key_impls__) were all written under the default impl
        impl_list = (
            z["__key_impls__"].tolist() if "__key_impls__" in z else []
        )
        key_impls = {
            k: impl
            for k, impl in zip(key_field_list, impl_list)
        }
        key_fields = set(key_field_list)

        def _wrap(k, data):
            impl = key_impls.get(k)
            if impl is None:
                return jax.random.wrap_key_data(data)
            return jax.random.wrap_key_data(data, impl=impl)

        defaults = klass._field_defaults
        fields = {}
        for k in klass._fields:
            if k not in z:
                # omitted optional field (None at save time) or an older
                # checkpoint predating the field — both restore to the
                # NamedTuple default; anything required stays a hard error
                if k in defaults:
                    fields[k] = defaults[k]
                    continue
                raise KeyError(
                    f"checkpoint {path!r} is missing required field {k!r} "
                    f"of {saved_cls}"
                )
            fields[k] = (
                _wrap(k, jnp.asarray(z[k]))
                if k in key_fields
                else jnp.asarray(z[k])
            )
    return klass(**fields)
