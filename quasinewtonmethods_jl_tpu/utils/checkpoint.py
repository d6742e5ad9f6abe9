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
    from ..sampling import ChEESState, HMCState, NUTSState

    return {"HMCState": HMCState, "ChEESState": ChEESState,
            "NUTSState": NUTSState}


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
    arrays, key_fields = {}, []
    for k, v in state._asdict().items():
        if hasattr(v, "dtype") and jax.dtypes.issubdtype(
            v.dtype, jax.dtypes.prng_key
        ):
            # typed PRNG keys (jax.random.key) have an opaque dtype;
            # store the raw key data and re-wrap on load
            arrays[k] = np.asarray(jax.random.key_data(v))
            key_fields.append(k)
        else:
            arrays[k] = np.asarray(v)
    arrays["__class__"] = np.asarray(cls)
    arrays["__key_fields__"] = np.asarray(key_fields)
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
        key_fields = (
            set(z["__key_fields__"].tolist()) if "__key_fields__" in z else set()
        )
        fields = {
            k: (
                jax.random.wrap_key_data(jnp.asarray(z[k]))
                if k in key_fields
                else jnp.asarray(z[k])
            )
            for k in klass._fields
        }
    return klass(**fields)
