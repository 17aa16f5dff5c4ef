"""Checkpoint / resume of sampler state pytrees.

The reference has no built-in checkpointing, but its enabling mechanism —
every sampler's full state is an explicit immutable value returned from
``step`` (SURVEY.md §5) — is preserved here: any state pytree serializes to a
flat ``.npz``, and ``sample(..., initial_state=..., iteration_offset=...)``
continues bit-exactly (per-step RNG keys are derived from the absolute
iteration index, so an interrupted+resumed run equals an uninterrupted one).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path: str, state: Any) -> None:
    """Serialize a state pytree to ``path`` (.npz). Typed PRNG keys are
    stored as their raw key data."""
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {}
    for i, leaf in enumerate(leaves):
        leaf = jnp.asarray(leaf)
        if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            arrays[f"key_{i}"] = np.asarray(jax.random.key_data(leaf))
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_state(path: str, like: Any) -> Any:
    """Load a state pytree saved by :func:`save_state`. ``like`` provides the
    tree structure (e.g. a freshly initialized state of the same sampler)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    out = []
    for i, leaf in enumerate(leaves):
        if f"key_{i}" in data:
            out.append(jax.random.wrap_key_data(jnp.asarray(data[f"key_{i}"])))
        else:
            out.append(jnp.asarray(data[f"leaf_{i}"]))
    return jax.tree_util.tree_unflatten(treedef, out)
