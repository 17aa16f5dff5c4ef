"""Flatten params pytrees into named parameter matrices.

≙ the name/linearization logic in the reference's output extensions
(ext/AdvancedMHMCMCChainsExt.jl:12-121, ext/AdvancedMHStructArraysExt.jl):
vector params become ``param_1..param_d``, tree (NamedTuple ≙ dict) params
use their keys, and explicit ``param_names`` override everything.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _path_name(path) -> str:
    parts: List[str] = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(p.name)
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx + 1))
        else:  # pragma: no cover
            parts.append(str(p))
    return "_".join(parts)


def flatten_params(
    params, sample_ndim: int, param_names: Optional[Sequence[str]] = None
) -> Tuple[jax.Array, List[str]]:
    """Flatten a params pytree (leading ``sample_ndim`` batch axes per leaf)
    into ``(values, names)`` with ``values`` of shape ``(*batch, P)``."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = []
    names: List[str] = []
    for path, leaf in flat:
        leaf = jnp.asarray(leaf)
        event_size = 1
        for s in leaf.shape[sample_ndim:]:
            event_size *= s
        arrays.append(leaf.reshape(leaf.shape[:sample_ndim] + (event_size,)))
        base = _path_name(path)
        if event_size == 1 and leaf.ndim == sample_ndim:
            # scalar leaf
            names.append(base if base else "param_1")
        elif base:
            names.extend(
                [base] if event_size == 1 else [f"{base}[{i+1}]" for i in range(event_size)]
            )
        else:
            # root array leaf: param_1..param_d (≙ reference auto names)
            names.extend([f"param_{i+1}" for i in range(event_size)])
    values = arrays[0] if len(arrays) == 1 else jnp.concatenate(arrays, axis=-1)
    if param_names is not None:
        param_names = list(param_names)
        if len(param_names) != values.shape[-1]:
            raise ValueError(
                f"param_names has {len(param_names)} entries for "
                f"{values.shape[-1]} parameters."
            )
        names = param_names
    return values, names
