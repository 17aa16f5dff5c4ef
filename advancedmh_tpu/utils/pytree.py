"""Pytree dataclass helpers.

The whole framework is built on immutable pytree dataclasses: distributions,
proposals, transitions, and sampler states are all registered pytrees so they
flow through ``jax.jit`` / ``jax.vmap`` / ``jax.lax.scan`` / ``jax.shard_map``
without any custom plumbing.

This replaces the reference's Julia struct + multiple-dispatch architecture
(e.g. ``Transition`` at reference src/AdvancedMH.jl:61-65) with a functional,
trace-friendly equivalent.
"""
from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")


def static_field(**kwargs: Any) -> Any:
    """Mark a dataclass field as static (part of the treedef, not traced)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[T]) -> type[T]:
    """Decorator: freeze ``cls`` as a dataclass and register it as a pytree.

    Fields created with :func:`static_field` become treedef metadata (hashable,
    compared by equality at trace time); everything else is a traced child.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls


def replace(obj: T, **changes: Any) -> T:
    """Functional update for pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
