"""Pytree dataclass helper.

Small wrapper over :func:`jax.tree_util.register_dataclass` so framework data
structures (LQ problems, Riccati factors, solver state) are frozen dataclasses
that JAX treats as pytrees. Fields annotated as ``static`` become aux-data
(hashable metadata that participates in jit caching), everything else is a leaf
subtree.
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

_T = TypeVar("_T")

# Marker for metadata fields (static under tracing).
STATIC = {"pytree_node": False}


def static_field(**kwargs):
    """A dataclass field treated as static aux-data (not traced)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata.update(STATIC)
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields created with :func:`static_field` are registered as metadata; all
    other fields are pytree children.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("pytree_node", True):
            data_fields.append(f.name)
        else:
            meta_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls


def replace(obj: _T, **changes) -> _T:
    """dataclasses.replace that works on frozen pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
