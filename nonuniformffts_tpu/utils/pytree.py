"""Dataclass-as-pytree helper.

The plan objects of this library are frozen dataclasses whose *array* fields are
JAX pytree leaves and whose *configuration* fields (sizes, dtypes, kernel
choices, ...) are static metadata.  This makes a plan directly passable to
``jax.jit``-compiled functions: the static part becomes compile-time constants
(the TPU analogue of the reference's type-level parameters ``HalfSupport{M}``,
``Val(ntransforms)`` etc., reference: src/plan.jl:326-355).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


def static_field(**kwargs: Any):
    """A dataclass field treated as static (hashable) pytree metadata."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def data_field(**kwargs: Any):
    """A dataclass field treated as a pytree leaf (array data)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = False
    return dataclasses.field(metadata=metadata, **kwargs)


def register_pytree_dataclass(cls):
    """Class decorator: register a (frozen) dataclass as a JAX pytree.

    Fields declared with :func:`static_field` go into the aux data (and must be
    hashable); all other fields are pytree children.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = dataclasses.fields(cls)
    data_names = tuple(
        f.name for f in fields if not f.metadata.get("static", False)
    )
    meta_names = tuple(f.name for f in fields if f.metadata.get("static", False))

    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_names), meta_fields=list(meta_names)
    )
    return cls
