"""Rewriting pre-order schema traversal.

Reference parity: /root/reference/walk.go (Walk walk.go:41-53, walkRec
walk.go:55-93, child enumeration walk.go:101-175). This is the rule-application
engine for all compile passes (ref-inlining, constant folding) — the driver-side
analogue of a Catalyst ``TreeNode.transform``.

The walk func may REPLACE the current schema in place (``Schema.replace_with``
or plain field mutation); the replacement is then walked — exactly the
reference's ``*schema = ...`` contract (walk.go:34-40, walk_test.go:207-263).

Sibling order: the reference iterates Go maps, so sibling order is explicitly
non-deterministic (walk.go documents this); consumers must not rely on it. We
walk in the deterministic order below but keep the contract.
"""

from __future__ import annotations

from dataclasses import dataclass, fields
from typing import Callable, Optional, Union

from jsonschema_spark.schema import Schema


class _Sentinel(Exception):
    pass


class Skip(_Sentinel):
    """Skip the current node's subschemas (walk.go:11)."""


class SkipAll(_Sentinel):
    """Skip everything and stop the walk (walk.go:12)."""


@dataclass(frozen=True)
class Scope:
    """Pointer to the current schema from the walk root (walk.go:15-19)."""

    pointer: str = "/"


# May return None (continue), Skip/SkipAll (classes or instances), or raise them.
WalkFunc = Callable[[Scope, Schema], Optional[Union[type, _Sentinel]]]


def replace_with(target: Schema, source: Schema) -> None:
    """In-place replacement: the Python analogue of Go's ``*schema = v``."""
    for f in fields(Schema):
        setattr(target, f.name, getattr(source, f.name))


# Bind the helper onto Schema for ergonomic walk funcs.
Schema.replace_with = lambda self, other: replace_with(self, other)  # type: ignore[attr-defined]

# Single-schema children in walk.go:101-116 order.
_SINGLE = (
    ("not", "not_"),
    ("if", "if_"),
    ("then", "then"),
    ("else", "else_"),
    ("items", "items"),
    ("contains", "contains"),
    ("additionalProperties", "additional_properties"),
    ("propertyNames", "property_names"),
    ("unevaluatedItems", "unevaluated_items"),
    ("unevaluatedProperties", "unevaluated_properties"),
    ("contentSchema", "content_schema"),
)
_SLICES = (
    ("allOf", "all_of"),
    ("anyOf", "any_of"),
    ("oneOf", "one_of"),
    ("prefixItems", "prefix_items"),
)
_MAPS = (
    ("$defs", "defs"),
    ("dependentSchemas", "dependent_schemas"),
    ("properties", "properties"),
    ("patternProperties", "pattern_properties"),
)


def _nodes(s: Schema) -> list[tuple[str, Schema]]:
    """Enumerate child subschemas as (relative keyword path, schema)."""
    out: list[tuple[str, Schema]] = []
    for kw, attr in _SINGLE:
        child = getattr(s, attr)
        if child is not None:
            out.append((kw, child))
    for kw, attr in _SLICES:
        arr = getattr(s, attr)
        if arr:
            out.extend((f"{kw}/{i}", c) for i, c in enumerate(arr))
    for kw, attr in _MAPS:
        m = getattr(s, attr)
        if m:
            out.extend((f"{kw}/{name}", c) for name, c in m.items())
    return out


def _join(pointer: str, keyword: str) -> str:
    return pointer + keyword if pointer.endswith("/") else f"{pointer}/{keyword}"


def _call(fn: WalkFunc, scope: Scope, schema: Schema) -> Optional[type]:
    """Run fn; normalize returned-or-raised Skip/SkipAll to a class result."""
    try:
        res = fn(scope, schema)
    except Skip:
        return Skip
    except SkipAll:
        return SkipAll
    if res is None:
        return None
    if res is Skip or isinstance(res, Skip):
        return Skip
    if res is SkipAll or isinstance(res, SkipAll):
        return SkipAll
    raise TypeError(f"walk func returned unexpected value: {res!r}")


def Walk(schema: Schema, fn: WalkFunc) -> None:
    """Walk the schema tree rooted at ``schema``, calling fn for each schema
    including the root (walk.go:41-53). fn may mutate/replace nodes; the new
    node is walked. Skip prunes the subtree, SkipAll stops the walk, any other
    exception aborts and propagates.
    """
    scope = Scope(pointer="/")
    if _call(fn, scope, schema) in (Skip, SkipAll):
        return
    _walk_rec(scope, schema, fn)


def _walk_rec(scope: Scope, schema: Schema, fn: WalkFunc) -> None:
    for keyword, child in _nodes(schema):
        c_scope = Scope(pointer=_join(scope.pointer, keyword))
        res = _call(fn, c_scope, child)
        if res is Skip:
            continue
        if res is SkipAll:
            # Exact reference behavior (walk.go:73-81): SkipAll resets the
            # error and returns from THIS frame only — ancestor frames keep
            # iterating their remaining siblings.
            return
        # (no write-back needed: Python children are shared references,
        # unlike Go's by-value map/slice elements — walk.go:86)
        _walk_rec(c_scope, child, fn)
