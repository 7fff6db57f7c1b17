"""JSON Schema draft 2020-12 document model.

Reference parity: /root/reference/schema.go (Schema struct schema.go:44-140,
TypeSet schema.go:20-37, boolean schemas schema.go:39-42, marshal/unmarshal
collapse schema.go:147-173, emptiness predicates schema.go:175-265).

Design notes (Spark-first): this model is a small driver-side object. It never
touches row data; the compiler in ``jsonschema_spark.plans`` turns it into
PySpark Column expressions that Catalyst evaluates JVM-side.

Numbers: JSON numbers with a fractional/exponent part are parsed to
``decimal.Decimal`` (the analogue of Go's ``json.Number`` arbitrary-precision
behavior, schema.go:91-95); integers stay ``int`` (unbounded in Python).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, fields
from decimal import Decimal
from typing import Any, Optional

# The seven instance types, schema.go:10-18.
TYPE_NULL = "null"
TYPE_BOOLEAN = "boolean"
TYPE_OBJECT = "object"
TYPE_ARRAY = "array"
TYPE_NUMBER = "number"
TYPE_INTEGER = "integer"
TYPE_STRING = "string"

ALL_TYPES = (
    TYPE_NULL,
    TYPE_BOOLEAN,
    TYPE_OBJECT,
    TYPE_ARRAY,
    TYPE_NUMBER,
    TYPE_INTEGER,
    TYPE_STRING,
)

# (python attribute, JSON keyword) in the declaration order of schema.go:44-140.
_KEYWORDS: list[tuple[str, str]] = [
    # core
    ("schema", "$schema"),
    ("vocabulary", "$vocabulary"),
    ("id", "$id"),
    ("ref", "$ref"),
    ("anchor", "$anchor"),
    ("dynamic_ref", "$dynamicRef"),
    ("dynamic_anchor", "$dynamicAnchor"),
    ("defs", "$defs"),
    ("comment", "$comment"),
    # logic applicators
    ("all_of", "allOf"),
    ("any_of", "anyOf"),
    ("one_of", "oneOf"),
    ("not_", "not"),
    # conditional applicators
    ("if_", "if"),
    ("then", "then"),
    ("else_", "else"),
    ("dependent_schemas", "dependentSchemas"),
    # array applicators
    ("prefix_items", "prefixItems"),
    ("items", "items"),
    ("contains", "contains"),
    # object applicators
    ("properties", "properties"),
    ("pattern_properties", "patternProperties"),
    ("additional_properties", "additionalProperties"),
    ("property_names", "propertyNames"),
    # generic validation
    ("type", "type"),
    ("enum", "enum"),
    ("const", "const"),
    # numeric validation
    ("multiple_of", "multipleOf"),
    ("maximum", "maximum"),
    ("exclusive_maximum", "exclusiveMaximum"),
    ("minimum", "minimum"),
    ("exclusive_minimum", "exclusiveMinimum"),
    # string validation
    ("max_length", "maxLength"),
    ("min_length", "minLength"),
    ("pattern", "pattern"),
    # array validation
    ("max_items", "maxItems"),
    ("min_items", "minItems"),
    ("unique_items", "uniqueItems"),
    ("max_contains", "maxContains"),
    ("min_contains", "minContains"),
    # object validation
    ("max_properties", "maxProperties"),
    ("min_properties", "minProperties"),
    ("required", "required"),
    ("dependent_required", "dependentRequired"),
    # unevaluated
    ("unevaluated_items", "unevaluatedItems"),
    ("unevaluated_properties", "unevaluatedProperties"),
    # format-annotation
    ("format", "format"),
    # content
    ("content_encoding", "contentEncoding"),
    ("content_media_type", "contentMediaType"),
    ("content_schema", "contentSchema"),
    # metadata
    ("title", "title"),
    ("description", "description"),
    ("default", "default"),
    ("deprecated", "deprecated"),
    ("read_only", "readOnly"),
    ("write_only", "writeOnly"),
    ("examples", "examples"),
]

ATTR_TO_KEYWORD = dict(_KEYWORDS)
KEYWORD_TO_ATTR = {k: a for a, k in _KEYWORDS}

# Keyword groups by value shape (drives parse/serialize/walk/copy generically).
_SINGLE_SCHEMA_ATTRS = (
    "not_",
    "if_",
    "then",
    "else_",
    "items",
    "contains",
    "additional_properties",
    "property_names",
    "unevaluated_items",
    "unevaluated_properties",
    "content_schema",
)
_SCHEMA_LIST_ATTRS = ("all_of", "any_of", "one_of", "prefix_items")
_SCHEMA_MAP_ATTRS = ("defs", "dependent_schemas", "properties", "pattern_properties")


def _parse_type_set(v: Any) -> list[str]:
    """TypeSet.UnmarshalJSON, schema.go:20-37: scalar normalizes to a 1-list."""
    if isinstance(v, str):
        return [v]
    if isinstance(v, list):
        out = []
        for t in v:
            if not isinstance(t, str):
                raise ValueError(f"invalid type entry: {t!r}")
            out.append(t)
        return out
    raise ValueError(f'invalid "type" value: {v!r}')


@dataclass
class Schema:
    """One draft 2020-12 schema document / subschema (schema.go:44-140).

    ``Schema()`` is the boolean schema ``true``; ``Schema(not_=Schema())``
    is ``false`` (schema.go:39-42).
    """

    # core
    schema: str = ""
    vocabulary: Optional[dict[str, bool]] = None
    id: str = ""
    ref: str = ""
    anchor: str = ""
    dynamic_ref: str = ""
    dynamic_anchor: str = ""
    defs: Optional[dict[str, "Schema"]] = None
    comment: str = ""
    # logic applicators
    all_of: Optional[list["Schema"]] = None
    any_of: Optional[list["Schema"]] = None
    one_of: Optional[list["Schema"]] = None
    not_: Optional["Schema"] = None
    # conditional applicators
    if_: Optional["Schema"] = None
    then: Optional["Schema"] = None
    else_: Optional["Schema"] = None
    dependent_schemas: Optional[dict[str, "Schema"]] = None
    # array applicators
    prefix_items: Optional[list["Schema"]] = None
    items: Optional["Schema"] = None
    contains: Optional["Schema"] = None
    # object applicators
    properties: Optional[dict[str, "Schema"]] = None
    pattern_properties: Optional[dict[str, "Schema"]] = None
    additional_properties: Optional["Schema"] = None
    property_names: Optional["Schema"] = None
    # generic validation
    type: Optional[list[str]] = None
    enum: Optional[list[Any]] = None
    const: Any = None
    # numeric validation (int | Decimal, arbitrary precision)
    multiple_of: Optional[Any] = None
    maximum: Optional[Any] = None
    exclusive_maximum: Optional[Any] = None
    minimum: Optional[Any] = None
    exclusive_minimum: Optional[Any] = None
    # string validation
    max_length: Optional[int] = None
    min_length: Optional[int] = None
    pattern: Optional[str] = None
    # array validation
    max_items: Optional[int] = None
    min_items: Optional[int] = None
    unique_items: Optional[bool] = None
    max_contains: Optional[int] = None
    min_contains: Optional[int] = None
    # object validation
    max_properties: Optional[int] = None
    min_properties: Optional[int] = None
    required: Optional[list[str]] = None
    dependent_required: Optional[dict[str, list[str]]] = None
    # unevaluated
    unevaluated_items: Optional["Schema"] = None
    unevaluated_properties: Optional["Schema"] = None
    # format
    format: Optional[str] = None
    # content
    content_encoding: Optional[str] = None
    content_media_type: Optional[str] = None
    content_schema: Optional["Schema"] = None
    # metadata
    title: str = ""
    description: str = ""
    default: Any = None
    deprecated: Optional[bool] = None
    read_only: Optional[bool] = None
    write_only: Optional[bool] = None
    examples: Optional[list[Any]] = None

    # ---- parse / serialize (schema.go:147-173) ----

    @classmethod
    def from_value(cls, v: Any) -> "Schema":
        """Build a Schema from a decoded JSON value (dict | True | False)."""
        if v is True:
            return cls()
        if v is False:
            return cls(not_=cls())
        if not isinstance(v, dict):
            raise ValueError(f"schema must be an object or boolean, got {type(v).__name__}")
        s = cls()
        for key, raw in v.items():
            attr = KEYWORD_TO_ATTR.get(key)
            if attr is None:
                # Unknown keywords are ignored, matching encoding/json's
                # behavior for unknown fields in the reference.
                continue
            if attr in _SINGLE_SCHEMA_ATTRS:
                setattr(s, attr, cls.from_value(raw))
            elif attr in _SCHEMA_LIST_ATTRS:
                setattr(s, attr, [cls.from_value(x) for x in raw])
            elif attr in _SCHEMA_MAP_ATTRS:
                setattr(s, attr, {k: cls.from_value(x) for k, x in raw.items()})
            elif attr == "type":
                s.type = _parse_type_set(raw)
            else:
                setattr(s, attr, raw)
        return s

    @classmethod
    def from_json(cls, text: str | bytes) -> "Schema":
        """Parse a JSON document; fractional numbers become Decimal."""
        return cls.from_value(json.loads(text, parse_float=Decimal))

    def to_value(self) -> Any:
        """Inverse of from_value; collapses to True/False (schema.go:163-173)."""
        if self.is_false():
            return False
        if self.is_true():
            return True
        out: dict[str, Any] = {}
        for attr, key in _KEYWORDS:
            v = getattr(self, attr)
            # omitempty: None, "", empty list/map are omitted; `False`/`0`
            # survive (they sit behind pointer fields in the reference).
            if v is None:
                continue
            if isinstance(v, str) and v == "":
                continue
            if isinstance(v, (list, dict)) and not v:
                continue
            if attr in _SINGLE_SCHEMA_ATTRS:
                out[key] = v.to_value()
            elif attr in _SCHEMA_LIST_ATTRS:
                out[key] = [x.to_value() for x in v]
            elif attr in _SCHEMA_MAP_ATTRS:
                out[key] = {k: x.to_value() for k, x in v.items()}
            else:
                out[key] = v
        return out

    def to_json(self, **kwargs: Any) -> str:
        return json.dumps(self.to_value(), default=_json_default, **kwargs)

    def __str__(self) -> str:  # Schema.String, schema.go:142-145
        return self.to_json(separators=(",", ":"))

    # ---- category predicates (schema.go:175-248) ----

    def has_metadata(self) -> bool:
        return bool(
            self.title
            or self.description
            or self.default is not None
            or self.deprecated is not None
            or self.read_only is not None
            or self.write_only is not None
            or self.examples
        )

    def has_core(self) -> bool:
        return bool(
            self.schema
            or self.vocabulary
            or self.id
            or self.ref
            or self.anchor
            or self.dynamic_ref
            or self.dynamic_anchor
            or self.defs
            or self.comment
        )

    def has_applicators(self) -> bool:
        return bool(
            self.all_of
            or self.any_of
            or self.one_of
            or self.not_ is not None
            or self.if_ is not None
            or self.then is not None
            or self.else_ is not None
            or self.dependent_schemas
            or self.prefix_items
            or self.items is not None
            or self.contains is not None
            or self.properties
            or self.pattern_properties
            or self.additional_properties is not None
            or self.property_names is not None
        )

    def has_validators(self) -> bool:
        return (
            self.type is not None
            or self.enum is not None
            or self.const is not None
            or self.multiple_of is not None
            or self.maximum is not None
            or self.exclusive_maximum is not None
            or self.minimum is not None
            or self.exclusive_minimum is not None
            or self.max_length is not None
            or self.min_length is not None
            or self.pattern is not None
            or self.max_items is not None
            or self.min_items is not None
            or self.unique_items is not None
            or self.max_contains is not None
            or self.min_contains is not None
            or self.max_properties is not None
            or self.min_properties is not None
            or self.required is not None
            or self.dependent_required is not None
        )

    def has_unevaluated(self) -> bool:
        return self.unevaluated_items is not None or self.unevaluated_properties is not None

    def has_format(self) -> bool:
        return self.format is not None

    def has_content(self) -> bool:
        return (
            self.content_encoding is not None
            or self.content_media_type is not None
            or self.content_schema is not None
        )

    def is_true(self) -> bool:
        """True iff the schema is completely empty (schema.go:256-259).

        Metadata counts as non-empty, same as the reference.
        """
        return not (
            self.has_core()
            or self.has_applicators()
            or self.has_validators()
            or self.has_unevaluated()
            or self.has_metadata()
            or self.has_content()
            or self.has_format()
        )

    def is_false(self) -> bool:
        """True iff ``not`` holds an empty schema (schema.go:263-265)."""
        return self.not_ is not None and self.not_.is_true()

    # ---- deep copy (copy.go:9-71) ----

    def copy(self) -> "Schema":
        """Deep copy: no mutable state shared with the source (copy.go)."""
        s = Schema()
        for f in fields(self):
            v = getattr(self, f.name)
            if isinstance(v, Schema):
                v = v.copy()
            elif isinstance(v, list):
                v = [x.copy() if isinstance(x, Schema) else _copy_any(x) for x in v]
            elif isinstance(v, dict):
                v = {k: (x.copy() if isinstance(x, Schema) else _copy_any(x)) for k, x in v.items()}
            setattr(s, f.name, v)
        return s


def _json_default(o: Any) -> Any:
    if isinstance(o, Decimal):
        # json.Number round-trip: emit the literal form, not a float.
        return float(o) if o != o.to_integral_value() else int(o)
    raise TypeError(f"not JSON serializable: {type(o).__name__}")


def _copy_any(v: Any) -> Any:
    """copyAny (copy.go:81-90): JSON round-trip semantics for `any` values."""
    if isinstance(v, dict):
        return {k: _copy_any(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_copy_any(x) for x in v]
    return v


def TRUE() -> Schema:
    """The boolean schema ``true`` (schema.go:40)."""
    return Schema()


def FALSE() -> Schema:
    """The boolean schema ``false`` (schema.go:41)."""
    return Schema(not_=Schema())
