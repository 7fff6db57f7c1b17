"""Spark-type <-> JSON Schema compilation — the ``FromGoType`` analogue.

The reference compiles Go types to draft 2020-12 schemas by reflection
(``/root/reference/go.go:256-398``). Our engine's "host type system" is
Spark's ``DataType`` tree, so this module compiles ``StructType`` (and any
nested DataType) to a ``Schema`` and back:

- kind->schema map with per-width integer bounds (go.go:17-51): Spark's
  Byte/Short/Integer/Long carry the same two's-complement bounds as Go's
  int8/int16/int32/int64.
- closed-world structs: ``additionalProperties: false`` always, exactly as
  the reference compiler emits for every Go struct (go.go:608); required =
  non-nullable fields (the analogue of non-omitempty, go.go:648-650).
- nullability injection (go.go:387-395): a nullable Spark field appends
  ``"null"`` to its ``type``, injects ``null`` into its ``enum`` (when
  ``nullable_enum_inject_null``), or wraps in ``oneOf [S, {type:null}]``.
- maps: string keys -> ``additionalProperties``; non-string keys -> the
  ``{keys: [...], values: [...]}`` object encoding with ``uniqueItems`` on
  keys (go.go:727-764).
- quoted (stringified) primitives via field metadata ``{"quoted": true}``,
  using the reference's exact patterns (go.go:594-598): the analogue of
  Go's ``json:",string"`` tag handling (go.go:104-115, tags.go).
- ``TypeRepository`` (go.go:55-221): named definitions referenced as
  ``#/$defs/Name``; ``finalize`` collects referenced defs into the root.
  Spark ``DataType`` trees are strictly finite (no recursive types), so the
  reference's placeholder-before-descent cycle machinery (go.go:334-345)
  has no work to do here — the repository still deduplicates shared
  subtrees via ``$ref``.

The inverse, ``spark_type_from_schema``, turns a (ref-inlined) schema back
into a Spark ``StructType``/``DataType`` — schema-first table declaration.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from decimal import Decimal
from typing import Optional

from pyspark.sql import types as T

from jsonschema_spark.schema import FALSE, Schema

# go.go:17-34 — two's-complement bounds per integral width
_INT_BOUNDS = {
    T.ByteType: (-(2**7), 2**7 - 1),
    T.ShortType: (-(2**15), 2**15 - 1),
    T.IntegerType: (-(2**31), 2**31 - 1),
    T.LongType: (-(2**63), 2**63 - 1),
}

# go.go:594-598 — quoted-primitive patterns, verbatim
PATTERN_SIGNED_INT = r"^-?(0|[1-9]\d*)$"
PATTERN_UNSIGNED_INT = r"^(0|[1-9]\d*)$"
PATTERN_FRACTIONAL = r"^-?(0|[1-9]\d*)(\.\d+)?$"


class TypeMapError(ValueError):
    pass


@dataclass
class TypeRepository:
    """Named schema definitions for Spark types (go.go:55-221).

    ``store`` binds a name to a DataType (with an optional explicit schema —
    otherwise compiled on first use); ``ref`` yields ``#/$defs/Name`` for
    stored non-inline types. Referenced names are tracked so ``finalize``
    can collect exactly the used definitions into the root ``$defs``
    (mirroring the tracking wrapper at go.go:235-254 + Finalize at
    go.go:171-190).
    """

    _entries: dict[str, tuple[T.DataType, Optional[Schema], bool]] = field(
        default_factory=dict
    )
    _referenced: list[str] = field(default_factory=list)

    def store(
        self,
        name: str,
        dtype: T.DataType,
        schema: Optional[Schema] = None,
        inline: bool = False,
    ) -> None:
        self._entries[name] = (dtype, schema, inline)

    def lookup(self, dtype: T.DataType) -> Optional[str]:
        for name, (dt, _s, _inline) in self._entries.items():
            if dt == dtype:
                return name
        return None

    def ref(self, name: str, config: "SparkTypeConfig") -> Schema:
        dtype, schema, inline = self._entries[name]
        if schema is None:
            schema = _compile(dtype, config, repo_active=False)
            self._entries[name] = (dtype, schema, inline)
        if inline:
            return schema.copy()
        if name not in self._referenced:
            self._referenced.append(name)
        return Schema(ref=f"#/$defs/{name}")

    def finalize(self, root: Schema, config: "SparkTypeConfig") -> None:
        """Attach every referenced definition to ``root.$defs``. Definitions
        may reference further definitions; iterate to closure."""
        done: set[str] = set()
        while True:
            pending = [n for n in self._referenced if n not in done]
            if not pending:
                break
            for name in pending:
                done.add(name)
                dtype, schema, _inline = self._entries[name]
                if schema is None:
                    schema = _compile(dtype, config, repo_active=False)
                    self._entries[name] = (dtype, schema, _inline)
                if root.defs is None:
                    root.defs = {}
                root.defs[name] = schema.copy()


@dataclass
class SparkTypeConfig:
    """GoTypeConfig analogue (go.go:77-89)."""

    types: Optional[TypeRepository] = None
    # go.go:84-88: False (default) wraps nullable enums in oneOf; True
    # injects a null member into the enum list instead.
    nullable_enum_inject_null: bool = False
    # containsNull/valueContainsNull on arrays/maps: if True, element
    # nullability is NOT null-injected (the reference's RefTypesNotNullable
    # analogue for its implicitly-nullable reference types, go.go:80-83).
    ref_types_not_nullable: bool = False


def schema_from_spark_type(
    dtype: T.DataType, config: Optional[SparkTypeConfig] = None
) -> Schema:
    """Compile a Spark DataType (usually ``df.schema``) into a draft 2020-12
    schema document. ``FromGoType`` analogue (go.go:256-280)."""
    cfg = config or SparkTypeConfig()
    root = _compile(dtype, cfg, repo_active=True, top_level=True)
    if cfg.types is not None:
        cfg.types.finalize(root, cfg)
    return root


def _quoted_schema(dtype: T.DataType) -> Schema:
    """go.go:594-604 + seeding go.go:201-218: stringified primitives."""
    if isinstance(dtype, tuple(_INT_BOUNDS)):
        return Schema(type=["string"], pattern=PATTERN_SIGNED_INT)
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return Schema(type=["string"], pattern=PATTERN_FRACTIONAL)
    if isinstance(dtype, T.BooleanType):
        return Schema(enum=["false", "true"])
    if isinstance(dtype, T.StringType):
        return Schema(type=["string"])
    raise TypeMapError(f"type {dtype.simpleString()} is not quotable")


def _nullable(s: Schema, cfg: SparkTypeConfig) -> Schema:
    """Null injection, mirroring go.go:387-395 in priority order."""
    if s.ref:
        # referenced defs keep their stored shape; nullability wraps outside
        # (matching "does not affect defined types", go.go:86-88)
        return Schema(one_of=[s, Schema(type=["null"])])
    if s.enum is not None:
        if cfg.nullable_enum_inject_null:
            out = s.copy()
            if None not in out.enum:
                out.enum = list(out.enum) + [None]
            return out
        return Schema(one_of=[s, Schema(type=["null"])])
    if s.type is not None:
        out = s.copy()
        if "null" not in out.type:
            out.type = list(out.type) + ["null"]
        return out
    return Schema(one_of=[s, Schema(type=["null"])])


def _compile(
    dtype: T.DataType,
    cfg: SparkTypeConfig,
    repo_active: bool = True,
    top_level: bool = False,
) -> Schema:
    # repository hit -> $ref (go.go:330-333); the root itself never self-refs
    if repo_active and not top_level and cfg.types is not None:
        name = cfg.types.lookup(dtype)
        if name is not None:
            return cfg.types.ref(name, cfg)

    if isinstance(dtype, T.BooleanType):
        return Schema(type=["boolean"])
    if isinstance(dtype, (T.VarcharType, T.CharType)):
        return Schema(type=["string"], max_length=dtype.length)
    if isinstance(dtype, T.StringType):
        return Schema(type=["string"])
    if isinstance(dtype, tuple(_INT_BOUNDS)):
        lo, hi = _INT_BOUNDS[type(dtype)]
        return Schema(type=["integer"], minimum=lo, maximum=hi)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return Schema(type=["number"])
    if isinstance(dtype, T.DecimalType):
        if dtype.scale == 0:
            return Schema(type=["integer"])
        return Schema(type=["number"], multiple_of=Decimal(1).scaleb(-dtype.scale))
    if isinstance(dtype, T.BinaryType):
        # Spark Binary is an opaque payload column; base64-string is the
        # JSON-document rendering. (Divergence from Go []byte -> array of
        # 0..255 ints, go_test.go:569-577 — documented, deliberate.)
        return Schema(type=["string"], content_encoding="base64")
    if isinstance(dtype, T.DateType):
        return Schema(type=["string"], format="date")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return Schema(type=["string"], format="date-time")
    if isinstance(dtype, T.NullType):
        return Schema(type=["null"])

    if isinstance(dtype, T.ArrayType):
        items = _compile(dtype.elementType, cfg, repo_active)
        if dtype.containsNull and not cfg.ref_types_not_nullable:
            items = _nullable(items, cfg)
        return Schema(type=["array"], items=items)

    if isinstance(dtype, T.MapType):
        value = _compile(dtype.valueType, cfg, repo_active)
        if dtype.valueContainsNull and not cfg.ref_types_not_nullable:
            value = _nullable(value, cfg)
        if isinstance(dtype.keyType, T.StringType):
            # go.go:733-739: string keys -> additionalProperties
            return Schema(type=["object"], additional_properties=value)
        # go.go:741-764: non-string keys -> {keys, values} encoding
        keys = _compile(dtype.keyType, cfg, repo_active)
        return Schema(
            type=["object"],
            properties={
                "keys": Schema(type=["array"], items=keys, unique_items=True),
                "values": Schema(type=["array"], items=value),
            },
            required=["keys", "values"],
            additional_properties=FALSE(),
        )

    if isinstance(dtype, T.StructType):
        s = Schema(type=["object"], additional_properties=FALSE())  # go.go:608
        properties: dict[str, Schema] = {}
        required: list[str] = []
        for f_ in dtype.fields:
            quoted = bool(f_.metadata.get("quoted")) if f_.metadata else False
            if quoted:
                fs = _quoted_schema(f_.dataType)
            else:
                fs = _compile(f_.dataType, cfg, repo_active)
            if f_.nullable:
                fs = _nullable(fs, cfg)
            else:
                required.append(f_.name)
            properties[f_.name] = fs
        if properties:
            s.properties = properties
        if required:
            s.required = required
        return s

    if isinstance(dtype, T.VariantType):
        # any JSON value: the boolean true schema (the analogue of the
        # reference's empty-interface mapping, go.go:361-363)
        return Schema()

    raise TypeMapError(f"unsupported Spark type: {dtype.simpleString()}")


# ---------------------------------------------------------------------------
# Inverse: schema -> Spark DataType
# ---------------------------------------------------------------------------


def spark_type_from_schema(schema: Schema) -> T.DataType:
    """Derive the Spark DataType a (ref-inlined) schema describes —
    schema-first table declaration, the reverse of ``schema_from_spark_type``.
    ``$ref`` edges must be inlined first (plans.compile.inline_refs)."""
    dt, _nullable_ = _to_spark(schema)
    return dt


def _to_spark(s: Schema) -> tuple[T.DataType, bool]:
    """Returns (dtype, nullable)."""
    if s.ref:
        raise TypeMapError(f'inline "$ref": "{s.ref}" before deriving Spark types')
    if s.is_true():
        return T.StringType(), True  # unconstrained: JSON-string rendering

    # oneOf [S, {type: null}] -> nullable S (the _nullable wrap shape)
    if s.one_of and len(s.one_of) == 2:
        null_branches = [b for b in s.one_of if b.to_value() == {"type": "null"}]
        if len(null_branches) == 1:
            other = next(b for b in s.one_of if b is not null_branches[0])
            dt, _n = _to_spark(other)
            return dt, True

    types = list(s.type or [])
    nullable = "null" in types
    types = [t for t in types if t != "null"]
    if len(types) > 1:
        raise TypeMapError(f"multi-type union {types} has no single Spark type")

    if not types:
        if s.enum is not None:
            nn = [m for m in s.enum if m is not None]
            has_null = len(nn) != len(s.enum)
            if nn and all(isinstance(m, str) for m in nn):
                return T.StringType(), has_null
            if nn and all(isinstance(m, bool) for m in nn):
                return T.BooleanType(), has_null
            if nn and all(isinstance(m, int) and not isinstance(m, bool) for m in nn):
                return T.LongType(), has_null
            return T.StringType(), has_null
        if s.properties or s.additional_properties is not None:
            types = ["object"]
        elif s.items is not None or s.prefix_items:
            types = ["array"]
        else:
            return T.StringType(), True

    t = types[0]
    if t == "boolean":
        return T.BooleanType(), nullable
    if t == "string":
        if s.format == "date":
            return T.DateType(), nullable
        if s.format == "date-time":
            return T.TimestampType(), nullable
        if s.content_encoding == "base64":
            return T.BinaryType(), nullable
        return T.StringType(), nullable
    if t == "integer":
        lo, hi = s.minimum, s.maximum
        for dt_cls, (blo, bhi) in _INT_BOUNDS.items():
            if lo == blo and hi == bhi:
                return dt_cls(), nullable
        return T.LongType(), nullable
    if t == "number":
        m = s.multiple_of
        if isinstance(m, Decimal) and m == Decimal(1).scaleb(m.as_tuple().exponent):
            return T.DecimalType(38, -m.as_tuple().exponent), nullable
        return T.DoubleType(), nullable
    if t == "null":
        return T.NullType(), True
    if t == "array":
        if s.items is None:
            return T.ArrayType(T.StringType(), True), nullable
        et, en = _to_spark(s.items)
        return T.ArrayType(et, en), nullable
    if t == "object":
        props = s.properties or {}
        # {keys, values} map encoding (go.go:741-764) round-trips to MapType
        if (
            set(props) == {"keys", "values"}
            and sorted(s.required or []) == ["keys", "values"]
            and props["keys"].type == ["array"]
            and props["values"].type == ["array"]
            and props["keys"].unique_items
        ):
            kt, _kn = _to_spark(props["keys"].items or Schema())
            vt, vn = _to_spark(props["values"].items or Schema())
            return T.MapType(kt, vt, vn), nullable
        if props:
            required = set(s.required or [])
            fields = []
            for name, sub in props.items():
                dt, child_nullable = _to_spark(sub)
                fields.append(
                    T.StructField(name, dt, child_nullable or name not in required)
                )
            return T.StructType(fields), nullable
        if s.additional_properties is not None and not s.additional_properties.is_false():
            vt, vn = _to_spark(s.additional_properties)
            return T.MapType(T.StringType(), vt, vn), nullable
        return T.MapType(T.StringType(), T.StringType(), True), nullable
    raise TypeMapError(f"unsupported JSON type {t!r}")
