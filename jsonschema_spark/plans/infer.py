"""Schema inference from data — the data-side sibling of ``FromGoType``.

The reference compiles a schema from a *Go type* (``FromGoType``,
/root/reference/go.go:256-398); ``plans/typemap.py`` ports that as
``schema_from_spark_type`` (StructType -> Schema). This module closes the
triangle: infer a draft 2020-12 schema from the *data itself* — observed
null counts, exact min/max bounds, string lengths, and low-cardinality
value sets — so a validation pipeline can "train" a schema on a trusted
slice and enforce it on the full feed (profile -> infer -> validate).

Inference rules (deterministic, exact — no sampling, no approximation in
the default/oracle path):

- column type       -> JSON Schema ``type`` (integral -> integer,
                       float/double/decimal -> number, string -> string,
                       boolean -> boolean, timestamp/date -> string +
                       ``format`` date-time/date, binary -> string +
                       ``contentEncoding`` base64)
- zero observed nulls  -> ``required`` membership (else "null" joins the
                          type union)
- integer / number     -> ``minimum`` / ``maximum`` from exact min/max
- string               -> ``minLength`` / ``maxLength`` (codepoints) and,
                          when the exact distinct count <= ``max_enum``,
                          ``enum`` of the observed values
- ``closed_world=True``-> ``additionalProperties: false`` (the reference's
                          own disposition for structs, go.go:608)

Scale design (10^12 rows): TWO aggregate jobs. Pass 1 (default) computes
counts/bounds and gates enum candidacy with ``approx_count_distinct``
(HLL++ — a mergeable sketch, so the whole pass is one partial+final hash
aggregate: no shuffle wider than one row per task, no sort, no window).
Pass 2 runs ``collect_set`` ONLY on columns the sketch gated in (with
head-room factor 2 on the threshold), then re-checks the ACTUAL set size
against ``max_enum`` — so every final inference decision is exact even
though the gate is a sketch; the sketch only decides which columns pay
for pass-2 state (bounded by ~2x ``max_enum`` values per column). The
only driver materialization is the one-row profile.

``exact=True`` (audit mode) swaps the gate to ``count_distinct``. NOTE:
multiple exact distinct aggregates in one pass make Catalyst plan an
Expand (input multiplied per distinct column) plus a shuffle of distinct
values — fine for audits, not the 10^12-row default; the sketch gate is.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_spark.schema import FALSE, Schema

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType, T.DecimalType)


@dataclass(frozen=True)
class InferOptions:
    max_enum: int = 16            # strings with <= this many distincts -> enum
    numeric_bounds: bool = True   # minimum/maximum on numeric columns
    string_bounds: bool = True    # minLength/maxLength on string columns
    required_from_nulls: bool = True  # zero nulls -> required
    closed_world: bool = True     # additionalProperties: false
    exact: bool = False           # True = exact distinct gate (audit mode)
    rsd: float = 0.05             # HLL rsd for the default sketch gate


@dataclass(frozen=True)
class ColumnProfile:
    column: str
    dtype: T.DataType
    row_count: int
    null_count: int
    min_value: Any            # long / float / datetime / str — None if all-null
    max_value: Any
    min_length: Optional[int]  # strings only
    max_length: Optional[int]
    distinct_count: Optional[int]  # strings only (enum gate)
    enum_values: Optional[list]    # sorted observed values, if gated in


def _is_stats_type(dt: T.DataType) -> str:
    """Classify for stats purposes: int | num | str | ts | date | bool | other."""
    if isinstance(dt, _INTEGRAL):
        return "int"
    if isinstance(dt, _FRACTIONAL):
        return "num"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BooleanType):
        return "bool"
    return "other"


def profile_columns(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    options: Optional[InferOptions] = None,
) -> dict[str, ColumnProfile]:
    """Two-pass exact profile; returns one ``ColumnProfile`` per column.

    Pass 1: one hash aggregate (counts, bounds, lengths, distincts).
    Pass 2: ``collect_set`` restricted to enum candidates (state bounded by
    ``max_enum`` values per column). Only the one-row results are collected.
    """
    opts = options or InferOptions()
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else [f.name for f in df.schema.fields]

    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        kind = _is_stats_type(fields[c])
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"))
        if kind in ("int", "num", "ts", "date"):
            aggs.append(F.min(c).alias(f"_min_{c}"))
            aggs.append(F.max(c).alias(f"_max_{c}"))
        elif kind == "str":
            aggs.append(F.min(F.length(c)).alias(f"_minlen_{c}"))
            aggs.append(F.max(F.length(c)).alias(f"_maxlen_{c}"))
            if opts.exact:
                aggs.append(F.count_distinct(F.col(c)).alias(f"_dist_{c}"))
            else:
                aggs.append(
                    F.approx_count_distinct(c, opts.rsd).alias(f"_dist_{c}")
                )
    row = df.agg(*aggs).collect()[0].asDict()

    # Pass 2: enum contents for gated-in string columns only.
    gate = opts.max_enum if opts.exact else opts.max_enum * 2
    candidates = [
        c for c in cols
        if _is_stats_type(fields[c]) == "str"
        and row[f"_dist_{c}"] is not None
        and 0 < row[f"_dist_{c}"] <= gate
    ]
    enums: dict[str, list] = {}
    if candidates:
        eaggs = [
            F.sort_array(F.collect_set(c)).alias(f"_enum_{c}") for c in candidates
        ]
        erow = df.agg(*eaggs).collect()[0].asDict()
        for c in candidates:
            vals = erow[f"_enum_{c}"]
            if vals is not None and len(vals) <= opts.max_enum:
                enums[c] = list(vals)

    out: dict[str, ColumnProfile] = {}
    for c in cols:
        kind = _is_stats_type(fields[c])
        out[c] = ColumnProfile(
            column=c,
            dtype=fields[c],
            row_count=row["_rows"],
            null_count=row[f"_null_{c}"],
            min_value=row.get(f"_min_{c}"),
            max_value=row.get(f"_max_{c}"),
            min_length=row.get(f"_minlen_{c}"),
            max_length=row.get(f"_maxlen_{c}"),
            distinct_count=row.get(f"_dist_{c}") if kind == "str" else None,
            enum_values=enums.get(c),
        )
    return out


def _base_type(dt: T.DataType) -> tuple[str, Optional[str], Optional[str]]:
    """(json type, format, contentEncoding) for a scalar Spark type."""
    kind = _is_stats_type(dt)
    if kind == "int":
        return "integer", None, None
    if kind == "num":
        return "number", None, None
    if kind == "str":
        return "string", None, None
    if kind == "ts":
        return "string", "date-time", None
    if kind == "date":
        return "string", "date", None
    if kind == "bool":
        return "boolean", None, None
    if isinstance(dt, T.BinaryType):
        return "string", None, "base64"
    return None, None, None  # complex types: structural mapping, no stats


def schema_from_profile(
    profiles: dict[str, ColumnProfile],
    options: Optional[InferOptions] = None,
) -> Schema:
    """Assemble the inferred draft 2020-12 document from column profiles."""
    opts = options or InferOptions()
    props: dict[str, Schema] = {}
    required: list[str] = []
    for c, p in profiles.items():
        jtype, fmt, enc = _base_type(p.dtype)
        nullable = p.null_count > 0 or not opts.required_from_nulls
        if jtype is None:
            # complex column (array/map/struct): structural schema from the
            # typemap compiler, stats-free — inference must not crash on
            # realistic tables just because one column isn't scalar
            from jsonschema_spark.plans.typemap import schema_from_spark_type

            props[c] = schema_from_spark_type(p.dtype)
            if not nullable and opts.required_from_nulls:
                required.append(c)
            continue
        s = Schema(type=[jtype, "null"] if nullable else [jtype])
        if fmt:
            s.format = fmt
        if enc:
            s.content_encoding = enc
        kind = _is_stats_type(p.dtype)
        if opts.numeric_bounds and kind in ("int", "num") and p.min_value is not None:
            s.minimum = p.min_value
            s.maximum = p.max_value
        elif opts.numeric_bounds and kind == "ts" and p.min_value is not None:
            # ISO strings keep the Schema JSON-serializable; the compiler
            # applies bounds to temporal columns via Spark's string->
            # timestamp literal coercion. Full isoformat preserves micros.
            s.minimum = p.min_value.isoformat(sep=" ")
            s.maximum = p.max_value.isoformat(sep=" ")
        elif opts.numeric_bounds and kind == "date" and p.min_value is not None:
            s.minimum = p.min_value.isoformat()
            s.maximum = p.max_value.isoformat()
        if kind == "str":
            if opts.string_bounds and p.min_length is not None:
                s.min_length = int(p.min_length)
                s.max_length = int(p.max_length)
            if p.enum_values is not None:
                # NULL means "property absent" in the column model (the
                # engine's documented conflation) — absent skips enum, so
                # the inferred enum never needs a null member.
                s.enum = list(p.enum_values)
        props[c] = s
        if not nullable and opts.required_from_nulls:
            required.append(c)
    return Schema(
        type=["object"],
        properties=props,
        required=required or None,
        additional_properties=FALSE() if opts.closed_world else None,
    )


def infer_schema(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    options: Optional[InferOptions] = None,
) -> Schema:
    """Profile ``df`` (two aggregate jobs) and return the inferred schema."""
    opts = options or InferOptions()
    return schema_from_profile(profile_columns(df, columns, opts), opts)


# ---------------------------------------------------------------------------
# Long-format constraints view — the contract/reporting surface.
# ---------------------------------------------------------------------------

_CONSTRAINTS_SCHEMA = T.StructType([
    T.StructField("column", T.StringType(), False),
    T.StructField("keyword", T.StringType(), False),
    T.StructField("value_str", T.StringType(), True),
    T.StructField("value_num", T.DoubleType(), True),
])


def inferred_constraints(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    options: Optional[InferOptions] = None,
) -> DataFrame:
    """(column, keyword, value_str, value_num) — one row per inferred
    constraint. ``value_num`` carries numeric values bit-exactly (min/max of
    a column are selected, never computed, so they compare exactly against
    any engine reading the same data); ``value_str`` carries strings, enum
    sets ('|'-joined sorted values), and decimal renderings of integers.

    The profile computation is distributed (two hash aggregates); only the
    O(columns) constraint rows are assembled on the driver.
    """
    opts = options or InferOptions()
    profiles = profile_columns(df, columns, opts)
    rows: list[tuple] = []
    for c, p in profiles.items():
        jtype, fmt, _enc = _base_type(p.dtype)
        kind = _is_stats_type(p.dtype)
        if jtype is None:
            # complex column: null-profile only
            if opts.required_from_nulls and p.null_count == 0:
                rows.append((c, "required", "true", None))
            continue
        rows.append((c, "type", jtype, None))
        if fmt:
            rows.append((c, "format", fmt, None))
        if opts.required_from_nulls and p.null_count == 0:
            rows.append((c, "required", "true", None))
        if opts.numeric_bounds and p.min_value is not None:
            if kind == "int":
                rows.append((c, "minimum", str(p.min_value), float(p.min_value)))
                rows.append((c, "maximum", str(p.max_value), float(p.max_value)))
            elif kind == "num":
                rows.append((c, "minimum", None, float(p.min_value)))
                rows.append((c, "maximum", None, float(p.max_value)))
            elif kind == "ts":
                rows.append((c, "minimum", p.min_value.isoformat(sep=" "), None))
                rows.append((c, "maximum", p.max_value.isoformat(sep=" "), None))
            elif kind == "date":
                rows.append((c, "minimum", p.min_value.isoformat(), None))
                rows.append((c, "maximum", p.max_value.isoformat(), None))
        if kind == "str":
            if opts.string_bounds and p.min_length is not None:
                rows.append(
                    (c, "minLength", str(p.min_length), float(p.min_length))
                )
                rows.append(
                    (c, "maxLength", str(p.max_length), float(p.max_length))
                )
            if p.enum_values is not None:
                rows.append((c, "enum", "|".join(p.enum_values), None))
    return df.sparkSession.createDataFrame(rows, _CONSTRAINTS_SCHEMA).orderBy(
        "column", "keyword"
    )
