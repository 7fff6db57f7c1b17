"""Schema inference (plans/infer.py) — the FromGoType-of-data analogue.

Pins: inference rules (enum gate, required-from-nulls, exact bounds), the
self-validation invariant (a table always passes its own inferred schema),
and the typemap consistency fix (a schema produced from a table's own
StructType must not statically fail against that table — temporal columns).
"""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_spark.operators.validate import validate
from jsonschema_spark.plans.infer import (
    InferOptions,
    infer_schema,
    inferred_constraints,
    profile_columns,
)
from jsonschema_spark.plans.typemap import schema_from_spark_type
from jsonschema_spark.sources.tables import load_table

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "a", 10.5, datetime.datetime(2024, 1, 1, 0, 0, 0), None),
        (2, "b", -3.25, datetime.datetime(2024, 6, 1, 12, 30, 0), None),
        (3, "a", 99.0, None, None),
        (None, "ccc", 0.0, datetime.datetime(2024, 3, 1, 6, 0, 0), None),
    ]
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("allnull", T.StringType()),
    ])
    return spark.createDataFrame(rows, schema)


def test_profile_exact_values(frame):
    p = profile_columns(frame, options=InferOptions(exact=True))
    assert p["k"].null_count == 1 and p["k"].min_value == 1 and p["k"].max_value == 3
    assert p["s"].null_count == 0
    assert p["s"].min_length == 1 and p["s"].max_length == 3
    assert p["s"].distinct_count == 3
    assert p["s"].enum_values == ["a", "b", "ccc"]
    assert p["v"].min_value == -3.25 and p["v"].max_value == 99.0
    assert p["allnull"].null_count == 4
    assert p["allnull"].min_length is None
    assert p["allnull"].enum_values is None


def test_enum_gate_boundary(frame):
    # 3 distinct values: gate at 3 keeps the enum, gate at 2 drops it
    assert infer_schema(frame, options=InferOptions(max_enum=3)).properties["s"].enum \
        == ["a", "b", "ccc"]
    assert infer_schema(frame, options=InferOptions(max_enum=2)).properties["s"].enum \
        is None


def test_inferred_schema_shape(frame):
    s = infer_schema(frame)
    assert s.type == ["object"]
    assert s.required == ["s", "v"]  # columns with zero nulls
    assert s.properties["k"].type == ["integer", "null"]
    assert s.properties["k"].minimum == 1 and s.properties["k"].maximum == 3
    assert s.properties["s"].type == ["string"]
    assert s.properties["v"].type == ["number"]
    assert s.properties["ts"].format == "date-time"
    assert s.properties["ts"].minimum == "2024-01-01 00:00:00"
    assert s.properties["ts"].maximum == "2024-06-01 12:30:00"
    # all-null column: nullable type, no bounds, no enum
    assert s.properties["allnull"].type == ["string", "null"]
    assert s.properties["allnull"].min_length is None
    assert s.properties["allnull"].enum is None
    # the inferred document is JSON-serializable; serialization reaches a
    # fixpoint after one parse cycle (float literals re-parse as Decimal,
    # same canonicalization the fuzz suite pins)
    from jsonschema_spark.schema import Schema
    once = Schema.from_json(s.to_json()).to_json()
    assert Schema.from_json(once).to_json() == once


def test_self_validation_is_clean(frame):
    """The defining invariant: every table passes its own inferred schema."""
    res = validate(frame, infer_schema(frame))
    totals = res.totals().collect()[0]
    assert totals["failed"] == 0 and totals["violation_count"] == 0


def test_self_validation_orders(spark):
    orders = load_table(spark, SF_DIR, "orders")
    res = validate(orders, infer_schema(orders))
    assert res.totals().collect()[0]["violation_count"] == 0


def test_trained_schema_flags_out_of_domain(spark, frame):
    """Train on a clean slice, enforce on the full frame: the row with the
    out-of-range key and the over-long string must fail."""
    clean = frame.filter(F.col("k").isNotNull() & (F.col("s") != "ccc"))
    inferred = infer_schema(clean)
    viol = validate(frame, inferred).violations(["k"]).collect()
    kw = {(r["keyword"], r["column"]) for r in viol}
    assert ("required", "k") in kw            # null k
    assert ("maxLength", "s") in kw           # 'ccc' vs max len 1
    assert ("enum", "s") in kw                # 'ccc' not in {a, b}


def test_constraints_frame_matches_schema(frame):
    cons = {
        (r["column"], r["keyword"]): (r["value_str"], r["value_num"])
        for r in inferred_constraints(frame).collect()
    }
    assert cons[("k", "minimum")] == ("1", 1.0)
    assert cons[("k", "maximum")] == ("3", 3.0)
    assert cons[("s", "required")][0] == "true"
    assert cons[("s", "enum")][0] == "a|b|ccc"
    assert cons[("v", "minimum")] == (None, -3.25)
    assert cons[("ts", "minimum")][0] == "2024-01-01 00:00:00"
    assert ("allnull", "minimum") not in cons
    assert ("allnull", "required") not in cons


def test_approx_gate_still_exact_enum(frame):
    """exact=False uses HLL for the gate but the enum contents stay exact."""
    s = infer_schema(frame, options=InferOptions(exact=False))
    assert s.properties["s"].enum == ["a", "b", "ccc"]


def test_typemap_schema_passes_own_table(spark, frame):
    """schema_from_spark_type(df.schema) must validate df cleanly — incl.
    temporal columns mapped to {"type": "string", "format": "date-time"}
    (static type match extended to temporal)."""
    s = schema_from_spark_type(frame.schema)
    res = validate(frame, s)
    assert res.totals().collect()[0]["violation_count"] == 0


# ---------------------------------------------------------------------------
# Property fuzz: the self-validation invariant holds for ARBITRARY data.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_cell_int = st.one_of(st.none(), st.integers(-(10**9), 10**9))
_cell_float = st.one_of(
    st.none(), st.floats(allow_nan=False, allow_infinity=False, width=64)
)
_cell_str = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=8
    ),
)
_rows = st.lists(
    st.tuples(_cell_int, _cell_float, _cell_str), min_size=1, max_size=25
)


@settings(max_examples=12, deadline=None)
@given(rows=_rows)
def test_fuzz_self_validation(spark, rows):
    """validate(df, infer_schema(df)) is violation-free for any frame —
    inference must never produce a constraint its own training data
    violates (bounds inclusive, enum complete, required only on
    null-free columns, lengths in codepoints)."""
    df = spark.createDataFrame(rows, "i long, f double, s string")
    res = validate(df, infer_schema(df))
    assert res.totals().collect()[0]["violation_count"] == 0
