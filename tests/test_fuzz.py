"""Property-based fuzz (hypothesis) over the driver-side compile surfaces —
no SparkSession needed, so these run fast and wide.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from jsonschema_spark.jsonptr import validate_json_pointer
from jsonschema_spark.plans.typemap import (
    schema_from_spark_type,
    spark_type_from_schema,
)
from jsonschema_spark.schema import Schema

# ---- Schema document serialization: one normalization pass is a fixpoint ----

_scalar = st.one_of(
    st.none(), st.booleans(), st.integers(-10**6, 10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=12),
)

_keyword_dict = st.fixed_dictionaries(
    {},
    optional={
        "type": st.one_of(
            st.sampled_from(["string", "integer", "number", "object", "array",
                             "boolean", "null"]),
            st.lists(st.sampled_from(["string", "integer", "null"]),
                     min_size=1, max_size=3, unique=True),
        ),
        "enum": st.lists(_scalar, min_size=1, max_size=4),
        "const": _scalar,
        "minimum": st.integers(-100, 100),
        "maximum": st.integers(-100, 100),
        "minLength": st.integers(0, 50),
        "pattern": st.sampled_from(["^a", "b$", "^[a-z]+$", "\\d+"]),
        "required": st.lists(st.text(min_size=1, max_size=6), max_size=3),
        "title": st.text(max_size=10),
        "deprecated": st.booleans(),
    },
)

_schema_value = st.recursive(
    st.one_of(st.booleans(), _keyword_dict),
    lambda children: st.fixed_dictionaries(
        {},
        optional={
            "items": children,
            "not": children,
            "allOf": st.lists(children, min_size=1, max_size=2),
            "properties": st.dictionaries(
                st.text(min_size=1, max_size=6), children, max_size=2
            ),
            "$defs": st.dictionaries(
                st.text(min_size=1, max_size=6), children, max_size=2
            ),
        },
    ),
    max_leaves=8,
)


@settings(max_examples=300, deadline=None)
@given(_schema_value)
def test_schema_value_round_trip_fixpoint(value):
    # The round trip stabilizes after at most TWO passes — exactly like the
    # reference, where {"required": []} marshals to {} (omitempty) while
    # IsTrue stays false (Required != nil, schema.go:234), and the SECOND
    # round collapses {} to true. One-pass fixpoint is deliberately NOT
    # guaranteed; two-pass is.
    s1 = Schema.from_value(value).to_value()
    s2 = Schema.from_value(s1).to_value()
    s3 = Schema.from_value(s2).to_value()
    assert s2 == s3
    # the JSON path parses numbers as Decimal (json.Number emulation), so it
    # is its own (two-pass) fixpoint rather than equal to the value path
    j1 = Schema.from_json(json.dumps(value)).to_json(sort_keys=True)
    j2 = Schema.from_json(j1).to_json(sort_keys=True)
    j3 = Schema.from_json(j2).to_json(sort_keys=True)
    assert j2 == j3


# ---- typemap: schema_from_spark_type ∘ spark_type_from_schema == identity ----

_primitive = st.sampled_from(
    [
        T.BooleanType(), T.StringType(), T.DoubleType(), T.ByteType(),
        T.ShortType(), T.IntegerType(), T.LongType(), T.DateType(),
        T.TimestampType(), T.BinaryType(),
    ]
)

_dtype = st.recursive(
    _primitive,
    lambda children: st.one_of(
        st.builds(T.ArrayType, children, st.booleans()),
        st.builds(
            T.MapType, st.sampled_from([T.StringType(), T.LongType()]),
            children, st.booleans(),
        ),
    ),
    max_leaves=4,
)

_field_names = st.lists(
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"),
        min_size=1, max_size=8,
    ),
    min_size=1, max_size=4, unique=True,
)


@st.composite
def _structs(draw):
    names = draw(_field_names)
    return T.StructType(
        [T.StructField(n, draw(_dtype), draw(st.booleans())) for n in names]
    )


@settings(max_examples=200, deadline=None)
@given(_structs())
def test_typemap_round_trip(struct):
    back = spark_type_from_schema(schema_from_spark_type(struct))
    assert back == struct


@settings(max_examples=200, deadline=None)
@given(_structs())
def test_typemap_schema_side_fixpoint(struct):
    s1 = schema_from_spark_type(struct).to_value()
    s2 = schema_from_spark_type(spark_type_from_schema(schema_from_spark_type(struct))).to_value()
    assert s1 == s2


# ---- RFC 6901 pointers never crash; well-formed pointers validate ----

@settings(max_examples=500, deadline=None)
@given(st.text(max_size=30))
def test_pointer_validation_total(s):
    try:
        validate_json_pointer(s)
    except ValueError:
        pass  # rejection is fine; any other exception type is a bug


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(max_size=8), max_size=4))
def test_escaped_pointers_always_valid(segments):
    ptr = "".join(
        "/" + seg.replace("~", "~0").replace("/", "~1") for seg in segments
    )
    validate_json_pointer(ptr)  # must not raise
