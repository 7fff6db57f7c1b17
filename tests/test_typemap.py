"""StructType <-> Schema compilation (the FromGoType analogue).

Mirrors the table-driven shape of /root/reference/go_test.go: golden schema
documents for primitives, structs, nullability injection, maps, quoted
fields, and the type repository; plus round-trip and self-validation
properties the Go tests cannot express (they have no executor).
"""

from decimal import Decimal

import pytest
from pyspark.sql import types as T

from jsonschema_spark.plans.typemap import (
    PATTERN_FRACTIONAL,
    PATTERN_SIGNED_INT,
    SparkTypeConfig,
    TypeMapError,
    TypeRepository,
    schema_from_spark_type,
    spark_type_from_schema,
)
from jsonschema_spark.schema import Schema


def val(dtype, cfg=None):
    return schema_from_spark_type(dtype, cfg).to_value()


# ---- primitives (go_test.go:14-124 analogue) ----

@pytest.mark.parametrize(
    "dtype,expected",
    [
        (T.BooleanType(), {"type": ["boolean"]}),
        (T.StringType(), {"type": ["string"]}),
        (T.FloatType(), {"type": ["number"]}),
        (T.DoubleType(), {"type": ["number"]}),
        (T.ByteType(), {"type": ["integer"], "minimum": -128, "maximum": 127}),
        (T.ShortType(), {"type": ["integer"], "minimum": -32768, "maximum": 32767}),
        (
            T.IntegerType(),
            {"type": ["integer"], "minimum": -(2**31), "maximum": 2**31 - 1},
        ),
        (T.LongType(), {"type": ["integer"], "minimum": -(2**63), "maximum": 2**63 - 1}),
        (T.DateType(), {"type": ["string"], "format": "date"}),
        (T.TimestampType(), {"type": ["string"], "format": "date-time"}),
        (T.BinaryType(), {"type": ["string"], "contentEncoding": "base64"}),
        (T.VarcharType(20), {"type": ["string"], "maxLength": 20}),
        (T.DecimalType(10, 0), {"type": ["integer"]}),
    ],
)
def test_primitives(dtype, expected):
    assert val(dtype) == expected


def test_decimal_scale_multiple_of():
    s = schema_from_spark_type(T.DecimalType(10, 2))
    assert s.type == ["number"]
    assert s.multiple_of == Decimal("0.01")


# ---- structs: closed world + required (structType go.go:606-697) ----

def test_struct_closed_world_and_required():
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),
            T.StructField("name", T.StringType(), nullable=True),
        ]
    )
    got = val(st)
    assert got["additionalProperties"] is False  # go.go:608
    assert got["required"] == ["id"]
    assert got["properties"]["id"] == {
        "type": ["integer"],
        "minimum": -(2**63),
        "maximum": 2**63 - 1,
    }
    assert got["properties"]["name"] == {"type": ["string", "null"]}


# ---- nullability injection (go.go:387-395) ----

def test_nullable_type_append():
    st = T.StructType([T.StructField("s", T.StringType(), True)])
    assert val(st)["properties"]["s"] == {"type": ["string", "null"]}


def test_nullable_oneof_wrap_for_schemas_without_type():
    # a stored enum definition wraps in oneOf by default (go.go:84-88)
    repo = TypeRepository()
    repo.store("Color", T.StringType(), Schema(enum=["red", "green"]), inline=True)
    cfg = SparkTypeConfig(types=repo)
    st = T.StructType([T.StructField("c", T.StringType(), True)])
    got = schema_from_spark_type(st, cfg).to_value()
    # StringType matches the stored dtype -> inline enum, then oneOf-wrapped
    assert got["properties"]["c"] == {
        "oneOf": [{"enum": ["red", "green"]}, {"type": ["null"]}]
    }


def test_nullable_enum_inject_null():
    repo = TypeRepository()
    repo.store("Color", T.StringType(), Schema(enum=["red", "green"]), inline=True)
    cfg = SparkTypeConfig(types=repo, nullable_enum_inject_null=True)
    st = T.StructType([T.StructField("c", T.StringType(), True)])
    got = schema_from_spark_type(st, cfg).to_value()
    assert got["properties"]["c"] == {"enum": ["red", "green", None]}


# ---- arrays and maps (arrType go.go:714-725, mapType go.go:727-764) ----

def test_array_items():
    got = val(T.ArrayType(T.StringType(), containsNull=False))
    assert got == {"type": ["array"], "items": {"type": ["string"]}}


def test_array_nullable_elements():
    got = val(T.ArrayType(T.StringType(), containsNull=True))
    assert got == {"type": ["array"], "items": {"type": ["string", "null"]}}


def test_map_string_keys_additional_properties():
    got = val(T.MapType(T.StringType(), T.LongType(), valueContainsNull=False))
    assert got == {
        "type": ["object"],
        "additionalProperties": {
            "type": ["integer"],
            "minimum": -(2**63),
            "maximum": 2**63 - 1,
        },
    }


def test_map_nonstring_keys_keys_values_encoding():
    got = val(T.MapType(T.IntegerType(), T.StringType(), valueContainsNull=False))
    assert got["type"] == ["object"]
    assert got["additionalProperties"] is False
    assert sorted(got["required"]) == ["keys", "values"]
    assert got["properties"]["keys"]["uniqueItems"] is True
    assert got["properties"]["keys"]["items"]["type"] == ["integer"]
    assert got["properties"]["values"]["items"] == {"type": ["string"]}


# ---- quoted fields (go.go:104-115, patterns go.go:594-598) ----

def test_quoted_integer_field():
    st = T.StructType(
        [T.StructField("n", T.LongType(), False, metadata={"quoted": True})]
    )
    got = val(st)
    assert got["properties"]["n"] == {"type": ["string"], "pattern": PATTERN_SIGNED_INT}


def test_quoted_float_and_bool():
    st = T.StructType(
        [
            T.StructField("f", T.DoubleType(), False, metadata={"quoted": True}),
            T.StructField("b", T.BooleanType(), False, metadata={"quoted": True}),
        ]
    )
    got = val(st)
    assert got["properties"]["f"]["pattern"] == PATTERN_FRACTIONAL
    assert got["properties"]["b"] == {"enum": ["false", "true"]}


# ---- type repository ($defs / $ref, go.go:55-221 + 1020-1107) ----

def test_repository_ref_and_finalize():
    addr = T.StructType(
        [
            T.StructField("street", T.StringType(), False),
            T.StructField("zip", T.StringType(), False),
        ]
    )
    repo = TypeRepository()
    repo.store("Address", addr)
    person = T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("home", addr, False),
            T.StructField("work", addr, True),
        ]
    )
    got = schema_from_spark_type(person, SparkTypeConfig(types=repo)).to_value()
    assert got["properties"]["home"] == {"$ref": "#/$defs/Address"}
    # nullable ref wraps outside the ref (stored defs unaffected)
    assert got["properties"]["work"] == {
        "oneOf": [{"$ref": "#/$defs/Address"}, {"type": ["null"]}]
    }
    assert got["$defs"]["Address"]["required"] == ["street", "zip"]
    assert got["$defs"]["Address"]["additionalProperties"] is False


def test_repository_inline():
    meta = T.MapType(T.StringType(), T.StringType(), True)
    repo = TypeRepository()
    repo.store("Meta", meta, inline=True)
    st = T.StructType([T.StructField("m", meta, False)])
    got = schema_from_spark_type(st, SparkTypeConfig(types=repo)).to_value()
    assert "$defs" not in got
    assert got["properties"]["m"]["type"] == ["object"]


def test_repository_unreferenced_defs_not_emitted():
    repo = TypeRepository()
    repo.store("Unused", T.StructType([T.StructField("x", T.LongType(), False)]))
    got = schema_from_spark_type(
        T.StructType([T.StructField("a", T.StringType(), False)]),
        SparkTypeConfig(types=repo),
    ).to_value()
    assert "$defs" not in got


# ---- inverse + round-trip ----

def test_spark_type_from_schema_struct():
    s = Schema.from_value(
        {
            "type": ["object"],
            "required": ["id"],
            "properties": {
                "id": {"type": ["integer"]},
                "name": {"type": ["string", "null"]},
                "tags": {"type": ["array"], "items": {"type": ["string"]}},
                "attrs": {"type": ["object"], "additionalProperties": {"type": ["number"]}},
            },
            "additionalProperties": False,
        }
    )
    dt = spark_type_from_schema(s)
    assert isinstance(dt, T.StructType)
    by_name = {f.name: f for f in dt.fields}
    assert isinstance(by_name["id"].dataType, T.LongType) and not by_name["id"].nullable
    assert isinstance(by_name["name"].dataType, T.StringType) and by_name["name"].nullable
    assert isinstance(by_name["tags"].dataType, T.ArrayType)
    assert isinstance(by_name["attrs"].dataType, T.MapType)


def test_round_trip_struct():
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("score", T.DoubleType(), True),
            T.StructField("when", T.TimestampType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("tags", T.ArrayType(T.StringType(), False), False),
            T.StructField(
                "kv", T.MapType(T.StringType(), T.LongType(), False), False
            ),
            T.StructField(
                "nested",
                T.StructType([T.StructField("x", T.IntegerType(), False)]),
                True,
            ),
            T.StructField(
                "imap", T.MapType(T.LongType(), T.StringType(), False), False
            ),
        ]
    )
    back = spark_type_from_schema(schema_from_spark_type(st))
    assert back == st


def test_round_trip_idempotent_on_schema_side():
    st = T.StructType(
        [
            T.StructField("a", T.StringType(), True),
            T.StructField("b", T.ShortType(), False),
        ]
    )
    s1 = schema_from_spark_type(st).to_value()
    s2 = schema_from_spark_type(spark_type_from_schema(schema_from_spark_type(st))).to_value()
    assert s1 == s2


def test_ref_must_be_inlined_first():
    with pytest.raises(TypeMapError):
        spark_type_from_schema(Schema(ref="#/$defs/X"))


# ---- the property the Go tests cannot check: generated schema validates
# ---- the frame it was generated from (compiler x executor consistency)

def test_generated_schema_validates_own_frame(spark):
    from pyspark.sql import Row

    from jsonschema_spark.operators.validate import validate

    df = spark.createDataFrame(
        [
            Row(id=1, name="a", score=1.5, tags=["x", "y"]),
            Row(id=2, name=None, score=None, tags=[]),
        ],
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("name", T.StringType(), True),
                T.StructField("score", T.DoubleType(), True),
                T.StructField("tags", T.ArrayType(T.StringType(), False), False),
            ]
        ),
    )
    schema = schema_from_spark_type(df.schema)
    res = validate(df, schema)
    totals = res.totals().collect()[0]
    assert totals.rows == 2
    assert totals.failed == 0, res.violations(["id"]).collect()


def test_every_driver_table_self_validates(spark):
    """Closing the typemap/validator loop on ALL driver tables: the schema
    derived from each table's StructType validates that table clean."""
    from jsonschema_spark.operators.validate import validate
    from jsonschema_spark.sources.tables import TPCH_TABLES, load_table

    from .conftest import SF_DIR

    for table in TPCH_TABLES:
        df = load_table(spark, SF_DIR, table)
        schema = schema_from_spark_type(df.schema)
        totals = validate(df, schema).totals().collect()[0]
        assert totals.failed == 0, (table, totals)


def test_variant_maps_to_true_schema():
    """VariantType (any JSON value) -> the boolean true schema, the analogue
    of the reference's empty-interface mapping (go.go:361-363)."""
    from pyspark.sql import types as TT

    st = TT.StructType([TT.StructField("v", TT.VariantType(), False)])
    s = schema_from_spark_type(st)
    assert s.properties["v"].is_true()
