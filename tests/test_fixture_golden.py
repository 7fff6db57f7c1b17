"""End-to-end golden runs over the reference's OWN fixture schema documents
(/root/reference/testdata/*) — SURVEY §5 row 3: parse -> resolve/inline ->
compile -> evaluate on small frames with planted violations, asserting the
exact (row, keyword) violation sets.
"""

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from jsonschema_spark.loader import new_embedded_loader
from jsonschema_spark.operators.validate import validate
from jsonschema_spark.resolve import ResolveConfig

REF = "/root/reference/testdata"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference testdata not present"
)


def fixture(name: str) -> dict:
    with open(os.path.join(REF, name)) as f:
        return json.load(f)


def viol_set(res, key):
    return sorted(
        (r[key], r.keyword) for r in res.violations([key]).collect()
    )


def test_person_schema(spark):
    schema = fixture("miscellaneous-examples/person.schema.json")
    df = spark.createDataFrame(
        [
            Row(pid=1, firstName="Ada", lastName="L", age=36),
            Row(pid=2, firstName=None, lastName=None, age=None),  # nothing required
            Row(pid=3, firstName="Kid", lastName="X", age=-2),
        ],
        "pid long, firstName string, lastName string, age int",
    )
    assert viol_set(validate(df, schema), "pid") == [(3, "minimum")]


def test_arrays_schema_with_local_ref(spark):
    schema = fixture("miscellaneous-examples/arrays.schema.json")
    veg = T.ArrayType(
        T.StructType(
            [
                T.StructField("veggieName", T.StringType(), True),
                T.StructField("veggieLike", T.BooleanType(), True),
            ]
        )
    )
    df = spark.createDataFrame(
        [
            (1, ["apple"], [("potato", True)]),
            (2, ["pear"], [("carrot", None)]),  # missing veggieLike in element
            (3, None, None),  # absent arrays are fine
        ],
        T.StructType(
            [
                T.StructField("rid", T.LongType(), False),
                T.StructField("fruits", T.ArrayType(T.StringType()), True),
                T.StructField("vegetables", veg, True),
            ]
        ),
    )
    assert viol_set(validate(df, schema), "rid") == [(2, "items")]


def test_complex_object_schema(spark):
    schema = fixture("miscellaneous-examples/complex-object.schema.json")
    addr = T.StructType(
        [
            T.StructField("street", T.StringType(), True),
            T.StructField("city", T.StringType(), True),
            T.StructField("state", T.StringType(), True),
            T.StructField("postalCode", T.StringType(), True),
        ]
    )
    df = spark.createDataFrame(
        [
            (1, "Ann", 30, ("1 Main", "Springfield", "IL", "62704"), ["chess"]),
            (2, "Bob", 25, ("2 Oak", None, "IL", "62704"), []),  # missing city
            (3, "Cyd", 40, ("3 Elm", "Metro", "NY", "abcde"), None),  # bad zip
        ],
        T.StructType(
            [
                T.StructField("rid", T.LongType(), False),
                T.StructField("name", T.StringType(), True),
                T.StructField("age", T.IntegerType(), True),
                T.StructField("address", addr, True),
                T.StructField("hobbies", T.ArrayType(T.StringType()), True),
            ]
        ),
    )
    assert viol_set(validate(df, schema), "rid") == [(2, "required"), (3, "pattern")]


def test_dependent_required_schema(spark):
    schema = fixture(
        "miscellaneous-examples/conditional-validation-dependentRequired.schema.json"
    )
    df = spark.createDataFrame(
        [
            Row(rid=1, foo=True, bar="x"),
            Row(rid=2, foo=True, bar=None),   # foo present, bar missing
            Row(rid=3, foo=None, bar=None),   # foo absent -> vacuous
        ],
        "rid long, foo boolean, bar string",
    )
    assert viol_set(validate(df, schema), "rid") == [(2, "dependentRequired")]


def test_dependent_schemas_schema(spark):
    schema = fixture(
        "miscellaneous-examples/conditional-validation-dependentSchemas.schema.json"
    )
    df = spark.createDataFrame(
        [
            Row(rid=1, foo=True, propertiesCount=9),
            Row(rid=2, foo=True, propertiesCount=3),    # minimum 7 in dependent
            Row(rid=3, foo=True, propertiesCount=None), # required in dependent
            Row(rid=4, foo=None, propertiesCount=2),    # foo absent -> vacuous
        ],
        "rid long, foo boolean, propertiesCount int",
    )
    assert viol_set(validate(df, schema), "rid") == [
        (2, "dependentSchemas"),
        (3, "dependentSchemas"),
    ]


def test_if_else_schema(spark):
    schema = fixture(
        "miscellaneous-examples/conditional-validation-if-else.schema.json"
    )
    df = spark.createDataFrame(
        [
            Row(rid=1, isMember=True, membershipNumber="1234567890"),
            Row(rid=2, isMember=True, membershipNumber="12345"),        # then: len 10
            Row(rid=3, isMember=False, membershipNumber="1234567890123456"),
            Row(rid=4, isMember=False, membershipNumber="short"),       # else: len>=15
            Row(rid=5, isMember=None, membershipNumber="x"),            # required
        ],
        "rid long, isMember boolean, membershipNumber string",
    )
    got = viol_set(validate(df, schema), "rid")
    # row 5: isMember absent -> required fails; if-condition is vacuously true
    # on the absent property, so the then-branch (len 10) fires too
    assert got == [(2, "if"), (4, "if"), (5, "if"), (5, "required")]


def test_enumerated_values_schema(spark):
    schema = fixture("miscellaneous-examples/enumerated-values.schema.json")
    # mixed-type enum over a JSON-encoded string column (variant evaluation)
    df = spark.createDataFrame(
        [
            Row(rid=1, data="42"),
            Row(rid=2, data='"hello"'),
            Row(rid=3, data="[1,2,3]"),
            Row(rid=4, data="true"),
            Row(rid=5, data="null"),
            Row(rid=6, data='"bye"'),   # not enumerated
            Row(rid=7, data="7"),       # not enumerated
            Row(rid=8, data=None),      # absent
        ],
        "rid long, data string",
    )
    assert viol_set(validate(df, schema), "rid") == [(6, "enum"), (7, "enum")]


def test_regex_pattern_schema(spark):
    schema = fixture("miscellaneous-examples/regex-pattern.schema.json")
    df = spark.createDataFrame(
        [Row(rid=1, code="ABC-123"), Row(rid=2, code="AB-123"), Row(rid=3, code=None)],
        "rid long, code string",
    )
    assert viol_set(validate(df, schema), "rid") == [(2, "pattern")]


# ---- file-system pair: external $ref via the embedded loader ----

_STORAGE = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        T.StructField("device", T.StringType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("remotePath", T.StringType(), True),
        T.StructField("server", T.StringType(), True),
        T.StructField("sizeInMB", T.IntegerType(), True),
    ]
)
_ENTRY = T.StructType(
    [
        T.StructField("storage", _STORAGE, True),
        T.StructField("fstype", T.StringType(), True),
        T.StructField("options", T.ArrayType(T.StringType()), True),
        T.StructField("readonly", T.BooleanType(), True),
    ]
)


def _entry(storage, fstype=None, options=None, readonly=None):
    return (storage, fstype, options, readonly)


def _disk(device):
    return (("disk", device, None, None, None, None))


def _tmpfs(size):
    return (("tmpfs", None, None, None, None, size))


def test_fstab_schema_external_ref(spark):
    """fstab root: properties "/" + patternProperties over mount-point column
    names (static struct evaluation) + additionalProperties: false; entries
    resolve through the EXTERNAL entry-schema document via the loader chain,
    whose storage field is a oneOf over four closed $defs variants."""
    schema = fixture("file-system/fstab.schema.json")
    cfg = ResolveConfig(loader=new_embedded_loader("/root/reference"))

    rows = [
        # rid 1: all good — disk root, tmpfs /tmp
        (1, _entry(_disk("/dev/sda1"), "ext4", ["rw"], False),
            _entry(_tmpfs(64), None, None, None), None),
        # rid 2: bad device pattern (oneOf: zero variants match) + dup options
        (2, _entry(_disk("sda1"), "ext4", ["rw", "rw"], False), None, None),
        # rid 3: tmpfs size over maximum (oneOf fails), bad fstype (enum),
        #        and a non-mount-point extra column value (additionalProperties)
        (3, _entry(_tmpfs(1024), "xfs", ["rw"], None), None, "oops"),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("rid", T.LongType(), False),
                T.StructField("/", _ENTRY, True),
                T.StructField("/tmp", _ENTRY, True),
                T.StructField("swap_bad", T.StringType(), True),
            ]
        ),
    )
    res = validate(df, schema, resolve_config=cfg)
    all_viols = res.violations(["rid"]).collect()
    # the rid key column itself violates the closed world (correct engine
    # behavior — fstab allows only "/" + mount-point-patterned properties);
    # assert it, then exclude it from the golden set
    rid_viols = [v for v in all_viols if v["column"] == "rid"]
    assert {(v.rid, v.keyword) for v in rid_viols} == {
        (1, "additionalProperties"),
        (2, "additionalProperties"),
        (3, "additionalProperties"),
    }
    got = sorted((v.rid, v.keyword) for v in all_viols if v["column"] != "rid")
    assert got == [
        (2, "oneOf"),
        (2, "uniqueItems"),
        (3, "additionalProperties"),
        (3, "enum"),
        (3, "oneOf"),
    ]
    # keyword paths carry the escaped mount-point pointer segments
    paths = {r.keyword_path for r in res.violations(["rid"]).collect()}
    assert any("~1" in p for p in paths)
