"""2020-12 standard output formats (spec §12): flag / basic renderings."""

from pyspark.sql import functions as F

from jsonschema_spark.operators.validate import validate

SCHEMA = {
    "$id": "https://example.com/out.json",
    "type": "object",
    "required": ["k"],
    "properties": {
        "s": {"type": "string", "minLength": 3},
        "v": {"minimum": 0},
    },
}


def _res(spark):
    df = spark.createDataFrame(
        [(1, "abc", 5.0), (2, "x", -1.0), (3, None, 0.0)],
        "k int, s string, v double",
    )
    return validate(df, SCHEMA)


def test_flag_output(spark):
    rows = {r["k"]: r["valid"] for r in _res(spark).flag_output(["k"]).collect()}
    assert rows == {1: True, 2: False, 3: True}


def test_basic_output_units_fields(spark):
    units = _res(spark).basic_output_units(["k"]).collect()
    by_loc = {(u["k"], u["keywordLocation"]): u for u in units}
    assert set(by_loc) == {
        (2, "/properties/s/minLength"),
        (2, "/properties/v/minimum"),
    }
    u = by_loc[(2, "/properties/s/minLength")]
    assert u["absoluteKeywordLocation"] == (
        "https://example.com/out.json#/properties/s/minLength"
    )
    assert u["instanceLocation"] == "/s"
    assert "length" in u["error"]


def test_basic_output_documents(spark):
    docs = {r["k"]: r for r in _res(spark).basic_output(["k"]).collect()}
    assert docs[1]["valid"] is True and docs[1]["errors"] == []
    errs = docs[2]["errors"]
    assert docs[2]["valid"] is False and len(errs) == 2
    assert {e["keywordLocation"] for e in errs} == {
        "/properties/s/minLength",
        "/properties/v/minimum",
    }
    assert all(e["instanceLocation"] in ("/s", "/v") for e in errs)


def test_instance_location_nested_and_escaped(spark):
    # dotted (nested-struct) columns render as multi-segment pointers
    df = spark.createDataFrame(
        [(1, ("x",))], "k int, obj struct<name:string>"
    )
    schema = {
        "type": "object",
        "properties": {
            "obj": {
                "type": "object",
                "properties": {"name": {"minLength": 5}},
            }
        },
    }
    units = validate(df, schema).basic_output_units(["k"]).collect()
    assert len(units) == 1
    assert units[0]["instanceLocation"] == "/obj/name"
    # no root $id -> absoluteKeywordLocation is NULL per spec optionality
    assert units[0]["absoluteKeywordLocation"] is None


def test_output_plan_no_python_no_shuffle(spark):
    res = _res(spark)
    for df in (
        res.flag_output(["k"]),
        res.basic_output_units(["k"]),
        res.basic_output(["k"]),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "Exchange" not in plan
