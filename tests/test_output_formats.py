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


def test_schema_location_chain():
    from jsonschema_spark.operators.validate import _schema_location_chain as c

    assert c("/required") == [""]
    assert c("/properties/sr_hz/enum") == ["", "/properties/sr_hz"]
    assert c("/allOf/0/if") == ["", "/allOf/0"]
    assert c("/oneOf") == [""]
    assert c("/allOf/0/properties/x/minimum") == [
        "", "/allOf/0", "/allOf/0/properties/x"
    ]
    assert c("/properties/x/minContains") == ["", "/properties/x"]
    assert c("/not/pattern") == ["", "/not"]
    # a property literally named like an applicator keyword
    assert c("/properties/items/minimum") == ["", "/properties/items"]


def test_detailed_output_units_flat(spark):
    rows = _res(spark).detailed_output_units(["k"]).collect()
    by = {(r["k"], r["keywordLocation"]): r for r in rows}
    # instance 2 fails two property units + the root aggregates both
    assert set(by) == {
        (2, ""),
        (2, "/properties/s"),
        (2, "/properties/v"),
    }
    root = by[(2, "")]
    assert root["parentLocation"] is None
    assert root["n_errors_direct"] == 0 and root["n_errors_total"] == 2
    s = by[(2, "/properties/s")]
    assert s["parentLocation"] == ""
    assert s["n_errors_direct"] == 1 and s["n_errors_total"] == 1
    assert s["absoluteKeywordLocation"] == (
        "https://example.com/out.json#/properties/s"
    )
    assert all(r["valid"] is False for r in rows)


NESTED_SCHEMA = {
    "$id": "https://example.com/nested.json",
    "type": "object",
    "allOf": [
        {"properties": {"v": {"minimum": 0}}},
        {"properties": {"s": {"minLength": 3}}},
    ],
    "required": ["k"],
}


def test_detailed_output_units_nested(spark):
    df = spark.createDataFrame(
        [(1, "x", -2.0)], "k int, s string, v double"
    )
    rows = validate(df, NESTED_SCHEMA).detailed_output_units(["k"]).collect()
    by = {r["keywordLocation"]: r for r in rows}
    # both allOf branches fail -> each branch unit + its property unit +
    # the root, with parent chains intact
    assert set(by) == {
        "",
        "/allOf/0",
        "/allOf/0/properties/v",
        "/allOf/1",
        "/allOf/1/properties/s",
    }
    assert by[""]["n_errors_total"] == 2 and by[""]["n_errors_direct"] == 0
    assert by["/allOf/0"]["parentLocation"] == ""
    assert by["/allOf/0"]["n_errors_total"] == 1
    assert by["/allOf/0"]["n_errors_direct"] == 0
    assert by["/allOf/0/properties/v"]["parentLocation"] == "/allOf/0"
    assert by["/allOf/0/properties/v"]["n_errors_direct"] == 1


def test_verbose_output_units_flat(spark):
    res = _res(spark)
    rows = res.verbose_output_units(["k"]).collect()
    units = {r["keywordLocation"] for r in rows}
    n_inst = 3
    # full hierarchy: every (instance, unit) pair, passing units included
    assert len(rows) == n_inst * len(units)
    by = {(r["k"], r["keywordLocation"]): r for r in rows}
    # instance 1 passes everywhere
    for u in units:
        r = by[(1, u)]
        assert r["valid"] is True
        assert r["n_errors_direct"] == 0 and r["n_errors_total"] == 0
    # instance 2: same error units/counts as detailed, plus valid flags
    det = {
        (r["k"], r["keywordLocation"]): r
        for r in res.detailed_output_units(["k"]).collect()
    }
    for (k, u), d in det.items():
        v = by[(k, u)]
        assert v["valid"] is False
        assert v["n_errors_direct"] == d["n_errors_direct"]
        assert v["n_errors_total"] == d["n_errors_total"]
        assert v["parentLocation"] == d["parentLocation"]
        assert v["absoluteKeywordLocation"] == d["absoluteKeywordLocation"]
    root = by[(2, "")]
    assert root["parentLocation"] is None and root["n_errors_total"] == 2


def test_verbose_output_units_nested(spark):
    df = spark.createDataFrame(
        [(1, "x", -2.0), (2, "abc", 1.0)], "k int, s string, v double"
    )
    rows = validate(df, NESTED_SCHEMA).verbose_output_units(["k"]).collect()
    by = {(r["k"], r["keywordLocation"]): r for r in rows}
    units = {u for (_, u) in by}
    assert units == {
        "",
        "/allOf/0",
        "/allOf/0/properties/v",
        "/allOf/1",
        "/allOf/1/properties/s",
    }
    assert len(rows) == 2 * len(units)
    assert by[(2, "")]["valid"] is True
    assert by[(1, "")]["valid"] is False
    assert by[(1, "/allOf/0/properties/v")]["n_errors_direct"] == 1
    assert by[(1, "/allOf/0")]["parentLocation"] == ""
    assert by[(2, "/allOf/1/properties/s")]["n_errors_total"] == 0
