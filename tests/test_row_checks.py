"""CompileOptions.row_checks: named cross-field predicates flow through the
full violation algebra (violations / totals / triage) exactly like schema
keywords; NULL predicate results fail loudly."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from jsonschema_spark.functions.audio import speech_rate_ok
from jsonschema_spark.operators.validate import validate
from jsonschema_spark.plans.compile import CompileOptions

SCHEMA = {
    "type": "object",
    "properties": {
        "a": {"type": "integer", "minimum": 0},
        "b": {"type": "integer"},
    },
}


def test_row_check_flows_through_violations(spark):
    df = spark.createDataFrame(
        [Row(id=1, a=2, b=1), Row(id=2, a=1, b=5), Row(id=3, a=-1, b=0)]
    )
    opts = CompileOptions(row_checks={"a_ge_b": F.col("a") >= F.col("b")})
    viol = validate(df, SCHEMA, opts).violations(["id"])
    rows = {(r["id"], r["keyword"], r["keyword_path"]) for r in viol.collect()}
    # row 2 fails only the cross-field check; row 3 fails BOTH the schema
    # keyword (minimum) and the cross-field check; row 1 is clean
    assert (2, "rowCheck", "/rowChecks/a_ge_b") in rows
    assert (3, "minimum", "/properties/a/minimum") in rows
    assert (3, "rowCheck", "/rowChecks/a_ge_b") in rows
    assert not any(i == 1 for i, _, _ in rows)


def test_row_check_null_fails_loudly(spark):
    df = spark.createDataFrame(
        [(1, None, 2)], "id: bigint, a: bigint, b: bigint"
    )
    opts = CompileOptions(row_checks={"a_ge_b": F.col("a") >= F.col("b")})
    viol = validate(df, SCHEMA, opts).violations(["id"])
    assert {r["keyword"] for r in viol.collect()} == {"rowCheck"}


def test_row_check_in_totals_and_triage(spark):
    df = spark.createDataFrame([Row(id=i, a=i, b=3) for i in range(6)])
    opts = CompileOptions(row_checks={"a_ge_b": F.col("a") >= F.col("b")})
    res = validate(df, SCHEMA, opts)
    t = res.totals().collect()[0]
    assert t["rows"] == 6 and t["failed"] == 3  # a in {0,1,2}


def test_speech_rate_ok_bounds(spark):
    rows = [
        Row(id=1, transcript="x" * 40, dur_ms=1000),   # 40 cps -> ok
        Row(id=2, transcript="x" * 300, dur_ms=1000),  # 300 cps -> too fast
        Row(id=3, transcript="x" * 2, dur_ms=5000),    # 0.4 cps -> too slow
        Row(id=4, transcript=None, dur_ms=1000),       # vacuous pass
        Row(id=5, transcript="x", dur_ms=0),           # vacuous pass
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["id"]: r["ok"]
        for r in df.select("id", speech_rate_ok().alias("ok")).collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: True, 5: True}


def test_repair_impact_report(spark):
    from jsonschema_spark.operators.repair import repair_impact_report

    schema = {
        "type": "object",
        "required": ["k", "name"],
        "properties": {
            "k": {"type": "integer", "minimum": 0},
            "name": {"type": "string", "default": "anon"},
            "v": {"type": "number", "default": -1.0, "minimum": -2.0},
        },
    }
    df = spark.createDataFrame(
        [(1, None, 2.0), (2, "x", None), (-3, None, None), (4, "y", 1.0)],
        "k long, name string, v double",
    )
    rows = {
        (r["keyword"], r["column"]): (r["violations_before"],
                                      r["violations_after"], r["fixed"])
        for r in repair_impact_report(df, schema).collect()
    }
    # 'required name' violations (2 rows) fixed by the default fill
    req = [v for (kw, c), v in rows.items() if kw == "required" and c == "name"]
    assert req == [(2, 0, 2)]
    # the k minimum violation is NOT repairable -> unchanged
    mins = [v for (kw, c), v in rows.items() if kw == "minimum" and c == "k"]
    assert mins == [(1, 1, 0)]
