"""Pre-flight join-cardinality estimation (operators/joincard).

Pins: the report against the ACTUAL inner-join row count on random
frames (the estimate is exact, not approximate), NULL-key accounting,
empty/no-overlap edges, hot-key top-k content + deterministic tie-break,
and the scale plan shapes (TakeOrderedAndProject for top-k; no row-level
join of the inputs anywhere).
"""

import random

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.joincard import (
    join_cardinality_report,
    join_hot_keys,
    join_pair_profile,
)


def _mk(spark, keys, name="k"):
    return spark.createDataFrame([(k,) for k in keys], f"{name} string")


def test_report_matches_actual_inner_join(spark):
    rng = random.Random(11)
    lk = [f"k{rng.randrange(20)}" for _ in range(300)] + [None] * 7
    rk = [f"k{rng.randrange(30)}" for _ in range(200)] + [None] * 3
    left, right = _mk(spark, lk, "a"), _mk(spark, rk, "b")
    rep = join_cardinality_report(left, right, "a", "b").collect()[0]
    actual = left.join(right, F.col("a") == F.col("b")).count()
    assert rep["est_inner_rows"] == actual
    assert rep["left_rows"] == 300 and rep["left_null_keys"] == 7
    assert rep["right_rows"] == 200 and rep["right_null_keys"] == 3
    assert rep["left_keys"] == len(set(k for k in lk if k is not None))
    assert rep["matching_keys"] == len(
        set(k for k in lk if k) & set(k for k in rk if k)
    )
    assert rep["explosion_ratio"] == pytest.approx(actual / 300.0)


def test_no_overlap_and_empty(spark):
    left = _mk(spark, ["a", "a", "b"], "x")
    right = _mk(spark, ["c", "d"], "y")
    rep = join_cardinality_report(left, right, "x", "y").collect()[0]
    assert rep["est_inner_rows"] == 0 and rep["matching_keys"] == 0
    assert rep["max_fanout"] == 0 and not rep["explosive"]
    empty = _mk(spark, [], "y").filter("y is not null")
    rep2 = join_cardinality_report(left, empty, "x", "y").collect()[0]
    assert rep2["right_rows"] == 0 and rep2["est_inner_rows"] == 0


def test_explosive_flag(spark):
    left = _mk(spark, ["hot"] * 50 + ["c1"], "x")
    right = _mk(spark, ["hot"] * 50 + ["c2"], "y")
    rep = join_cardinality_report(left, right, "x", "y").collect()[0]
    assert rep["est_inner_rows"] == 2500
    assert rep["max_fanout"] == 2500
    assert rep["explosive"]


def test_hot_keys_content_and_tiebreak(spark):
    left = _mk(spark, ["a"] * 4 + ["b"] * 2 + ["c"] * 2 + ["d"], "x")
    right = _mk(spark, ["a"] * 3 + ["b"] * 6 + ["c"] * 6 + ["d"], "y")
    top = join_hot_keys(left, right, "x", "y", k=3).collect()
    # contributions: a=12, b=12, c=12, d=1 -> top3 by (est desc, key asc)
    assert [(r["key"], r["est_rows"], r["rank"]) for r in top] == [
        ("a", 12, 1),
        ("b", 12, 2),
        ("c", 12, 3),
    ]


def test_pair_profile_values(spark):
    left = _mk(spark, ["a", "a", "b", None], "x")
    right = _mk(spark, ["a", "b", "b"], "y")
    rows = {
        r["k"]: (r["left_cnt"], r["right_cnt"], r["est_rows"])
        for r in join_pair_profile(left, right, "x", "y").collect()
    }
    assert rows == {"a": (2, 1, 2), "b": (1, 2, 2)}


def test_plan_shapes(spark):
    left = _mk(spark, ["a", "b"], "x")
    right = _mk(spark, ["a", "c"], "y")
    top_plan = (
        join_hot_keys(left, right, "x", "y", k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in top_plan
    rep_plan = (
        join_cardinality_report(left, right, "x", "y")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # the report never joins the input ROWS — only the two aggregated
    # profiles meet, below a single-row aggregate
    assert rep_plan.count("Join") == 1


def test_key_overlap_sketch_accuracy(spark):
    from jsonschema_spark.operators.joincard import key_overlap_sketch

    # |A|=3000, |B|=2500, overlap=[1000,3000)=2000, union=3500
    left = spark.range(0, 3000).select(F.col("id").alias("a"))
    right = spark.range(1000, 3500).select(F.col("id").alias("b"))
    r = key_overlap_sketch(left, right, "a", "b").collect()[0]
    assert abs(r["left_distinct_est"] - 3000) <= 0.05 * 3000
    assert abs(r["right_distinct_est"] - 2500) <= 0.05 * 2500
    assert abs(r["union_est"] - 3500) <= 0.05 * 3500
    assert abs(r["overlap_est"] - 2000) <= 0.10 * 3500  # union-scaled error
    assert 0.0 <= r["jaccard_est"] <= 1.0


def test_key_overlap_sketch_disjoint_nonnegative(spark):
    from jsonschema_spark.operators.joincard import key_overlap_sketch

    left = spark.range(0, 500).select(F.col("id").alias("a"))
    right = spark.range(10_000, 10_500).select(F.col("id").alias("b"))
    r = key_overlap_sketch(left, right, "a", "b").collect()[0]
    assert r["overlap_est"] >= 0  # clamped: inclusion-exclusion can go negative
    assert r["overlap_est"] <= 0.10 * 1000
