"""snapshot_diff / snapshot_diff_summary / column_change_counts."""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.diff import (
    column_change_counts,
    snapshot_diff,
    snapshot_diff_summary,
)


@pytest.fixture()
def snapshots(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),   # unchanged
            (2, "b", 20.0),   # v changes
            (3, None, 30.0),  # s NULL -> value (changed)
            (4, "d", None),   # v NULL -> NULL (unchanged), s changes
            (5, "e", 50.0),   # removed
            (None, "x", 0.0), # NULL key: dropped
        ],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 21.0),
            (3, "c", 30.0),
            (4, "D", None),
            (6, "f", 60.0),   # added
            (None, "y", 0.0),
        ],
        "k int, s string, v double",
    )
    return old, new


def test_diff_classifies(spark, snapshots):
    old, new = snapshots
    rows = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}
    assert set(rows) == {2, 3, 4, 5, 6}
    assert rows[2]["change"] == "changed" and rows[2]["changed_cols"] == "v"
    assert rows[3]["change"] == "changed" and rows[3]["changed_cols"] == "s"
    assert rows[4]["change"] == "changed" and rows[4]["changed_cols"] == "s"
    assert rows[5]["change"] == "removed" and rows[5]["changed_cols"] == ""
    assert rows[6]["change"] == "added" and rows[6]["n_changed"] == 0
    # unchanged rows excluded by default, included on demand
    with_unchanged = snapshot_diff(old, new, "k", include_unchanged=True)
    assert with_unchanged.where("change = 'unchanged'").count() == 1


def test_diff_multi_column_order(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], "k int, s string, v double")
    new = spark.createDataFrame([(1, "b", 2.0)], "k int, s string, v double")
    r = snapshot_diff(old, new, "k").collect()[0]
    # compare_cols order (old side's column order) fixes the join order
    assert r["changed_cols"] == "s,v" and r["n_changed"] == 2
    r2 = snapshot_diff(old, new, "k", compare_cols=["v", "s"]).collect()[0]
    assert r2["changed_cols"] == "v,s"


def test_diff_composite_key(spark):
    old = spark.createDataFrame([(1, "x", 5), (1, "y", 6)], "a int, b string, v int")
    new = spark.createDataFrame([(1, "x", 7), (2, "y", 6)], "a int, b string, v int")
    rows = {(r["a"], r["b"]): r["change"] for r in snapshot_diff(old, new, ["a", "b"]).collect()}
    assert rows == {(1, "x"): "changed", (1, "y"): "removed", (2, "y"): "added"}


def test_diff_summary_and_column_counts(spark, snapshots):
    old, new = snapshots
    summary = {r["change"]: r["n"] for r in snapshot_diff_summary(old, new, "k").collect()}
    assert summary == {"added": 1, "removed": 1, "changed": 3, "unchanged": 1}
    counts = {r["column"]: r["n_changed"] for r in column_change_counts(old, new, "k").collect()}
    assert counts == {"s": 2, "v": 1}


def test_diff_missing_compare_col_raises(spark, snapshots):
    old, new = snapshots
    with pytest.raises(ValueError):
        snapshot_diff(old, new.drop("v"), "k", compare_cols=["v"])


def test_diff_plan_is_single_join_no_python(spark, snapshots):
    old, new = snapshots
    plan = snapshot_diff(old, new, "k")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Join") >= 1
