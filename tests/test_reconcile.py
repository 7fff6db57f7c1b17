"""Cross-table reconciliation + completeness (operators/reconcile.py)."""

import datetime

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.reconcile import (
    categorical_completeness,
    date_completeness,
    reconcile,
    reconcile_summary,
)


@pytest.fixture(scope="module")
def tables(spark):
    header = spark.createDataFrame(
        [
            (1, 100.0),   # matches detail exactly
            (2, 100.0),   # detail sums to 103 -> 3% off
            (3, 50.0),    # no detail rows
            (4, None),    # null header value: not flaggable (no rel_diff)
            (None, 10.0),  # null key: excluded
        ],
        "k long, total double",
    )
    detail = spark.createDataFrame(
        [(1, 60.0), (1, 40.0), (2, 103.0), (4, 5.0), (None, 1.0)],
        "fk long, amt double",
    )
    return header, detail


def test_reconcile_flags_planted_rows(tables):
    header, detail = tables
    rows = {
        r["k"]: r
        for r in reconcile(
            header, detail, "k", "fk", "total", F.col("amt"), rel_tol=0.01
        ).collect()
    }
    # 2: 3% off; 3: no detail rows; 4: NULL header value with detail present
    # (un-reconcilable -> flagged, not silently dropped)
    assert set(rows) == {2, 3, 4}
    assert float(rows[2]["detail_total"]) == 103.0
    assert rows[2]["rel_diff"] == 0.03
    assert rows[3]["detail_total"] is None and rows[3]["detail_rows"] == 0
    assert rows[4]["rel_diff"] is None


def test_reconcile_zero_header_is_flagged(spark):
    """The non-ANSI-divide blind spot: abs(h-d)/abs(0) is NULL — a
    100%-wrong zero total must still be flagged (denominator floor)."""
    header = spark.createDataFrame([(1, 0.0), (2, 0.0)], "k long, total double")
    detail = spark.createDataFrame([(1, 100.0), (2, 0.0)], "fk long, amt double")
    out = {r["k"] for r in
           reconcile(header, detail, "k", "fk", "total", F.col("amt"), 0.01).collect()}
    assert out == {1}  # zero-vs-zero reconciles, zero-vs-100 flags


def test_reconcile_exact_at_tolerance_boundary(spark):
    # rel_diff == rel_tol must NOT flag (strictly greater-than)
    header = spark.createDataFrame([(1, 100.0)], "k long, total double")
    detail = spark.createDataFrame([(1, 101.0)], "fk long, amt double")
    assert reconcile(header, detail, "k", "fk", "total", F.col("amt"), 0.01).count() == 0
    assert reconcile(header, detail, "k", "fk", "total", F.col("amt"), 0.009).count() == 1


def test_reconcile_decimal_sum_is_exact(spark):
    # 0.1 added 10x in double would drift; decimal sum is exactly 1.0
    header = spark.createDataFrame([(1, 1.0)], "k long, total double")
    detail = spark.createDataFrame([(1, 0.1)] * 10, "fk long, amt double")
    out = reconcile(header, detail, "k", "fk", "total", F.col("amt"), 0.0000001)
    assert out.count() == 0


def test_reconcile_summary(tables):
    header, detail = tables
    row = reconcile_summary(
        header, detail, "k", "fk", "total", F.col("amt"), 0.01
    ).collect()[0]
    assert row["header_rows"] == 4  # null key excluded
    assert row["mismatched"] == 3   # 3% off + no detail + NULL header value
    assert row["missing_detail"] == 1
    assert row["max_rel_diff"] == 0.03


def test_date_completeness_finds_gap(spark):
    d = datetime.datetime
    df = spark.createDataFrame(
        [(d(2024, 1, 1, 5),), (d(2024, 1, 2, 6),), (d(2024, 1, 5, 7),), (None,)],
        "ts timestamp",
    )
    missing = [r["missing_day"].isoformat() for r in date_completeness(df, "ts").collect()]
    assert missing == ["2024-01-03", "2024-01-04"]


def test_date_completeness_complete_range(spark):
    d = datetime.datetime
    df = spark.createDataFrame([(d(2024, 1, 1),), (d(2024, 1, 2),)], "ts timestamp")
    assert date_completeness(df, "ts").count() == 0


def test_categorical_completeness(spark):
    df = spark.createDataFrame([("opus",), ("flac",), (None,)], "codec string")
    missing = [
        r["missing_value"]
        for r in categorical_completeness(df, "codec", ["flac", "mp3", "opus", "wav"]).collect()
    ]
    assert missing == ["mp3", "wav"]
