"""Metrics history + run-over-run regression detection (operators/history.py)."""

import pytest

from jsonschema_spark.operators.history import append_run, metric_regressions


def _hist(spark, rows):
    return spark.createDataFrame(rows, "run_id string, check string, metric double")


def _cur(spark, rows):
    return spark.createDataFrame(rows, "check string, metric double")


def test_regression_flagged(spark):
    hist = _hist(spark, [(f"r{i}", "rows", 100.0 + i) for i in range(5)])
    cur = _cur(spark, [("rows", 200.0)])
    row = metric_regressions(hist, cur).collect()[0]
    assert row["n_runs"] == 5
    assert row["baseline_median"] == 102.0
    assert row["baseline_mad"] == 1.0
    assert row["regressed"] is True
    assert row["modified_z"] > 3.5


def test_stable_metric_passes(spark):
    hist = _hist(spark, [(f"r{i}", "rate", 0.01 * (1 + 0.1 * (i % 3))) for i in range(6)])
    cur = _cur(spark, [("rate", 0.011)])
    row = metric_regressions(hist, cur).collect()[0]
    assert row["regressed"] is False


def test_min_runs_never_flags(spark):
    hist = _hist(spark, [("r0", "rows", 100.0), ("r1", "rows", 101.0)])
    cur = _cur(spark, [("rows", 5000.0)])
    row = metric_regressions(hist, cur, min_runs=3).collect()[0]
    assert row["regressed"] is False and row["modified_z"] is None
    assert row["n_runs"] == 2  # the report says why it didn't flag


def test_constant_baseline_mad_zero(spark):
    hist = _hist(spark, [(f"r{i}", "nulls", 0.0) for i in range(5)])
    same = metric_regressions(hist, _cur(spark, [("nulls", 0.0)])).collect()[0]
    moved = metric_regressions(hist, _cur(spark, [("nulls", 1.0)])).collect()[0]
    assert same["regressed"] is False and same["modified_z"] is None
    assert moved["regressed"] is True and moved["modified_z"] is None


def test_null_metric_with_history_flags(spark):
    hist = _hist(spark, [(f"r{i}", "rows", 100.0) for i in range(5)])
    row = metric_regressions(hist, _cur(spark, [("rows", None)])).collect()[0]
    assert row["regressed"] is True


def test_unknown_check_never_flags(spark):
    hist = _hist(spark, [(f"r{i}", "rows", 100.0) for i in range(5)])
    row = metric_regressions(hist, _cur(spark, [("brand_new", 7.0)])).collect()[0]
    assert row["regressed"] is False and row["n_runs"] == 0


def test_append_run_roundtrip(spark, tmp_path):
    path = str(tmp_path / "hist")
    rep = spark.createDataFrame(
        [("rows", 100.0), ("rate", 0.5)], "check string, metric double"
    )
    append_run(rep, "2024-01-01", path)
    append_run(rep, "2024-01-02", path)
    hist = spark.read.parquet(path)
    assert hist.count() == 4
    assert set(hist.columns) == {"run_id", "check", "metric"}
    # the accumulated history feeds straight back into regression judging
    out = metric_regressions(hist, rep, min_runs=2).collect()
    assert all(r["regressed"] is False for r in out)
