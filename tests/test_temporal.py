"""Temporal operators (operators/temporal.py + streaming/sessions.py):
gap sessionization and backward as-of join.

Pins, in order of importance:
- the session boundary rule (delta == gap splits; delta < gap merges) —
  the batch operator, the islands replication AND the DuckDB oracle all
  depend on agreeing with ``F.session_window``'s merge semantics;
- value-parity of the session_window implementation against an
  independent gaps-and-islands formulation on real data;
- as-of equal-instant inclusivity, tolerance nulling, tie dedup, and
  value-parity against the naive quadratic join+row_number formulation;
- streaming/batch session parity (same content set for closed sessions).
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from jsonschema_spark.operators.temporal import (
    asof_join,
    session_report,
    sessionize,
)
from jsonschema_spark.streaming.sessions import sessionize_stream
from tests.conftest import SF_DIR


def _ts_df(spark, rows, schema="user_id long, event_id long, ts string"):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


def test_sessionize_basic(spark):
    df = _ts_df(
        spark,
        [
            (1, 10, "2026-01-01 00:00:00"),
            (1, 11, "2026-01-01 00:00:10"),
            (1, 12, "2026-01-01 00:10:00"),  # 9m50s idle -> new session
            (2, 20, "2026-01-01 05:00:00"),
        ],
    )
    out = sessionize(df, "user_id", "ts", gap_s=60.0, id_col="event_id")
    rows = {(r["user_id"], r["session_idx"]): r for r in out.collect()}
    assert set(rows) == {(1, 1), (1, 2), (2, 1)}
    s11 = rows[(1, 1)]
    assert s11["n_events"] == 2
    assert s11["min_event_id"] == 10 and s11["max_event_id"] == 11
    assert s11["duration_us"] == 10_000_000
    assert s11["idle_before_us"] is None
    s12 = rows[(1, 2)]
    assert s12["n_events"] == 1 and s12["duration_us"] == 0
    assert s12["idle_before_us"] == 590_000_000  # 00:00:10 -> 00:10:00
    assert rows[(2, 1)]["idle_before_us"] is None


def test_sessionize_boundary_semantics(spark):
    # delta == gap -> MERGE (session [t, t+gap) merges with a next event
    # whose start equals the end); delta == gap + 1us -> SPLIT. This is
    # F.session_window's rule and everything else (islands replication,
    # DuckDB oracle, streaming parity) assumes it.
    df = _ts_df(
        spark,
        [
            (1, 1, "2026-01-01 00:00:00"),
            (1, 2, "2026-01-01 00:01:00.000001"),  # 60s + 1us later
            (2, 3, "2026-01-01 00:00:00"),
            (2, 4, "2026-01-01 00:01:00"),  # exactly 60s later
        ],
    )
    out = sessionize(df, "user_id", "ts", gap_s=60.0, id_col="event_id")
    per_key = {
        r["user_id"]: r["n"]
        for r in out.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_key == {1: 2, 2: 1}


def test_sessionize_null_rows_excluded(spark):
    df = _ts_df(
        spark,
        [
            (1, 1, "2026-01-01 00:00:00"),
            (None, 2, "2026-01-01 00:00:01"),
            (1, 3, None),
        ],
    )
    out = sessionize(df, "user_id", "ts", gap_s=60.0, id_col="event_id")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n_events"] == 1


def test_sessionize_value_cents(spark):
    df = spark.createDataFrame(
        [(1, 1, "2026-01-01 00:00:00", 185.22), (1, 2, "2026-01-01 00:00:01", 9.64)],
        "user_id long, event_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sessionize(
        df, "user_id", "ts", gap_s=60.0, id_col="event_id", value_col="value"
    )
    assert out.collect()[0]["sum_value_c"] == 18522 + 964


def _islands_sessionize(df, key, ts_col, gap_s, id_col):
    """Independent gaps-and-islands formulation (the oracle's shape)."""
    gap_us = int(round(gap_s * 1_000_000))
    base = df.where(F.col(key).isNotNull() & F.col(ts_col).isNotNull()).select(
        F.col(key).alias("k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t_us"),
        F.col(id_col).cast("bigint").alias("i"),
    )
    w = Window.partitionBy("k").orderBy(
        F.col("t_us").asc_nulls_first(), F.col("i").asc_nulls_first()
    )
    marked = base.withColumn(
        "new_s",
        F.when(
            F.lag("t_us").over(w).isNull()
            | (F.col("t_us") - F.lag("t_us").over(w) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "sid",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    g = marked.groupBy("k", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("i").alias("min_event_id"),
        F.max("i").alias("max_event_id"),
        (F.max("t_us") - F.min("t_us")).alias("duration_us"),
        F.min("t_us").alias("s_min"),
        F.max("t_us").alias("s_max"),
    )
    wo = Window.partitionBy("k").orderBy("sid")
    return g.select(
        F.col("k").alias(key),
        F.col("sid").alias("session_idx"),
        "n_events",
        "min_event_id",
        "max_event_id",
        "duration_us",
        (F.col("s_min") - F.lag("s_max").over(wo)).alias("idle_before_us"),
    )


def test_sessionize_matches_islands_on_events(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = sessionize(ev, "user_id", "ts", gap_s=28800.0, id_col="event_id")
    want = _islands_sessionize(ev, "user_id", "ts", 28800.0, "event_id")
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    assert (
        got.select(*cols).exceptAll(want.select(*cols)).count() == 0
        and want.select(*cols).exceptAll(got.select(*cols)).count() == 0
    )
    assert got.count() > ev.select("user_id").distinct().count()


def test_session_report(spark):
    df = _ts_df(
        spark,
        [
            (1, 1, "2026-01-01 00:00:00"),
            (1, 2, "2026-01-01 00:00:10"),
            (1, 3, "2026-01-01 01:00:00"),
            (2, 4, "2026-01-01 00:00:00"),
        ],
    )
    r = session_report(df, "user_id", "ts", gap_s=60.0, id_col="event_id").collect()[0]
    assert r["n_keys"] == 2 and r["n_sessions"] == 3 and r["n_events"] == 4
    assert r["singleton_sessions"] == 2
    assert r["max_session_events"] == 2
    assert r["max_duration_us"] == 10_000_000
    assert r["max_idle_us"] == 3590 * 1_000_000


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


def _clicks_purchases(spark):
    clicks = _ts_df(
        spark,
        [
            (1, 100, "2026-01-01 00:00:00"),
            (1, 101, "2026-01-01 00:05:00"),
            (2, 102, "2026-01-01 00:01:00"),
        ],
    )
    purchases = _ts_df(
        spark,
        [
            (1, 200, "2026-01-01 00:03:00"),  # -> click 100
            (1, 201, "2026-01-01 00:05:00"),  # equal instant -> click 101
            (2, 202, "2026-01-01 00:00:30"),  # before any click -> unmatched
            (3, 203, "2026-01-01 00:00:00"),  # no clicks for key -> unmatched
        ],
    )
    return clicks, purchases


def test_asof_basic(spark):
    clicks, purchases = _clicks_purchases(spark)
    out = asof_join(purchases, clicks, "user_id", "ts", right_cols=["event_id"])
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[200]["matched_event_id"] == 100
    assert rows[200]["matched_latency_us"] == 180_000_000
    assert rows[201]["matched_event_id"] == 101  # equal instant inclusive
    assert rows[201]["matched_latency_us"] == 0
    assert rows[202]["matched_event_id"] is None
    assert rows[202]["matched_latency_us"] is None
    assert rows[203]["matched_event_id"] is None
    assert out.count() == purchases.count()  # left join keeps everything


def test_asof_tolerance(spark):
    clicks, purchases = _clicks_purchases(spark)
    out = asof_join(
        purchases, clicks, "user_id", "ts",
        right_cols=["event_id"], tolerance_s=60.0,
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[200]["matched_event_id"] is None  # 180s > 60s tolerance
    assert rows[201]["matched_event_id"] == 101  # 0s within tolerance


def test_asof_dedup_tie(spark):
    # two right rows at the same (key, instant): keep the max tie id
    clicks = _ts_df(
        spark,
        [
            (1, 100, "2026-01-01 00:00:00"),
            (1, 105, "2026-01-01 00:00:00"),
        ],
    )
    purchases = _ts_df(spark, [(1, 200, "2026-01-01 00:01:00")])
    out = asof_join(
        purchases, clicks, "user_id", "ts",
        right_cols=["event_id"], dedup_tie_col="event_id",
    )
    assert out.collect()[0]["matched_event_id"] == 105


def _naive_asof(left, right, key, ts_col, right_cols, tie_col):
    """Quadratic-per-key reference: candidate join + row_number."""
    l = left.select(
        *left.columns,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_lt"),
    )
    r = right.where(F.col(key).isNotNull() & F.col(ts_col).isNotNull()).select(
        F.col(key).alias("_rk"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_rt"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(tie_col).alias("_tie"),
    )
    cand = l.join(r, (l[key] == r["_rk"]) & (r["_rt"] <= l["_lt"]), "left")
    w = Window.partitionBy(*[l[c] for c in left.columns]).orderBy(
        F.col("_rt").desc_nulls_last(), F.col("_tie").desc_nulls_last()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            *left.columns,
            *[F.col(f"_r_{c}").alias(f"matched_{c}") for c in right_cols],
            (F.col("_lt") - F.col("_rt")).alias("matched_latency_us"),
        )
    )


def test_asof_matches_naive_on_events(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    got = asof_join(
        purchases, clicks, "user_id", "ts",
        right_cols=["event_id"], dedup_tie_col="event_id",
    )
    want = _naive_asof(purchases, clicks, "user_id", "ts", ["event_id"], "event_id")
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    assert (
        got.select(*cols).exceptAll(want.select(*cols)).count() == 0
        and want.select(*cols).exceptAll(got.select(*cols)).count() == 0
    )
    assert got.where(F.col("matched_event_id").isNotNull()).count() > 0


def test_asof_single_exchange_plan(spark):
    # the whole point: ONE shuffle (on the key), no join in the plan
    clicks, purchases = _clicks_purchases(spark)
    out = asof_join(purchases, clicks, "user_id", "ts", right_cols=["event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# streaming sessionize
# ---------------------------------------------------------------------------


def test_sessionize_stream_batch_parity(spark, tmp_path):
    rows = [
        (1, 10, "2026-01-01 00:00:00"),
        (1, 11, "2026-01-01 00:00:30"),
        (1, 12, "2026-01-01 00:10:00"),
        (2, 20, "2026-01-01 00:00:05"),
        (2, 21, "2026-01-01 00:00:45"),
    ]
    late = [(99, 999, "2026-01-02 00:00:00")]  # advances the watermark
    df1 = _ts_df(spark, rows)
    df2 = _ts_df(spark, late)
    d = str(tmp_path / "sess_in")
    df1.coalesce(1).write.mode("overwrite").parquet(d)
    df2.coalesce(1).write.mode("append").parquet(d)

    stream = spark.readStream.schema(df1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    q = (
        sessionize_stream(stream, "user_id", "ts", gap_s=60.0, id_col="event_id")
        .writeStream.format("memory")
        .queryName("q_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT * FROM q_sessions WHERE user_id <> 99"
    )
    want = sessionize(
        df1, "user_id", "ts", gap_s=60.0, id_col="event_id"
    ).drop("session_idx", "idle_before_us")
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    assert (
        got.select(*cols).exceptAll(want.select(*cols)).count() == 0
        and want.select(*cols).exceptAll(got.select(*cols)).count() == 0
    )
    assert got.count() == 3  # (1: two sessions) + (2: one merged session)


def test_range_join_parity_and_plan(spark):
    import random

    from jsonschema_spark.operators.temporal import range_join

    rng = random.Random(13)
    pts = [(i, rng.uniform(-5, 105)) for i in range(300)]
    ivs = []
    for j in range(40):
        lo = rng.uniform(-10, 100)
        ivs.append((j, lo, lo + rng.uniform(0, 12)))
    ivs.append((98, 50.0, 50.0))   # empty
    ivs.append((99, 60.0, 55.0))   # inverted
    points = spark.createDataFrame(pts, "pid long, p double")
    intervals = spark.createDataFrame(ivs, "iid long, lo double, hi double")

    got = {
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "p", "lo", "hi", 8.0).collect()
    }
    want = {
        (pid, iid)
        for pid, p in pts
        for iid, lo, hi in ivs
        if lo <= p < hi
    }
    assert got == want

    plan = (
        range_join(points, intervals, "p", "lo", "hi", 8.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    naive = points.join(
        intervals, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi"))
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    # what we are avoiding: Spark's non-equi join is all-pairs
    assert "NestedLoop" in naive_plan or "CartesianProduct" in naive_plan


def test_range_join_single_match_per_pair(spark):
    from jsonschema_spark.operators.temporal import range_join

    # interval spans many buckets; the point still matches exactly once
    points = spark.createDataFrame([(1, 17.0)], "pid long, p double")
    intervals = spark.createDataFrame([(7, 0.0, 100.0)],
                                      "iid long, lo double, hi double")
    rows = range_join(points, intervals, "p", "lo", "hi", 2.0).collect()
    assert len(rows) == 1 and rows[0]["iid"] == 7


def test_range_join_validation(spark):
    import pytest as _pt

    from jsonschema_spark.operators.temporal import range_join

    df = spark.createDataFrame([(1.0,)], "p double")
    with _pt.raises(ValueError):
        range_join(df, df, "p", "p", "p", 0)


def test_time_rollup_levels(spark):
    from jsonschema_spark.operators.temporal import time_rollup

    rows = [
        ("2026-03-01 10:15:10", 1.0),
        ("2026-03-01 10:15:40", 2.0),
        ("2026-03-01 10:47:00", 4.0),
        ("2026-03-01 11:00:05", 8.0),
        ("2026-03-02 09:30:00", 16.0),
        (None, 99.0),
        ("2026-03-02 09:31:00", None),
    ]
    df = spark.createDataFrame(rows, "ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = time_rollup(df, "ts", "value").collect()
    by = {(r["day"], r["hour"], r["minute"]): r for r in out}
    # minute level
    m = by[("2026-03-01", "2026-03-01 10", "2026-03-01 10:15")]
    assert (m["depth"], m["n"], m["value_sum"]) == (3, 2, 3.0)
    # hour level
    h = by[("2026-03-01", "2026-03-01 10", None)]
    assert (h["depth"], h["n"], h["value_sum"]) == (2, 3, 7.0)
    # day level
    d = by[("2026-03-01", None, None)]
    assert (d["depth"], d["n"], d["value_sum"], d["value_max"]) == (1, 4, 15.0, 8.0)
    # grand total excludes NULL ts/value rows
    g = by[(None, None, None)]
    assert (g["depth"], g["n"], g["value_sum"]) == (0, 5, 31.0)
    # single aggregate pass
    plan = time_rollup(df, "ts", "value")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Expand" in plan
