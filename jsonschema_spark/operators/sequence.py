"""Per-key event-sequence checks: ordering, duplicate timestamps, gaps.

Streams of (key, id, timestamp) rows carry invariants no per-row keyword
can see: within a key, timestamps should be non-decreasing in arrival
(id) order, the same instant should not repeat, and silence longer than
an SLA is an outage. This module reports all three per key in one pass —
the validation-engine capability for event feeds (events table;
``clip_id``-sharded ingest manifests on the north-star table).

Scale design (10^12 rows):
- ALL per-key metrics come from windows PARTITIONED BY the key —
  parallelism equals the number of keys, no global sort, no driver
  round-trips. A hot key bounds one task by its own row count (the same
  skew exposure any per-key ordering semantics has; salting cannot help
  because order within the key is the whole point).
- Two orderings are needed (arrival order for regressions, time order
  for duplicates/gaps); both windows share the single partitioning by
  key, so Spark plans ONE exchange and two sorts over it.
- The final per-key rollup is a narrow groupBy(key) — partial+final.

Determinism (oracle contract):
- Arrival order is (id ASC NULLS FIRST, ts ASC NULLS FIRST): rows tied on
  id are broken by ts, so ``lag(ts)`` is value-deterministic even when
  ids repeat (any tied predecessor carries an equal-or-smaller ts).
- Time order is (ts ASC NULLS FIRST, id ASC NULLS FIRST), symmetric
  argument. DuckDB defaults to NULLS LAST on ASC — the oracle must spell
  NULLS FIRST explicitly.
- Gaps use ``unix_micros`` (BIGINT microseconds) so both engines compare
  exact integers, never float seconds.

NULL semantics: rows with a NULL key are excluded (absent-property
semantics); NULL timestamps are counted per key (``n_null_ts``) and
excluded from regression/duplicate/gap arithmetic (NULLS FIRST placement
means a NULL ts never produces a non-NULL lag comparison — comparisons
against it are NULL and the conditional sums coalesce them to 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_profile(
    df: DataFrame, key: str, ts_col: str, id_col: str
) -> DataFrame:
    """Per-key sequence health: one row per key.

    Columns: key, n_events, n_null_ts, regressions (ts decreased in
    arrival order), dup_ts (same instant repeated in time order),
    max_gap_us / span_us (BIGINT microseconds; NULL with <2 timestamped
    rows).
    """
    # Parquet feeds carry TIMESTAMP_NTZ; unix_micros requires TIMESTAMP, so
    # cast first. The session-timezone offset this introduces is CONSTANT
    # (no-DST zones; this host is UTC) and every output field is a
    # DIFFERENCE or comparison of t_us values, so the offset cancels —
    # absolute epochs are deliberately never emitted.
    base = df.where(F.col(key).isNotNull()).select(
        F.col(key).alias("k"),
        F.col(id_col).alias("i"),
        F.col(ts_col).alias("t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t_us"),
    )
    arrival = Window.partitionBy("k").orderBy(
        F.col("i").asc_nulls_first(), F.col("t").asc_nulls_first()
    )
    timeline = Window.partitionBy("k").orderBy(
        F.col("t").asc_nulls_first(), F.col("i").asc_nulls_first()
    )
    marked = base.select(
        "k",
        "t_us",
        # NULL t or NULL lag -> comparison NULL -> coalesce to not-counted
        F.coalesce(
            (F.col("t_us") < F.lag("t_us").over(arrival)).cast("bigint"), F.lit(0)
        ).alias("is_regression"),
        F.coalesce(
            (F.col("t_us") == F.lag("t_us").over(timeline)).cast("bigint"), F.lit(0)
        ).alias("is_dup_ts"),
        (F.col("t_us") - F.lag("t_us").over(timeline)).alias("gap_us"),
    )
    return marked.groupBy(F.col("k").alias(key)).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("t_us").isNull().cast("bigint")).alias("n_null_ts"),
        F.sum("is_regression").alias("regressions"),
        F.sum("is_dup_ts").alias("dup_ts"),
        F.max("gap_us").alias("max_gap_us"),
        (F.max("t_us") - F.min("t_us")).alias("span_us"),
    )


def sequence_report(
    df: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    max_gap_s: float | None = None,
) -> DataFrame:
    """One-row fleet rollup over :func:`sequence_profile`.

    (n_keys, keys_with_regressions, total_regressions, keys_with_dup_ts,
    total_dup_ts, keys_over_gap_sla, max_gap_us, ok). ``max_gap_s`` is the
    silence SLA; omit it to skip the gap verdict (keys_over_gap_sla = 0
    contributes nothing to ``ok``).
    """
    prof = sequence_profile(df, key, ts_col, id_col)
    over_sla = (
        (F.col("max_gap_us") > F.lit(int(max_gap_s * 1_000_000))).cast("bigint")
        if max_gap_s is not None
        else F.lit(0)
    )
    return prof.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("regressions") > 0).cast("bigint")).alias(
            "keys_with_regressions"
        ),
        F.sum("regressions").alias("total_regressions"),
        F.sum((F.col("dup_ts") > 0).cast("bigint")).alias("keys_with_dup_ts"),
        F.sum("dup_ts").alias("total_dup_ts"),
        F.coalesce(F.sum(over_sla), F.lit(0)).alias("keys_over_gap_sla"),
        F.max("max_gap_us").alias("max_gap_us"),
    ).select(
        "*",
        (
            (F.col("total_regressions") == 0)
            & (F.col("total_dup_ts") == 0)
            & (F.col("keys_over_gap_sla") == 0)
        ).alias("ok"),
    )
