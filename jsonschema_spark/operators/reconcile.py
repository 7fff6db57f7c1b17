"""Cross-table reconciliation + domain-completeness checks.

Two validation-engine capabilities beyond per-row keyword checks (the
Deequ-style "satisfies across tables" family, complementing
operators/referential.py's key-existence checks):

- ``reconcile``: does an aggregate over a detail table agree with a summary
  column on a header table, per key, within tolerance? (e.g. does
  orders.o_totalprice equal the sum of its lineitem amounts?)
- ``date_completeness`` / ``categorical_completeness``: is every expected
  partition value present? (missing days in a time-partitioned feed,
  missing codec in a clips drop)

Scale design (10^12 rows):
- ``reconcile`` is ONE partial+final hash aggregate on the detail table
  (shuffle keyed by the join key) plus one join the AQE planner sizes
  (broadcast when the header side is small, shuffle otherwise). No windows,
  no driver round-trips.
- Float determinism: detail amounts are computed per-row in IEEE double
  (deterministic — same multiply order everywhere), quantized to exact
  integer MICROS with the explicit grid ``floor(x·1e6 + 0.5)`` (multiply/
  add/floor are correctly-rounded IEEE ops — identical on any engine or
  build), and summed as DECIMAL(38,0) — exact and associative, identical
  across engines, partitionings, and retries. Summing raw doubles would
  depend on merge order; ``CAST(double AS DECIMAL(p,s>0))`` is the trap
  this replaced: Spark converts via shortest-repr string + BigDecimal
  HALF_UP, DuckDB via scaled hugeint arithmetic whose tie rounding has
  changed between releases — the rounds-2/3 driver hash failures.
- ``date_completeness`` aggregates the observed domain (distinct on the
  partition value — one narrow shuffle), generates the expected domain
  with ``sequence()`` from the min/max (tiny), and anti-joins. The
  expected side is O(days), never O(rows).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def reconcile(
    header: DataFrame,
    detail: DataFrame,
    header_key: str,
    detail_key: str,
    header_value: str,
    detail_amount: Column,
    rel_tol: float = 0.01,
) -> DataFrame:
    """Per-key mismatch rows: header rows whose ``header_value`` differs
    from the summed detail amount by more than ``rel_tol`` (relative), or
    that have no detail rows at all.

    Returns (key, header_value, detail_total, detail_rows, rel_diff) with
    rel_diff an UNROUNDED double (NULL when no detail rows exist).
    ``detail_amount`` is any per-row Column; it is quantized to exact
    integer MICROS — ``floor(x·1e6 + 0.5)``, each step a correctly-rounded
    IEEE op — and summed as DECIMAL(38,0) for exact, order-independent,
    engine-portable sums (precondition |amount| < 9.2e12 per row for the
    long floor; currency-scale always). ``detail_total`` is the micros sum
    divided back once (sum/1e6): per-key micros stay far below 2^53, so
    the BIGINT→double conversion is exact and the single divide correctly
    rounded — bit-identical in any engine/build.

    rel_diff is deliberately NOT rounded, and the micros path deliberately
    avoids ``CAST(double AS DECIMAL(p,s))``: Spark converts via shortest-
    repr string + BigDecimal HALF_UP, DuckDB via scaled hugeint arithmetic
    whose tie rounding differs between builds — a 1-micro flip on one row
    changed detail_total AND rel_diff and failed the driver hash in rounds
    2 and 3 while local DuckDB agreed bit-for-bit.
    """
    micros = F.floor(detail_amount * F.lit(1e6) + F.lit(0.5)).cast("decimal(38,0)")
    agg = (
        detail.where(F.col(detail_key).isNotNull())
        .groupBy(F.col(detail_key).alias("_k"))
        .agg(
            F.sum(micros).alias("_dt_micros"),
            F.count(F.lit(1)).alias("detail_rows"),
        )
        .select(
            "_k",
            (F.col("_dt_micros").cast("long").cast("double") / F.lit(1e6)).alias(
                "detail_total"
            ),
            "detail_rows",
        )
    )
    joined = header.where(F.col(header_key).isNotNull()).join(
        agg, F.col(header_key) == F.col("_k"), "left"
    )
    # denominator floor guards the zero-header case: abs(h)/0 would be NULL
    # under non-ANSI divide and silently DROP a 100%-wrong total from the
    # mismatch set; with the floor, h=0 vs d=100 scores rel_diff ~1e14 and
    # is flagged. NULL header values are flagged explicitly.
    rel = (
        F.abs(F.col(header_value) - F.col("detail_total"))
        / F.greatest(F.abs(F.col(header_value)), F.lit(1e-12))
    )
    return (
        joined.select(
            F.col(header_key),
            F.col(header_value),
            F.col("detail_total"),
            F.coalesce(F.col("detail_rows"), F.lit(0)).alias("detail_rows"),
            rel.alias("rel_diff"),
        )
        .where(
            F.col("detail_total").isNull()
            | F.col(header_value).isNull()
            | (F.col("rel_diff") > rel_tol)
        )
    )


def reconcile_summary(
    header: DataFrame,
    detail: DataFrame,
    header_key: str,
    detail_key: str,
    header_value: str,
    detail_amount: Column,
    rel_tol: float = 0.01,
) -> DataFrame:
    """One-row rollup: (header_rows, mismatched, missing_detail, max_rel_diff)."""
    mm = reconcile(
        header, detail, header_key, detail_key, header_value, detail_amount, rel_tol
    )
    totals = header.where(F.col(header_key).isNotNull()).agg(
        F.count(F.lit(1)).alias("header_rows")
    )
    rollup = mm.agg(
        F.count(F.lit(1)).alias("mismatched"),
        F.sum((F.col("detail_total").isNull()).cast("long")).alias("missing_detail"),
        F.max("rel_diff").alias("max_rel_diff"),
    )
    return totals.crossJoin(rollup).select(
        "header_rows",
        F.coalesce("mismatched", F.lit(0)).alias("mismatched"),
        F.coalesce("missing_detail", F.lit(0)).alias("missing_detail"),
        "max_rel_diff",
    )


def date_completeness(
    df: DataFrame,
    ts_col: str,
) -> DataFrame:
    """Missing calendar days between the observed min and max of ``ts_col``.

    Returns (missing_day: date) — one row per absent day. The expected
    domain is generated with ``sequence()`` from a single min/max aggregate
    row, so its cost is O(days) regardless of table size; the observed
    side is a distinct on the day value (narrow shuffle of O(days) rows
    after map-side partial dedup).
    """
    observed = (
        df.where(F.col(ts_col).isNotNull())
        .select(F.to_date(ts_col).alias("day"))
        .distinct()
        .persist()
    )
    # bounds derive from the already-reduced day set (O(days) input) — one
    # scan of the fact table total, not two
    bounds = observed.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    expected = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("missing_day")
    )
    return expected.join(
        observed, expected["missing_day"] == observed["day"], "left_anti"
    ).orderBy("missing_day")


def categorical_completeness(
    df: DataFrame,
    col: str,
    expected: Sequence[str],
) -> DataFrame:
    """Expected category values absent from ``df[col]``.

    Returns (missing_value: string). The expected side is a literal array
    (driver-known contract, e.g. the codec list a feed must deliver);
    observed is a distinct aggregate — O(categories) after partial dedup.
    """
    spark = df.sparkSession
    exp = spark.createDataFrame(
        [(v,) for v in expected], f"missing_value string"
    )
    observed = df.where(F.col(col).isNotNull()).select(
        F.col(col).alias("_obs")
    ).distinct()
    return exp.join(
        observed, exp["missing_value"] == observed["_obs"], "left_anti"
    ).orderBy("missing_value")
