"""Metrics history + run-over-run regression detection.

The Deequ "MetricsRepository + anomaly detection" capability: every
validation run appends its check metrics (violation rate, row count,
null rate, ...) to a history table; the next run is judged not only
against static thresholds but against its OWN trailing distribution —
"orders row_count dropped 40% vs the last 30 loads" fires even when
every static check passes.

Scale design: the history table is METADATA — O(checks x runs) rows
(thousands), never O(data). All aggregates here are tiny; the expensive
part (computing the metrics) already happened in the validation run
itself. The robust baseline is median/MAD (Iglewicz-Hoaglin modified
z-score, same rule as ``stats.mad_outliers`` / ``partition_health``) —
resistant to past incidents polluting the baseline, unlike mean/stddev.

Plan shape: per-check median via one grouped exact percentile, joined
back onto history (post-aggregate, AQE broadcasts) for the per-check MAD,
then one join with the current run's metrics. No windows, no driver
round-trips. MAD == 0 (a historically constant metric) declines loudly:
NULL z, ``regressed`` driven by the exact-change test instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from jsonschema_spark.functions.grid import grid_round

HISTORY_COLS = ("run_id", "check", "metric")


def append_run(
    report: DataFrame, run_id: str, path: str, check_col: str = "check",
    metric_col: str = "metric",
) -> None:
    """Append one run's (check, metric) report to the history table at
    ``path`` (parquet, append mode — on a cluster this is an Iceberg
    table and appends are snapshots)."""
    (
        report.select(
            F.lit(run_id).alias("run_id"),
            F.col(check_col).alias("check"),
            F.col(metric_col).cast("double").alias("metric"),
        ).write.mode("append").parquet(path)
    )


def metric_regressions(
    history: DataFrame,
    current: DataFrame,
    k: float = 3.5,
    min_runs: int = 3,
) -> DataFrame:
    """Judge the current run's metrics against the trailing history.

    ``history``: (run_id, check, metric) — prior runs only.
    ``current``: (check, metric) — the run under test.

    Returns one row per current check: (check, n_runs, baseline_median,
    baseline_mad, metric, modified_z, regressed).
    - ``modified_z`` = 0.6745 * (metric - median) / MAD, rounded to 6;
      NULL when MAD == 0 or n_runs < min_runs.
    - ``regressed`` is true when |modified_z| > k, or — for the MAD == 0
      constant-baseline case with enough runs — when the metric moved at
      all off the constant. Checks with fewer than ``min_runs`` prior
      runs never flag (insufficient evidence — fail open but visibly:
      n_runs says why).

    Exact percentiles (linear-interpolation median) keep the result
    deterministic and DuckDB-replayable; the history is O(checks x runs)
    so exactness costs nothing.
    """
    h = history.select(
        "check", F.col("metric").cast("double").alias("m")
    ).where(F.col("m").isNotNull())
    med = h.groupBy("check").agg(
        F.percentile(F.col("m"), F.lit(0.5)).alias("baseline_median"),
        F.count(F.lit(1)).alias("n_runs"),
    )
    mad = (
        h.join(med, "check")
        .groupBy("check")
        .agg(
            F.percentile(
                F.abs(F.col("m") - F.col("baseline_median")), F.lit(0.5)
            ).alias("baseline_mad"),
        )
    )
    base = med.join(mad, "check")
    cur = current.select(
        "check", F.col("metric").cast("double").alias("metric")
    )
    j = cur.join(base, "check", "left")
    z = grid_round(
        F.lit(0.6745)
        * (F.col("metric") - F.col("baseline_median"))
        / F.col("baseline_mad"),
        6,
    )
    enough = F.coalesce(F.col("n_runs") >= min_runs, F.lit(False))
    mad_pos = F.coalesce(F.col("baseline_mad") > 0, F.lit(False))
    modified_z = F.when(enough & mad_pos, z)
    regressed = (
        # ``enough`` is coalesced to non-NULL, so ~enough is safe in a
        # when() chain (the three-valued-logic gotcha)
        F.when(~enough, F.lit(False))
        # a NULL metric against real history is itself an anomaly
        .when(F.col("metric").isNull(), F.lit(True))
        .when(mad_pos, F.abs(modified_z) > k)
        # constant baseline (MAD == 0): any movement off the constant
        .otherwise(F.col("metric") != F.col("baseline_median"))
    )
    return j.select(
        "check",
        F.coalesce(F.col("n_runs"), F.lit(0)).alias("n_runs"),
        "baseline_median",
        "baseline_mad",
        "metric",
        modified_z.alias("modified_z"),
        regressed.alias("regressed"),
    )
