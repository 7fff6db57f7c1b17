"""Streaming drift: watermarked windowed histograms + per-window PSI
against a broadcast baseline snapshot.

Shape: the stream side aggregates to (window, category, cnt) — state is
O(windows x categories), shuffle carries category keys only. The PSI is
computed per completed window in ``foreachBatch`` by reusing the batch
operator (`operators/drift.psi_table_from_histograms`) against the static
baseline histogram — one code path for batch and streaming drift, which
is the point of compiling checks to plan-agnostic expressions.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from jsonschema_spark.functions.grid import grid_round

from jsonschema_spark.operators.drift import (
    category_histogram,
    psi_table_from_histograms,
)


def windowed_category_histogram(
    stream: DataFrame,
    column: str,
    ts_col: str,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(window_start, window_end, category, cnt) — append-mode safe."""
    return (
        stream.withColumn("_event_ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_event_ts", watermark)
        .groupBy(
            F.window(F.col("_event_ts"), window).alias("_w"),
            F.col(column).alias("category"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            "category",
            "cnt",
        )
    )


def psi_by_window(
    batch: DataFrame, base_hist: DataFrame, eps: float = 1e-6
) -> DataFrame:
    """(window_start, window_end, psi) for EVERY window in one grouped plan.

    Single-plan shape (no per-window driver loop): build the complete
    (window x category) grid — baseline categories via a windows-x-baseline
    cross join (tiny: windows are few, baseline histogram is one row per
    category), current-only categories via the full-outer semantics of a
    coalesced join — then one windowed aggregate computes totals and PSI
    contributions. One Spark job per micro-batch regardless of how many
    windows it carries; per-category math matches
    ``operators/drift.psi_table_from_histograms`` exactly (parity-pinned
    in tests/test_streaming_drift.py)."""
    wcols = ["window_start", "window_end"]
    windows = batch.select(*wcols).distinct()
    base = base_hist.withColumnRenamed("cnt", "base_cnt")
    grid = windows.join(base, how="cross")  # every (window, baseline category)
    cur = batch.select(*wcols, "category", F.col("cnt").alias("cur_cnt"))
    joined = grid.join(cur, wcols + ["category"], "full_outer").fillna(
        0, subset=["cur_cnt", "base_cnt"]
    )
    # current-only categories enter with base_cnt=0 from the full outer join;
    # totals are per-window sums computed in the same aggregate below.
    totals = joined.groupBy(*wcols).agg(
        F.sum("cur_cnt").alias("n_cur"), F.sum("base_cnt").alias("n_base")
    )
    j = joined.join(totals, wcols)
    p_cur = F.greatest(F.col("cur_cnt") / F.col("n_cur"), F.lit(eps))
    p_base = F.greatest(F.col("base_cnt") / F.col("n_base"), F.lit(eps))
    contrib = grid_round((p_cur - p_base) * F.log(p_cur / p_base), 6)
    return (
        j.select(*wcols, contrib.alias("contribution"))
        .groupBy(*wcols)
        .agg(F.sum("contribution").alias("psi"))
    )


def windowed_binned_histogram(
    stream: DataFrame,
    column: str,
    ts_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(window_start, window_end, bin, cnt) — numeric histograms on the
    uniform ECDF grid per event-time window; append-mode safe. State is
    O(windows x n_bins) ints."""
    from jsonschema_spark.operators.drift import binned_ecdf_bin

    c = F.col(column).cast("double")
    return (
        stream.withColumn("_event_ts", F.col(ts_col).cast("timestamp"))
        .filter(c.isNotNull())
        .withWatermark("_event_ts", watermark)
        .groupBy(
            F.window(F.col("_event_ts"), window).alias("_w"),
            binned_ecdf_bin(c, lo, hi, n_bins).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            "bin",
            "cnt",
        )
    )


def ks_by_window(batch: DataFrame, base_hist: DataFrame) -> DataFrame:
    """(window_start, window_end, ks_stat, n_cur, n_base) for EVERY window
    in one grouped plan — the streaming face of
    ``operators/drift.ks_statistic_binned`` (identical per-window math;
    parity-pinned in tests). ``base_hist`` is the static baseline (bin,
    cnt) from ``operators/drift.binned_histogram``. No per-window driver
    loop: the complete (window x bin) grid is built relationally and the
    cumulative/max runs as a window function partitioned by window over
    <= n_bins rows each."""
    wcols = ["window_start", "window_end"]
    windows = batch.select(*wcols).distinct()
    base = base_hist.withColumnRenamed("cnt", "base_cnt")
    grid = windows.join(base, how="cross")
    cur = batch.select(*wcols, "bin", F.col("cnt").alias("cur_cnt"))
    j = grid.join(cur, wcols + ["bin"], "full_outer").fillna(
        0, subset=["cur_cnt", "base_cnt"]
    )
    w = (
        Window.partitionBy(*wcols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = j.select(
        *wcols,
        F.sum("cur_cnt").over(w).alias("c_cur"),
        F.sum("base_cnt").over(w).alias("c_base"),
    )
    totals = e.groupBy(*wcols).agg(
        F.max("c_cur").alias("n_cur"), F.max("c_base").alias("n_base")
    )
    return (
        e.join(totals, wcols)
        .groupBy(*wcols)
        .agg(
            grid_round(
                F.max(
                    F.abs(
                        F.col("c_cur") / F.col("n_cur")
                        - F.col("c_base") / F.col("n_base")
                    )
                ),
                6,
            ).alias("ks_stat"),
            F.first("n_cur").alias("n_cur"),
            F.first("n_base").alias("n_base"),
        )
    )


def wasserstein_by_window(
    batch: DataFrame, base_hist: DataFrame, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """(window_start, window_end, w1_dist, n_cur, n_base) for EVERY window
    in one grouped plan — the streaming face of
    ``operators/drift.wasserstein_binned`` (identical per-window math:
    present-bin gap weights, integer 1e-9 grid sums; parity-pinned).
    ONE window partitioning computes cumulative, total and gap weight
    together — no totals rejoin."""
    step = (float(hi) - float(lo)) / n_bins
    wcols = ["window_start", "window_end"]
    windows = batch.select(*wcols).distinct()
    base = base_hist.withColumnRenamed("cnt", "base_cnt")
    grid = windows.join(base, how="cross")
    cur = batch.select(*wcols, "bin", F.col("cnt").alias("cur_cnt"))
    j = grid.join(cur, wcols + ["bin"], "full_outer").fillna(
        0, subset=["cur_cnt", "base_cnt"]
    )
    w_cum = (
        Window.partitionBy(*wcols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = (
        Window.partitionBy(*wcols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_ord = Window.partitionBy(*wcols).orderBy("bin")
    e = j.select(
        *wcols,
        "bin",
        F.sum("cur_cnt").over(w_cum).alias("c_cur"),
        F.sum("base_cnt").over(w_cum).alias("c_base"),
        F.sum("cur_cnt").over(w_all).alias("n_cur"),
        F.sum("base_cnt").over(w_all).alias("n_base"),
        (
            F.least(
                F.coalesce(F.lead("bin").over(w_ord), F.lit(n_bins + 1)),
                F.lit(n_bins + 1),
            )
            - F.col("bin")
        ).alias("weight"),
    )
    contrib = F.abs(
        F.col("c_cur") / F.col("n_cur") - F.col("c_base") / F.col("n_base")
    ) * F.lit(step)
    scaled = F.floor(contrib * F.lit(1e9) + F.lit(0.5)).cast("bigint") * F.col(
        "weight"
    )
    return e.groupBy(*wcols).agg(
        grid_round(
            F.sum(F.when(F.col("bin") <= n_bins, scaled).otherwise(F.lit(0)))
            / F.lit(1e9),
            6,
        ).alias("w1_dist"),
        F.max("n_cur").alias("n_cur"),
        F.max("n_base").alias("n_base"),
    )


def wasserstein_foreach_batch(
    baseline: DataFrame,
    column: str,
    sink: Callable[[DataFrame, int], None],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function for windowed W1 drift: every completed window
    in the micro-batch gets its earth-mover distance vs the static
    baseline in one grouped plan."""
    from jsonschema_spark.operators.drift import binned_histogram

    base_hist = binned_histogram(baseline, column, lo, hi, n_bins).cache()

    def fn(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sink(wasserstein_by_window(batch, base_hist, lo, hi, n_bins), batch_id)

    return fn


def ks_foreach_batch(
    baseline: DataFrame,
    column: str,
    sink: Callable[[DataFrame, int], None],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function for windowed numeric drift: each micro-batch of
    completed windowed histograms is compared against the static baseline
    histogram with the binned KS — all windows in one grouped plan."""
    from jsonschema_spark.operators.drift import binned_histogram

    base_hist = binned_histogram(baseline, column, lo, hi, n_bins).cache()

    def fn(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sink(ks_by_window(batch, base_hist), batch_id)

    return fn


def psi_foreach_batch(
    baseline: DataFrame,
    column: str,
    sink: Callable[[DataFrame, int], None],
    eps: float = 1e-6,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function: for each micro-batch of completed
    windowed histograms, emit (window_start, window_end, psi) by comparing
    every window's histogram against the static baseline snapshot — all
    windows in one grouped computation (O(1) Spark jobs per batch, not
    O(windows))."""
    base_hist = category_histogram(baseline, column).cache()

    def fn(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sink(psi_by_window(batch, base_hist, eps), batch_id)

    return fn


# ---------------------------------------------------------------------------
# Per-(window x slice) drift matrix: "which slice drifted in which window"
# ---------------------------------------------------------------------------


def sliced_windowed_category_histogram(
    stream: DataFrame,
    column: str,
    ts_col: str,
    slice_cols: list[str],
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(window_start, window_end, slice..., category, cnt) — append-mode
    safe; state is O(windows x slices x categories) counters."""
    return (
        stream.withColumn("_event_ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_event_ts", watermark)
        .groupBy(
            F.window(F.col("_event_ts"), window).alias("_w"),
            *[F.col(s) for s in slice_cols],
            F.col(column).alias("category"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            *slice_cols,
            "category",
            "cnt",
        )
    )


def drift_matrix_by_window(
    batch: DataFrame,
    base_hist: DataFrame,
    slice_cols: list[str],
    eps: float = 1e-6,
    psi_moderate: float = 0.1,
    psi_major: float = 0.25,
) -> DataFrame:
    """Per-(window, slice) PSI + chi-square + verdict in ONE grouped plan —
    the streaming face of ``operators/drift.drift_matrix`` (identical
    per-group math; parity-pinned in tests). ``base_hist`` is the static
    per-slice histogram from ``operators/drift._grouped_category_histogram``
    (slice..., category, cnt). The batch's few distinct windows cross-join
    the baseline so a slice that went silent in a window is reported with
    n_cur = 0 (all mass moved) rather than silently dropped."""
    from jsonschema_spark.operators.drift import drift_matrix_from_histograms

    wcols = ["window_start", "window_end"]
    windows = batch.select(*wcols).distinct()
    base = windows.join(base_hist, how="cross")
    return drift_matrix_from_histograms(
        batch, base, wcols + list(slice_cols), eps, psi_moderate, psi_major
    )


def drift_matrix_foreach_batch(
    baseline: DataFrame,
    column: str,
    slice_cols: list[str],
    sink: Callable[[DataFrame, int], None],
    eps: float = 1e-6,
    psi_moderate: float = 0.1,
    psi_major: float = 0.25,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch builder for the sliced drift matrix: each micro-batch of
    completed (window x slice) histograms is verdict'd against the static
    per-slice baseline — every window AND every slice in one grouped plan
    (O(1) Spark jobs per batch, not O(windows x slices))."""
    from jsonschema_spark.operators.drift import _grouped_category_histogram

    base_hist = _grouped_category_histogram(
        baseline, list(slice_cols), column
    ).cache()

    def fn(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sink(
            drift_matrix_by_window(
                batch, base_hist, slice_cols, eps, psi_moderate, psi_major
            ),
            batch_id,
        )

    return fn
