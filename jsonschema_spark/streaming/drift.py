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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def psi_foreach_batch(
    baseline: DataFrame,
    column: str,
    sink: Callable[[DataFrame, int], None],
    eps: float = 1e-6,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function: for each micro-batch of completed
    windowed histograms, emit (window_start, window_end, psi) by comparing
    every window's histogram against the static baseline snapshot."""
    base_hist = category_histogram(baseline, column).cache()

    def fn(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        windows = [
            (r.window_start, r.window_end)
            for r in batch.select("window_start", "window_end").distinct().collect()
        ]
        spark = batch.sparkSession
        out = []
        for ws, we in windows:
            cur = batch.filter(
                (F.col("window_start") == ws) & (F.col("window_end") == we)
            ).select("category", "cnt")
            contributions = psi_table_from_histograms(cur, base_hist, eps).collect()
            out.append((ws, we, float(sum(c.contribution for c in contributions))))
        sink(
            spark.createDataFrame(out, "window_start timestamp, window_end timestamp, psi double"),
            batch_id,
        )

    return fn
