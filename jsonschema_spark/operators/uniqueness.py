"""Key-uniqueness checks with explicit skew handling (north rule).

Plain path: ``groupBy(key).count().filter(count > 1)`` — one shuffle on the
key; AQE splits skewed reduce partitions at runtime.

Salted path (for hot keys at 10^12 scale): two-phase aggregate —
phase 1 groups on (key, salt) so a hot key fans out over ``salt_buckets``
reducers and partial counts stay bounded; phase 2 merges the per-salt
partials. Both phases are partial+final hash aggregates; the phase-2
shuffle carries at most ``salt_buckets`` rows per distinct key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(salt_buckets: int = 64) -> Column:
    """Deterministic per-task salt for two-phase hot-key aggregates.

    NOT monotonically_increasing_id or rand: under partial stage recompute
    (shuffle-fetch failures at cluster scale) re-executed map tasks must
    assign the SAME salt to the same rows, or phase-2 merges a mix of old
    and new partials and counts corrupt. ``spark_partition_id`` is stable
    for a given input split; a hot key's rows span many input partitions,
    so it still fans out over min(input partitions, buckets) reducers with
    bounded partial state per (key, salt)."""
    return F.pmod(F.spark_partition_id().cast("long"), F.lit(salt_buckets))


def duplicate_keys(df: DataFrame, keys: Sequence[str] | str, salted: bool = False,
                   salt_buckets: int = 64) -> DataFrame:
    """(key..., dup_count) for every key value appearing more than once."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not salted:
        return (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("dup_count"))
            .filter(F.col("dup_count") > 1)
        )
    partial = (
        df.withColumn("_salt", salt_column(salt_buckets))
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("_partial").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def uniqueness_summary(df: DataFrame, keys: Sequence[str] | str, salted: bool = False,
                       salt_buckets: int = 64) -> DataFrame:
    """(total_rows, distinct_keys, duplicate_keys, duplicate_rows) one-row rollup.

    ``salted`` routes the per-key count through the same two-phase
    (key, salt) -> key aggregate as ``duplicate_keys`` so a hot key's
    partial counts fan out over ``salt_buckets`` reducers."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if salted:
        per_key = (
            df.withColumn("_salt", salt_column(salt_buckets))
            .groupBy(*keys, "_salt")
            .agg(F.count(F.lit(1)).alias("_partial"))
            .groupBy(*keys)
            .agg(F.sum("_partial").alias("cnt"))
        )
    else:
        per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("distinct_keys"),
        F.sum((F.col("cnt") > 1).cast("long")).alias("duplicate_keys"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias("duplicate_rows"),
    )
