"""Deterministic multi-file layout corpora for the file-layout queries.

Two physical layouts of the SAME logical table (k = 0..n-1, one file per
bucket via ``partitionBy``):

- ``range``: bucket = k // ceil(n/files) — disjoint per-file key ranges,
  the shape a range-partitioned / Z-ordered write produces. Min/max
  skipping prunes to one file per point query; overlap_fraction = 0.
- ``hash``: bucket = k % files — every file spans almost the whole key
  domain, the shape an unclustered hash-shuffled write produces. Nothing
  prunes; overlap_fraction = 1.

File NAMES are non-deterministic (task UUIDs) — the layout contract
queries therefore emit only the one-row ``layout_report`` aggregate,
never per-file rows; the DuckDB oracle groups by its own ``filename``
column and lands on the same totals.

Oracle-cache protocol: materialized once under /tmp/jss_oracle_cache
(atomic rename); bump ``_LAYOUT_VER`` when generator arithmetic changes.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonschema_spark.sources.clips import _MATERIALIZE_ROOT

_LAYOUT_VER = "v1"
LAYOUT_N = 20_000
LAYOUT_FILES = 8


def layout_path(mode: str) -> str:
    return os.path.join(
        _MATERIALIZE_ROOT,
        f"layout_{_LAYOUT_VER}_{mode}_{LAYOUT_N}_{LAYOUT_FILES}",
    )


def _bucket(mode: str):
    per = -(-LAYOUT_N // LAYOUT_FILES)  # ceil
    if mode == "range":
        return (F.col("k") / F.lit(per)).cast("int")
    if mode == "hash":
        return (F.col("k") % F.lit(LAYOUT_FILES)).cast("int")
    raise ValueError(f"unknown layout mode: {mode!r}")


def materialized_layout(spark: SparkSession, mode: str) -> tuple[DataFrame, str]:
    """Materialize (once, atomically) and read back the ``mode`` layout."""
    path = layout_path(mode)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = (
            spark.range(LAYOUT_N)
            .select(F.col("id").alias("k"))
            .withColumn("_b", _bucket(mode))
            .repartition(LAYOUT_FILES, "_b")
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").partitionBy("_b").parquet(tmp)
        # partitionBy writes no root _SUCCESS marker readers can rely on
        # post-rename race-free; Spark does create one — keep the same
        # publish contract as sources.clips.publish_once.
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path), path
