"""Streaming validation: the SAME compiled constraint plan, applied to a
``readStream`` DataFrame.

The compiled checks are pure Column expressions referencing columns by
name (plans/compile.py), so they are execution-plan-agnostic: batch and
streaming share one compile. The reference has no streaming concept at
all — this is the Spark-native extension the north rule's "same DAG under
readStream + watermarks" line asks for (SURVEY §2C).

Scale notes:
- ``annotate_stream`` is stateless (per-row projection): no state store,
  no watermark needed, arbitrary sinks.
- ``windowed_summary`` is a windowed aggregation with a watermark: late
  rows beyond the watermark are dropped deterministically; output mode
  "append" emits each window once finalized, "update" emits running
  counts. State size is O(open windows), not O(rows).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.validate import VIOLATION_COLS
from jsonschema_spark.plans.compile import CompileOptions, compile_schema
from jsonschema_spark.resolve import ResolveConfig
from jsonschema_spark.schema import Schema


def _compile(df: DataFrame, schema, options, resolve_config):
    if isinstance(schema, str):
        schema = Schema.from_json(schema)
    elif isinstance(schema, dict):
        schema = Schema.from_value(schema)
    return compile_schema(schema, df.schema, options, resolve_config)


def annotate_stream(
    stream: DataFrame,
    schema: Schema | str | dict,
    options: Optional[CompileOptions] = None,
    resolve_config: Optional[ResolveConfig] = None,
) -> DataFrame:
    """Streaming DataFrame + ``_valid`` boolean + ``_violations`` array.

    Identical semantics to the batch ``validate(...).annotated``."""
    compiled = _compile(stream, schema, options, resolve_config)
    return stream.withColumn("_violations", compiled.violations_array()).withColumn(
        "_valid", F.size("_violations") == 0
    )


def stream_violations(
    stream: DataFrame,
    schema: Schema | str | dict,
    key_cols: Sequence[str],
    options: Optional[CompileOptions] = None,
) -> DataFrame:
    """Streaming violation rows (key..., keyword_path, keyword, column,
    message) — stateless explode, safe for append-mode sinks."""
    ann = annotate_stream(stream, schema, options)
    v = ann.select(*key_cols, F.explode("_violations").alias("_v"))
    return v.select(*key_cols, *[F.col(f"_v.{c}").alias(c) for c in VIOLATION_COLS])


def windowed_summary(
    stream: DataFrame,
    schema: Schema | str | dict,
    ts_col: str,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    options: Optional[CompileOptions] = None,
) -> DataFrame:
    """Tumbling-window pass/fail rollup with late-data handling.

    (window_start, window_end, rows, passed, failed, violation_count) —
    the streaming analogue of ``ValidationResult.summary()``.
    """
    ann = annotate_stream(stream, schema, options)
    # watermarks require TIMESTAMP (not NTZ); cast is a no-op when already tz
    ann = ann.withColumn("_event_ts", F.col(ts_col).cast("timestamp"))
    return (
        ann.withWatermark("_event_ts", watermark)
        .groupBy(F.window(F.col("_event_ts"), window).alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("_valid").cast("long")).alias("passed"),
            F.sum((~F.col("_valid")).cast("long")).alias("failed"),
            F.sum(F.size("_violations").cast("long")).alias("violation_count"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            "rows",
            "passed",
            "failed",
            "violation_count",
        )
    )
