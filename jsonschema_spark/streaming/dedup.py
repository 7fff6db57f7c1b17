"""Streaming exact deduplication with bounded state.

A continuously-ingesting corpus needs dedup ON THE WAY IN — re-running
batch dedup over 100 TB per arrival wave is not a plan. Structured
Streaming's `dropDuplicatesWithinWatermark` keeps one state-store entry
per content fingerprint and EVICTS entries older than the watermark, so
state is bounded by (arrival rate x watermark window), not corpus size.
That is the correct trade at 10^12 rows: exact dedup against the full
history belongs to the batch funnel (operators/dedup.py); the stream
deduplicates each watermark window exactly and relies on periodic batch
compaction for cross-window duplicates — the standard lambda split.

Semantics note: streaming dedup keeps the FIRST arrival per fingerprint;
the batch operator keeps the min-id survivor. The KEPT CONTENT SET is
identical (tests pin that); which row carries it differs by design.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_fingerprint(col: Column | str) -> Column:
    """md5 content fingerprint — matches operators/dedup.fingerprint for
    text; works on binary payloads too (audio exact dedup)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.when(c.isNull(), F.lit(b"")).otherwise(c).cast("binary"))


def streaming_exact_dedup(
    stream: DataFrame,
    content_col: str,
    event_time_col: Optional[str] = None,
    watermark: str = "10 minutes",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """First-arrival-wins exact dedup over a stream.

    With ``event_time_col``: watermarked `dropDuplicatesWithinWatermark`
    — state per fingerprint is dropped once the watermark passes it
    (bounded state; duplicates arriving later than the watermark window
    are NOT caught here — batch compaction's job). Without an event-time
    column: plain `dropDuplicates` (state grows with distinct
    fingerprints — only for bounded backfills, and the docstring is the
    warning).
    """
    withfp = stream.withColumn(fingerprint_col, content_fingerprint(content_col))
    if event_time_col is None:
        return withfp.dropDuplicates([fingerprint_col])
    return withfp.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        [fingerprint_col]
    )
