"""Streaming incremental content manifest.

The batch transfer manifest (operators/integrity.content_manifest) uses
a COMMUTATIVE checksum (sum of md5_60 over keyed payload-digest lines)
precisely so it forms a monoid: per-bucket (n_rows, total_bytes,
digest_sum) merge by plain addition. That makes the streaming version
trivial and exactly consistent with batch — a running groupBy(bucket)
aggregate in update mode whose state is O(n_buckets) regardless of
stream length, with NO custom stateful operator needed. After any
prefix of the stream, the emitted manifest equals the batch manifest of
the rows ingested so far (tests pin that), so an ingest pipeline can
attest what it has accepted without ever rescanning the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_manifest(
    stream: DataFrame,
    key_col: str = "clip_id",
    payload_col: str = "bytes",
    n_buckets: int = 64,
) -> DataFrame:
    """Running per-bucket manifest over a stream (update output mode).

    Identical per-row arithmetic to the batch operator: bucket =
    md5_60(key) % n_buckets; digest_sum accumulates md5_60 of the keyed
    payload-digest line as DECIMAL(38,0) (exact far beyond any real
    stream length). State is one tiny row per bucket."""
    b = (
        F.conv(F.substring(F.md5(F.col(key_col)), 1, 15), 16, 10)
        .cast("long") % n_buckets
    ).alias("bucket")
    line = F.concat(
        F.col(key_col),
        F.lit(":"),
        F.coalesce(F.md5(F.hex(F.col(payload_col))), F.lit("null")),
    )
    rows = stream.select(
        b,
        F.conv(F.substring(F.md5(line), 1, 15), 16, 10)
        .cast("decimal(38,0)")
        .alias("_h"),
        F.coalesce(F.length(F.col(payload_col)), F.lit(0))
        .cast("long")
        .alias("_len"),
    )
    return rows.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_len").alias("total_bytes"),
        F.sum("_h").cast("decimal(38,0)").alias("digest_sum"),
    )
