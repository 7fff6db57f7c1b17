"""Streaming exact dedup (streaming/dedup.py): first-arrival-wins with
bounded state; the kept CONTENT set must equal the batch survivor set."""

from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import distinct_by_content
from jsonschema_spark.streaming.dedup import (
    content_fingerprint,
    streaming_exact_dedup,
)


def _docs(spark, tmp_path, name):
    # 30 docs over 10 distinct texts (i % 10), with event times
    rows = [
        (i, f"text body number {i % 10}", f"2026-01-01 00:{i:02d}:00")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string").select(
        "doc_id", "text", F.col("ts").cast("timestamp").alias("ts")
    )
    d = str(tmp_path / name)
    df.coalesce(1).write.mode("overwrite").parquet(d)  # one file => one batch
    return d, spark.read.parquet(d)


def test_streaming_dedup_content_parity(spark, tmp_path):
    d, batch = _docs(spark, tmp_path, "docs")
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        streaming_exact_dedup(stream, "text", event_time_col="ts")
        .writeStream.format("memory")
        .queryName("q_dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM q_dedup_stream")
    want = distinct_by_content(batch.select("doc_id", "text"))
    # one survivor per distinct content, same content set as batch dedup
    assert got.count() == 10
    assert sorted(r["text"] for r in got.select("text").collect()) == sorted(
        r["text"] for r in want.select("text").collect()
    )
    assert got.select("fingerprint").distinct().count() == 10


def test_fingerprint_null_and_binary(spark):
    df = spark.createDataFrame(
        [(b"abc",), (None,), (b"",)], "payload binary"
    ).select(content_fingerprint("payload").alias("fp"))
    fps = [r["fp"] for r in df.collect()]
    assert fps[1] == fps[2] and fps[0] != fps[1]
    assert all(fp is not None for fp in fps)
