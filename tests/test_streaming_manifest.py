"""Streaming incremental manifest (streaming/manifest.py): after any
prefix of the stream, the running per-bucket manifest must equal the
batch content_manifest of the rows ingested so far — the monoid property
the commutative digest was designed for."""

from pyspark.sql import functions as F

from jsonschema_spark.operators.integrity import content_manifest
from jsonschema_spark.streaming.manifest import streaming_manifest


def _clips(spark, tmp_path, name, n_files=3):
    rows = [
        (f"clip-{i:012d}",
         None if i % 7 == 5 else bytes([i % 251]) * (40 + i))
        for i in range(36)
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    d = str(tmp_path / name)
    # several files => several micro-batches with maxFilesPerTrigger=1
    df.repartition(n_files).write.mode("overwrite").parquet(d)
    return d, df


def _snapshot(spark, qname):
    return {
        r["bucket"]: (r["n_rows"], r["total_bytes"], str(r["digest_sum"]))
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
    }


def _batch_manifest(df, n_buckets=4):
    return {
        r["bucket"]: (r["n_rows"], r["total_bytes"], str(r["digest_sum"]))
        for r in content_manifest(df, n_buckets=n_buckets).collect()
    }


def test_streaming_manifest_batch_parity(spark, tmp_path):
    d, batch = _clips(spark, tmp_path, "clips")
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        streaming_manifest(stream, n_buckets=4)
        .writeStream.format("memory")
        .queryName("q_manifest_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_mf"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert _snapshot(spark, "q_manifest_stream") == _batch_manifest(batch)


def test_streaming_manifest_prefix_consistency(spark, tmp_path):
    """Ingest file-by-file; after each micro-batch the running manifest
    equals the batch manifest of exactly the rows seen so far."""
    rows = [
        (f"clip-{i:012d}", bytes([i % 19]) * (30 + i)) for i in range(24)
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    d = str(tmp_path / "pclips")
    import os

    os.makedirs(d, exist_ok=True)
    # write two separate parquet "arrival waves" into the same directory
    df.filter(F.col("clip_id") <= "clip-000000000011").coalesce(1).write.mode(
        "append"
    ).parquet(d)

    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(d)
    q = (
        streaming_manifest(stream, n_buckets=4)
        .writeStream.format("memory")
        .queryName("q_manifest_prefix")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_pf"))
        .start()
    )
    q.processAllAvailable()
    first = _snapshot(spark, "q_manifest_prefix")
    assert first == _batch_manifest(
        df.filter(F.col("clip_id") <= "clip-000000000011")
    )

    df.filter(F.col("clip_id") > "clip-000000000011").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    q.processAllAvailable()
    q.stop()
    assert _snapshot(spark, "q_manifest_prefix") == _batch_manifest(df)
