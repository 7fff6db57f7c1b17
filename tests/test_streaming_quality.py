"""Streaming parity for the session-C audio operators: quality gates and
PCM segmentation are stateless transforms, so the SAME expressions must
produce identical results under readStream (north rule: one compiled plan,
batch and streaming)."""

from pyspark.sql import functions as F

from jsonschema_spark.functions.audio import audio_quality, quality_gates
from jsonschema_spark.operators.segments import segment_clips
from jsonschema_spark.sources.clips import synth_quality_clips


def _materialize(spark, tmp_path, name):
    d = str(tmp_path / name)
    synth_quality_clips(spark, 120, partitions=4).drop("_row_idx").write.mode(
        "overwrite"
    ).parquet(d)
    return d, spark.read.parquet(d)


def test_quality_gates_streaming_parity(spark, tmp_path):
    d, batch = _materialize(spark, tmp_path, "q_clips")

    def gates(df):
        g = quality_gates(audio_quality("bytes", "sr_hz"))
        return df.select(
            "clip_id", g["silent"].alias("silent"), g["clipped"].alias("clipped"),
            g["too_quiet"].alias("too_quiet"),
        )

    want = sorted(tuple(r) for r in gates(batch).collect())
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        gates(stream)
        .writeStream.format("memory").queryName("q_gate_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_qg"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM q_gate_stream").collect())
    assert got == want


def test_segmentation_streaming_parity(spark, tmp_path):
    d, batch = _materialize(spark, tmp_path, "s_clips")

    def segs(df):
        return segment_clips(df, 250).select(
            "clip_id", "seg_idx", "seg_dur_ms", F.md5(F.hex("seg_bytes")).alias("h")
        )

    want = sorted(tuple(r) for r in segs(batch).collect())
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        segs(stream)
        .writeStream.format("memory").queryName("q_seg_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sg"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM q_seg_stream").collect())
    assert got == want and len(got) > 120


def test_segment_auto_streaming_parity(spark, tmp_path):
    """The segmentation ROUTER under readStream: the slice branch, the
    Arrow decode branch, and their union are all stateless, so the same
    compiled plan must emit byte-identical segment rows per micro-batch
    (north rule: one plan, batch and streaming)."""
    from jsonschema_spark.operators.segments import segment_auto
    from jsonschema_spark.sources.clips import synth_segment_clips

    d = str(tmp_path / "sa_clips")
    synth_segment_clips(spark, 48, partitions=4).drop(
        "_row_idx", "_n_dec", "_seg_idxs", "_seg_ns", "_seg_md5s"
    ).write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)

    from jsonschema_spark.operators.segments import segment_energy

    def segs(df):
        return segment_energy(
            segment_auto(df, 250, transcript_col="transcript")
        ).select(
            "clip_id", "seg_idx", "seg_n_samples", "n_samples",
            "seg_path", "seg_sumsq", "seg_peak", "silent",
            "seg_transcript", F.md5(F.hex("seg_bytes")).alias("h"),
        )

    want = sorted(tuple(r) for r in segs(batch).collect())
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        segs(stream)
        .writeStream.format("memory").queryName("q_segauto_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sa"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.sql("SELECT * FROM q_segauto_stream").collect()
    )
    assert got == want
