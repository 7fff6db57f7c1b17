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


def test_loudness_streaming_parity(spark, tmp_path):
    """BS.1770 loudness + the LUFS normalization rewrite under
    readStream: both are stateless per-row transforms (one Arrow hop),
    so the same compiled plan must emit bit-identical metrics and
    payloads per micro-batch (north rule: one plan, batch and
    streaming)."""
    from jsonschema_spark.functions.audio import audio_loudness
    from jsonschema_spark.operators.trim import normalize_to_lufs
    from jsonschema_spark.sources.clips import synth_loudness_clips

    d = str(tmp_path / "l_clips")
    synth_loudness_clips(spark, 36, partitions=4).drop(
        "_row_idx", "_lufs_i", "_lufs_mm", "_tp", "_n_blocks", "_ngain",
        "_nmd5"
    ).write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)

    def norm_only(df):
        n = normalize_to_lufs(
            df.select("clip_id", "bytes", "sr_hz", "codec"),
            target_lufs=-23.0,
        )
        return n.select(
            "clip_id", "normalized", "gain",
            F.md5(F.coalesce("bytes", F.lit(b""))).alias("out_md5"),
        )

    def loud_only(df):
        l = audio_loudness("bytes", "sr_hz")
        return df.select(
            "clip_id",
            l["lufs_integrated"].alias("li"),
            l["true_peak_dbtp"].alias("tp"),
            l["n_blocks"].alias("nb"),
        )

    for name, fn in (("norm", norm_only), ("loud", loud_only)):
        want = sorted(
            tuple(r) for r in fn(batch).fillna(-9999.0).collect()
        )
        stream = spark.readStream.schema(batch.schema).parquet(d)
        q = (
            fn(stream).fillna(-9999.0)
            .writeStream.format("memory").queryName(f"q_lufs_{name}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = sorted(
            tuple(r)
            for r in spark.sql(f"SELECT * FROM q_lufs_{name}").collect()
        )
        assert got == want and len(got) == 36, name


def test_container_walk_streaming_parity(spark, tmp_path):
    """The container walkers (MP3 frame walk, Ogg page walk, unified
    dispatch + metadata gates) are stateless per-row transforms — the
    same compiled plan must emit identical rows under readStream (north
    rule: one plan, batch and streaming). The mixed corpus drives all
    routes through one stream."""
    from jsonschema_spark.functions.containers import (
        audio_container_profile,
        container_meta_gates,
    )
    from jsonschema_spark.sources.clips import synth_mixed_clips

    d = str(tmp_path / "mixed_clips")
    synth_mixed_clips(spark, 40, partitions=4).select(
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec"
    ).write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)

    def profile(df):
        prof = df.select(
            "clip_id", "sr_hz", "dur_ms",
            audio_container_profile("bytes").alias("p"),
        )
        g = container_meta_gates(F.col("p"))
        return prof.select(
            "clip_id", "p.container", "p.ok", "p.sample_rate",
            "p.parsed_dur_ms", g["meta_ok"].alias("meta_ok"),
        )

    want = sorted(tuple(r) for r in profile(batch).collect())
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        profile(stream)
        .writeStream.format("memory").queryName("q_mixed_walk")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_mixed"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM q_mixed_walk").collect()
    )
    assert got == want and len(got) == 40


def test_pitch_streaming_parity(spark, tmp_path):
    """NACF pitch/voicing screen under readStream: stateless per-row
    transform (one Arrow hop), so the same compiled plan must emit
    bit-identical profiles + gates per micro-batch (north rule: one
    plan, batch and streaming)."""
    from jsonschema_spark.functions.pitch import audio_pitch, pitch_gates
    from jsonschema_spark.sources.clips import synth_pitch_clips

    d = str(tmp_path / "p_clips")
    synth_pitch_clips(spark, 24, partitions=4).drop(
        "_row_idx", "_f0", "_vf", "_nfr", "_n",
        "_speech", "_unvoiced", "_meas",
    ).write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)

    def prof(df):
        p = audio_pitch("bytes", "sr_hz")
        g = pitch_gates(p)
        return df.select(
            "clip_id",
            p["f0_median_hz"].alias("f0"),
            p["voiced_frac"].alias("vf"),
            p["n_frames"].alias("nf"),
            g["speechlike"].alias("sp"),
            g["measurable"].alias("ms"),
        )

    want = sorted(tuple(r) for r in prof(batch).fillna(-9999.0).collect())
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        prof(stream).fillna(-9999.0)
        .writeStream.format("memory").queryName("q_pitch_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pitch"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.sql("SELECT * FROM q_pitch_stream").collect()
    )
    assert got == want and len(got) == 24


def test_stereo_streaming_parity(spark, tmp_path):
    """Stereo-integrity screen under readStream: stateless per-row
    transform (one Arrow hop), so the same compiled plan must emit
    bit-identical profiles + gates per micro-batch (north rule: one
    plan, batch and streaming)."""
    from jsonschema_spark.functions.stereo import audio_stereo, stereo_gates
    from jsonschema_spark.sources.clips import synth_stereo_screen_clips

    d = str(tmp_path / "s_clips")
    synth_stereo_screen_clips(spark, 24, partitions=4).drop(
        "_row_idx", "_nch", "_corr", "_rmsl", "_rmsr", "_rmsm", "_rmss",
        "_n", "_stereo", "_dual", "_phase", "_imb", "_ok", "_meas",
    ).write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)

    def prof(df):
        p = audio_stereo("bytes")
        g = stereo_gates(p)
        return df.select(
            "clip_id",
            p["n_channels"].alias("nch"),
            p["corr_lr"].alias("corr"),
            p["rms_side"].alias("rs"),
            g["dual_mono"].alias("dm"),
            g["out_of_phase"].alias("op"),
            g["imbalanced"].alias("im"),
            g["stereo_ok"].alias("ok"),
        )

    want = sorted(tuple(r) for r in prof(batch).fillna(-9999.0).collect())
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        prof(stream).fillna(-9999.0)
        .writeStream.format("memory").queryName("q_stereo_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_stereo"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.sql("SELECT * FROM q_stereo_stream").collect()
    )
    assert got == want and len(got) == 24


def test_tonality_streaming_parity(spark, tmp_path):
    """Tonality screen under readStream: stateless per-row transform
    (one Arrow hop), so the same compiled plan must emit bit-identical
    profiles + gates per micro-batch (north rule: one plan, batch and
    streaming)."""
    from jsonschema_spark.functions.tonality import (
        audio_tonality,
        tonality_gates,
    )
    from jsonschema_spark.sources.clips import synth_tonality_clips

    d = str(tmp_path / "t_clips")
    synth_tonality_clips(spark, 24, partitions=4).drop(
        "_row_idx", "_flat", "_line", "_stab", "_efrac", "_nfr", "_n",
        "_tonal", "_steady", "_noise", "_ok", "_meas",
    ).write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)

    def prof(df):
        p = audio_tonality("bytes", "sr_hz")
        g = tonality_gates(p)
        return df.select(
            "clip_id",
            p["flat_med"].alias("fl"),
            p["dom_stab"].alias("st"),
            g["tonal"].alias("tn"),
            g["steady_tone"].alias("sd"),
            g["noiselike"].alias("nz"),
            g["spectral_ok"].alias("ok"),
        )

    want = sorted(tuple(r) for r in prof(batch).fillna(-9999.0).collect())
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        prof(stream).fillna(-9999.0)
        .writeStream.format("memory").queryName("q_tonality_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_tonality"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.sql("SELECT * FROM q_tonality_stream").collect()
    )
    assert got == want and len(got) == 24


def test_snr_streaming_parity(spark, tmp_path):
    """Reference-free SNR screen under readStream: stateless per-row
    transform (one Arrow hop), so the same compiled plan must emit
    bit-identical profiles + gates per micro-batch (north rule: one
    plan, batch and streaming)."""
    from jsonschema_spark.functions.snrest import audio_snr_est, snr_gates
    from jsonschema_spark.sources.clips import synth_snr_clips

    d = str(tmp_path / "n_clips")
    synth_snr_clips(spark, 21, partitions=4).drop(
        "_row_idx", "_planted_db", "_est", "_p10", "_p90", "_act",
        "_nfr", "_n", "_noisy", "_ok", "_meas",
    ).write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)

    def prof(df):
        p = audio_snr_est("bytes", "sr_hz")
        g = snr_gates(p)
        return df.select(
            "clip_id",
            p["snr_est_db"].alias("snr"),
            p["activity_frac"].alias("act"),
            g["too_noisy"].alias("tn"),
            g["snr_ok"].alias("ok"),
            g["measurable"].alias("ms"),
        )

    want = sorted(tuple(r) for r in prof(batch).fillna(-9999.0).collect())
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        prof(stream).fillna(-9999.0)
        .writeStream.format("memory").queryName("q_snr_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_snr"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.sql("SELECT * FROM q_snr_stream").collect()
    )
    assert got == want and len(got) == 21


def test_dropout_streaming_parity(spark, tmp_path):
    """Dropout/click screen under readStream: stateless per-row
    transform (one Arrow hop), so the same compiled plan must emit
    bit-identical profiles + gates per micro-batch (north rule: one
    plan, batch and streaming)."""
    from jsonschema_spark.functions.dropouts import (
        artifact_gates,
        audio_artifacts,
    )
    from jsonschema_spark.sources.clips import synth_dropout_clips

    d = str(tmp_path / "d_clips")
    synth_dropout_clips(spark, 18, partitions=4).drop(
        "_row_idx", "_nd", "_dms", "_mdms", "_nc", "_thr", "_int", "_n",
        "_drop", "_click", "_ok", "_meas",
    ).write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)

    def prof(df):
        p = audio_artifacts("bytes", "sr_hz")
        g = artifact_gates(p)
        return df.select(
            "clip_id",
            p["n_dropouts"].alias("nd"),
            p["dropout_ms"].alias("dm"),
            p["n_clicks"].alias("nc"),
            g["has_dropouts"].alias("hd"),
            g["clicky"].alias("ck"),
            g["artifact_ok"].alias("ok"),
        )

    want = sorted(tuple(r) for r in prof(batch).fillna(-9999.0).collect())
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        prof(stream).fillna(-9999.0)
        .writeStream.format("memory").queryName("q_dropout_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dropout"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.sql("SELECT * FROM q_dropout_stream").collect()
    )
    assert got == want and len(got) == 18


def test_fbank_streaming_parity(spark, tmp_path):
    """Log-mel feature extraction under readStream: stateless per-row
    transform + generate (posexplode), so the same compiled plan must
    emit bit-identical quantized features per micro-batch (north rule:
    one plan, batch and streaming)."""
    import pyspark.sql.functions as F

    from jsonschema_spark.functions.fbank import audio_fbank_stats
    from jsonschema_spark.sources.clips import synth_fbank_clips

    d = str(tmp_path / "f_clips")
    synth_fbank_clips(spark, 16, partitions=4).drop(
        "_row_idx", "_sumq", "_sumsqq", "_nfr", "_n",
    ).write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)

    def feats(df):
        s = audio_fbank_stats("bytes", "sr_hz")
        return df.select("clip_id", s.alias("s")).select(
            "clip_id",
            F.posexplode(F.arrays_zip("s.sum_q", "s.sumsq_q")).alias(
                "bin", "z"
            ),
        ).select(
            "clip_id", "bin",
            F.col("z.sum_q").alias("sq"),
            F.col("z.sumsq_q").alias("sq2"),
        )

    want = sorted(tuple(r) for r in feats(batch).collect())
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        feats(stream)
        .writeStream.format("memory").queryName("q_fbank_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_fbank"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.sql("SELECT * FROM q_fbank_stream").collect()
    )
    assert got == want and len(got) == 12 * 40  # 12 decodable clips


def test_train_tensors_streaming_parity(spark, tmp_path):
    """The one-hop training-tensor kernel is a stateless per-row
    transform, so the SAME compiled plan must produce bit-identical
    tensors (integers and doubles) under readStream — feature
    extraction can run as a continuous job on arriving shards."""
    from jsonschema_spark.functions.fbank import audio_train_tensors
    from jsonschema_spark.sources.clips import synth_fbank_mat_clips

    d = str(tmp_path / "tt_clips")
    raw = synth_fbank_mat_clips(spark, 24, partitions=3)
    raw.drop(*[c for c in raw.columns if c.startswith("_")]).write.mode(
        "overwrite"
    ).parquet(d)
    batch = spark.read.parquet(d)

    def tensors(df):
        s = audio_train_tensors("clip_id", "bytes", "sr_hz", seed="ep0")
        return df.select("clip_id", s.alias("s")).select(
            "clip_id",
            F.md5(F.to_json(F.col("s.mat_q"))).alias("h_mat"),
            F.md5(F.to_json(F.col("s.delta_q"))).alias("h_d"),
            F.md5(F.to_json(F.col("s.aug_q"))).alias("h_aug"),
            F.md5(F.to_json(F.col("s.x"))).alias("h_x"),
            F.col("s.n_frames").alias("n_frames"),
        )

    want = sorted(tuple(r) for r in tensors(batch).collect())
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        tensors(stream)
        .writeStream.format("memory").queryName("q_tt_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_tt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM q_tt_stream").collect()
    )
    assert got == want and len(got) == 24


def test_label_encoding_streaming_parity(spark, tmp_path):
    """encode_labels is pure Column algebra — identical id sequences
    under readStream (continuous label encoding on arriving shards)."""
    from jsonschema_spark.operators.labels import encode_labels
    from jsonschema_spark.sources.clips import synth_clips

    d = str(tmp_path / "lab_clips")
    synth_clips(spark, 60, partitions=3).write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)

    def enc(df):
        return encode_labels(df).select(
            "clip_id", "label_len", "oov_count",
            F.concat_ws(",", F.col("label_ids").cast("array<string>"))
            .alias("csv"),
        )

    want = sorted(tuple(r) for r in enc(batch).collect())
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        enc(stream)
        .writeStream.format("memory").queryName("q_lab_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_lab"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM q_lab_stream").collect()
    )
    assert got == want and len(got) == 60
