"""Decode-then-segment (operators/segments.segment_decoded +
functions/audio.segment_pcm): the O(clip) decode runs exactly once per
clip inside one Arrow hop, the per-segment fan-out stays JVM-side
(posexplode_outer), and concatenating the segments in index order must
reproduce the full decoded stream byte-for-byte."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from jsonschema_spark.functions.audio import (
    decode_payload,
    encode_wav_adpcm,
    pcm16_from_float,
    reference_signal,
    segment_pcm_batch,
)
from jsonschema_spark.functions.flac import encode_flac


def _pcm(n: int, tag: str = "segdec") -> np.ndarray:
    return pcm16_from_float(reference_signal(tag, n))


def test_kernel_segments_concat_to_full_decode():
    pcm = _pcm(4800)
    raw = encode_flac(pcm.astype(np.int64), 16000)
    out = segment_pcm_batch(
        pd.Series([raw]), pd.Series([16000]), segment_ms=250
    )
    segs = out["segs"][0]
    # 4800 samples @ 16 kHz / 250 ms windows (4000 samples) -> 2 segments
    assert len(segs) == 2
    assert [len(s) // 2 for s in segs] == [4000, 800]
    assert b"".join(segs) == pcm.astype("<i2").tobytes()
    assert out["n_samples"][0] == 4800


def test_kernel_exact_multiple_has_no_empty_tail():
    pcm = _pcm(8000)
    out = segment_pcm_batch(
        pd.Series([pcm.astype("<i2").tobytes()]),
        pd.Series([16000]),
        segment_ms=250,
    )
    assert [len(s) // 2 for s in out["segs"][0]] == [4000, 4000]


def test_kernel_lossy_segments_match_decode_fixpoint():
    pcm = _pcm(5000)
    raw = encode_wav_adpcm(pcm, 8000)
    dec = np.clip(decode_payload(raw), -32768, 32767).astype("<i2")
    out = segment_pcm_batch(pd.Series([raw]), pd.Series([8000]), 250)
    assert b"".join(out["segs"][0]) == dec.tobytes()


def test_kernel_undecodable_and_null_rows_are_loud():
    pcm = _pcm(3000)
    torn = encode_flac(pcm.astype(np.int64), 16000)[:-7]
    out = segment_pcm_batch(
        pd.Series([torn, None, b"\x01\x02"]),
        pd.Series([16000, 16000, None]),
        segment_ms=250,
    )
    assert out["segs"][0] is None and out["n_samples"][0] == -1
    assert out["segs"][1] is None and out["n_samples"][1] == -1
    assert out["segs"][2] is None and out["n_samples"][2] == -1


def test_segment_pcm_rejects_nonpositive_window():
    from jsonschema_spark.functions.audio import segment_pcm

    with pytest.raises(ValueError):
        segment_pcm("bytes", "sr_hz", 0)


@pytest.fixture(scope="module")
def seg_df(spark):
    from jsonschema_spark.operators.segments import segment_decoded

    pcm = _pcm(4800)
    rows = [
        Row(
            clip_id="c0",
            bytes=bytearray(encode_flac(pcm.astype(np.int64), 16000)),
            sr_hz=16000,
            codec="flac",
        ),
        Row(
            clip_id="c1",
            bytes=bytearray(pcm.astype("<i2").tobytes()),
            sr_hz=16000,
            codec="pcm_s16le",
        ),
        Row(
            clip_id="c2",
            bytes=bytearray(
                encode_flac(pcm.astype(np.int64), 16000)[:-7]
            ),
            sr_hz=16000,
            codec="flac",
        ),
    ]
    df = spark.createDataFrame(rows)
    return segment_decoded(df, segment_ms=250).orderBy(
        "clip_id", "seg_idx"
    )


def test_operator_rows_and_boundaries(spark, seg_df):
    got = seg_df.collect()
    by_clip = {}
    for r in got:
        by_clip.setdefault(r.clip_id, []).append(r)
    # 4800 @ 16k / 250ms -> [4000, 800]
    assert [r.seg_n_samples for r in by_clip["c0"]] == [4000, 800]
    assert [r.seg_start_sample for r in by_clip["c0"]] == [0, 4000]
    assert [r.segment_id for r in by_clip["c0"]] == [
        "c0#00000",
        "c0#00001",
    ]
    assert all(r.n_samples == 4800 for r in by_clip["c0"])
    # raw PCM and FLAC of the same source segment identically
    a = [bytes(r.seg_bytes) for r in by_clip["c0"]]
    b = [bytes(r.seg_bytes) for r in by_clip["c1"]]
    assert a == b
    # torn clip: exactly one loud NULL row
    (r2,) = by_clip["c2"]
    assert r2.seg_idx is None and r2.seg_bytes is None
    assert r2.segment_id is None and r2.n_samples == -1


def test_operator_min_tail_drop(spark):
    from jsonschema_spark.operators.segments import segment_decoded

    pcm = _pcm(4800)
    df = spark.createDataFrame(
        [
            Row(
                clip_id="c0",
                bytes=bytearray(pcm.astype("<i2").tobytes()),
                sr_hz=16000,
                codec="pcm_s16le",
            )
        ]
    )
    out = segment_decoded(df, segment_ms=250, min_tail_ms=100).collect()
    # the 800-sample (50 ms) tail is below the 100 ms floor
    assert [r.seg_n_samples for r in out] == [4000]


def test_operator_matches_ledger(spark):
    from jsonschema_spark.operators.segments import segment_decoded
    from jsonschema_spark.sources.clips import (
        SEGD_SEG_MS,
        synth_segment_clips,
    )

    clips = synth_segment_clips(spark, 48).cache()
    try:
        got = segment_decoded(clips, segment_ms=SEGD_SEG_MS).select(
            "clip_id",
            "seg_idx",
            "seg_n_samples",
            "n_samples",
            F.md5(F.upper(F.hex("seg_bytes"))).alias("seg_md5"),
        )
        exp = clips.select(
            "clip_id",
            F.col("_n_dec").alias("n_samples"),
            F.posexplode_outer(
                F.arrays_zip("_seg_idxs", "_seg_ns", "_seg_md5s")
            ).alias("_p", "z"),
        ).select(
            "clip_id",
            F.col("z._seg_idxs").alias("seg_idx"),
            F.col("z._seg_ns").alias("seg_n_samples"),
            "n_samples",
            F.col("z._seg_md5s").alias("seg_md5"),
        )
        assert got.exceptAll(exp).count() == 0
        assert exp.exceptAll(got).count() == 0
    finally:
        clips.unpersist()


def test_plan_one_arrow_hop_one_generate_no_exchange(spark):
    # decode UDF evaluated once; fan-out is JVM-side; zero shuffle
    from jsonschema_spark.operators.segments import segment_decoded

    pcm = _pcm(4800)
    df = spark.createDataFrame(
        [
            Row(
                clip_id="c0",
                bytes=bytearray(pcm.astype("<i2").tobytes()),
                sr_hz=16000,
                codec="pcm_s16le",
            )
        ]
    )
    plan = (
        segment_decoded(df, segment_ms=250, min_tail_ms=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "Generate" in plan
    assert "Exchange" not in plan


def _mixed_df(spark):
    pcm = _pcm(4800)
    return spark.createDataFrame(
        [
            Row(
                clip_id="raw0",
                bytes=bytearray(pcm.astype("<i2").tobytes()),
                sr_hz=16000,
                codec="pcm_s16le",
            ),
            Row(
                clip_id="flac0",
                bytes=bytearray(encode_flac(pcm.astype(np.int64), 16000)),
                sr_hz=16000,
                codec="flac",
            ),
        ]
    )


def test_auto_routes_and_paths_agree_bytewise(spark):
    from jsonschema_spark.operators.segments import segment_auto

    out = segment_auto(_mixed_df(spark), segment_ms=250).collect()
    by = {}
    for r in out:
        by.setdefault(r.clip_id, []).append(r)
    assert {r.seg_path for r in by["raw0"]} == {"slice"}
    assert {r.seg_path for r in by["flac0"]} == {"decode"}
    # FLAC is lossless: both paths must emit identical segment bytes
    a = [bytes(r.seg_bytes) for r in sorted(by["raw0"], key=lambda r: r.seg_idx)]
    b = [bytes(r.seg_bytes) for r in sorted(by["flac0"], key=lambda r: r.seg_idx)]
    assert a == b
    assert [r.seg_n_samples for r in sorted(by["raw0"], key=lambda r: r.seg_idx)] == [4000, 800]


def test_auto_matches_decoded_on_edge_rows(spark):
    from jsonschema_spark.operators.segments import (
        segment_auto,
        segment_decoded,
    )

    edge = spark.createDataFrame(
        [
            # odd length = malformed pcm_s16le -> loud on BOTH paths
            Row(clip_id="odd", bytes=bytearray(b"\x01\x02\x03"),
                sr_hz=8000, codec="pcm_s16le"),
            Row(clip_id="empty", bytes=bytearray(b""),
                sr_hz=8000, codec="pcm_s16le"),
            Row(clip_id="nullp", bytes=None, sr_hz=8000,
                codec="pcm_s16le"),
            Row(clip_id="nullsr", bytes=bytearray(b"\x01\x02"),
                sr_hz=None, codec="pcm_s16le"),
            # NULL codec must be sniffed -> decode path
            Row(clip_id="nullcodec", bytes=bytearray(b"\x01\x02\x03\x04"),
                sr_hz=8000, codec=None),
        ]
    )
    cols = ["clip_id", "seg_idx", "seg_n_samples", "n_samples"]
    a = segment_auto(edge, 250).select(
        *cols, F.md5(F.upper(F.hex("seg_bytes"))).alias("m")
    )
    d = segment_decoded(edge, 250).select(
        *cols, F.md5(F.upper(F.hex("seg_bytes"))).alias("m")
    )
    assert a.exceptAll(d).count() == 0
    assert d.exceptAll(a).count() == 0
    paths = {r.clip_id: r.seg_path
             for r in segment_auto(edge, 250).collect()}
    assert paths["nullcodec"] == "decode"


def test_auto_min_tail_consistent_across_paths(spark):
    from jsonschema_spark.operators.segments import segment_auto

    out = segment_auto(
        _mixed_df(spark), segment_ms=250, min_tail_ms=100
    ).collect()
    # the 800-sample (50 ms) tail drops on BOTH paths
    assert sorted(r.seg_n_samples for r in out) == [4000, 4000]


def test_auto_plan_slice_branch_is_jvm_only(spark, tmp_path):
    from jsonschema_spark.operators.segments import segment_auto

    p = str(tmp_path / "mixed")
    _mixed_df(spark).write.parquet(p)
    df = spark.read.parquet(p)
    plan = (
        segment_auto(df, segment_ms=250)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one Arrow hop total (decode branch only), zero shuffle, and both
    # branch predicates pushed into their parquet scans
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
    assert "PushedFilters" in plan and "pcm_s16le" in plan


def test_pcm_energy_kernel_exact_and_loud():
    from jsonschema_spark.functions.audio import pcm_energy_batch

    w = np.array([3, -4, 0, 32767], dtype="<i2")
    out = pcm_energy_batch(
        pd.Series([w.tobytes(), None, b"\x01\x02\x03", b""])
    )
    assert int(out["sumsq"][0]) == 9 + 16 + 0 + 32767 * 32767
    assert int(out["peak"][0]) == 32767
    assert out["sumsq"][1] is pd.NA and out["peak"][1] is pd.NA
    # odd trailing byte = malformed PCM16 -> loud NULL, not a floor
    assert out["sumsq"][2] is pd.NA
    assert int(out["sumsq"][3]) == 0 and int(out["peak"][3]) == 0


def test_segment_energy_silence_gate_and_ledger(spark):
    from jsonschema_spark.operators.segments import (
        segment_auto,
        segment_energy,
    )
    from jsonschema_spark.sources.clips import (
        SEGD_SEG_MS,
        synth_segment_clips,
    )

    clips = synth_segment_clips(spark, 48).cache()
    try:
        got = segment_energy(
            segment_auto(clips, segment_ms=SEGD_SEG_MS)
        ).select("clip_id", "seg_idx", "seg_sumsq", "seg_peak", "silent")
        exp = clips.select(
            "clip_id",
            F.posexplode_outer(
                F.arrays_zip("_seg_idxs", "_seg_ns", "_seg_sumsqs",
                             "_seg_peaks")
            ).alias("_p", "z"),
        ).select(
            "clip_id",
            F.col("z._seg_idxs").alias("seg_idx"),
            F.col("z._seg_sumsqs").alias("seg_sumsq"),
            F.col("z._seg_peaks").alias("seg_peak"),
            (F.col("z._seg_sumsqs") < F.col("z._seg_ns") * 16).alias(
                "silent"
            ),
        )
        assert got.exceptAll(exp).count() == 0
        assert exp.exceptAll(got).count() == 0
        # the planted dead windows must FIRE the gate (seen firing), and
        # torn rows must stay three-valued (NULL, not quietly False)
        assert got.where("silent").count() > 0
        assert got.where("seg_idx IS NULL AND silent IS NULL").count() > 0
    finally:
        clips.unpersist()


def test_validate_segments_flags_only_torn_class(spark):
    from __spark_entry__ import SEGMENTS_JSON_SCHEMA
    from jsonschema_spark.operators.segments import segment_auto
    from jsonschema_spark.operators.validate import validate
    from jsonschema_spark.sources.clips import (
        SEGD_CLASS_MOD,
        SEGD_CLS_TORN,
        SEGD_SEG_MS,
        synth_segment_clips,
    )

    clips = synth_segment_clips(spark, 48).cache()
    try:
        seg = segment_auto(
            clips.drop("_n_dec", "_seg_idxs", "_seg_ns", "_seg_md5s",
                       "_seg_sumsqs", "_seg_peaks", "_row_idx"),
            segment_ms=SEGD_SEG_MS,
        ).drop("seg_bytes")
        v = validate(seg, SEGMENTS_JSON_SCHEMA).violations(
            ["clip_id", "seg_idx"]
        )
        rows = v.collect()
        torn = {f"clip-{i:012d}" for i in range(48)
                if i % SEGD_CLASS_MOD == SEGD_CLS_TORN}
        assert {r.clip_id for r in rows} == torn
        # each torn clip: required x3 + minimum(n_samples)
        assert len(rows) == 4 * len(torn)
        assert {r.keyword for r in rows} == {"required", "minimum"}
    finally:
        clips.unpersist()


def test_transcript_windows_reassemble_across_router(spark):
    from jsonschema_spark.operators.segments import segment_auto
    from jsonschema_spark.sources.clips import (
        SEGD_SEG_MS,
        synth_segment_clips,
    )

    clips = synth_segment_clips(spark, 36).cache()
    try:
        seg = segment_auto(
            clips, segment_ms=SEGD_SEG_MS, transcript_col="transcript"
        )
        ok = seg.where("seg_idx IS NOT NULL")
        rebuilt = ok.groupBy("clip_id").agg(
            F.concat_ws(
                "",
                F.array_sort(
                    F.collect_list(
                        F.struct("seg_idx", "seg_transcript")
                    )
                ).getField("seg_transcript"),
            ).alias("rebuilt")
        )
        chk = rebuilt.join(
            clips.select("clip_id", "transcript"), "clip_id"
        )
        # integer-floor boundaries are monotone + exhaustive: exact
        assert chk.where("rebuilt <> transcript").count() == 0
        # torn clips carry NULL, never a misaligned window
        assert (
            seg.where("seg_idx IS NULL")
            .where("seg_transcript IS NOT NULL")
            .count()
            == 0
        )
        # both router paths emit windows
        paths = {
            r.seg_path
            for r in ok.where("seg_transcript IS NOT NULL")
            .select("seg_path")
            .distinct()
            .collect()
        }
        assert paths == {"slice", "decode"}
    finally:
        clips.unpersist()
