"""Audio segmentation (operators/segments.py) — pure Column algebra."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.functions.audio import (
    decode_payload,
    encode_payload,
    encode_wav_pcm16,
    pcm16_from_float,
)
from jsonschema_spark.operators.segments import segment_clips, segment_summary


def _clip(i: int, n_samples: int, codec: str = "pcm_s16le"):
    x = 0.4 * np.sin(2 * np.pi * 220.0 * np.arange(n_samples) / 16000.0 + i)
    pcm = pcm16_from_float(x)
    payload = (
        encode_wav_pcm16(pcm, 16000) if codec == "wav" else encode_payload(pcm, codec)
    )
    return (f"c{i}", payload, 16000, n_samples * 1000 // 16000, codec)


@pytest.fixture(scope="module")
def clips(spark):
    rows = [
        _clip(0, 16000),            # exactly 10 x 100ms
        _clip(1, 16250),            # 10 full + 1 partial (250 samples = 15ms)
        _clip(2, 800),              # single partial segment (50ms)
        _clip(3, 4000, codec="wav"),  # container: not sliceable
    ]
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    )


def test_segment_counts_and_durations(clips):
    segs = segment_clips(clips, 100)
    summ = {r["clip_id"]: r for r in segment_summary(segs).collect()}
    assert summ["c0"]["n_segments"] == 10 and summ["c0"]["total_ms"] == 1000
    assert summ["c1"]["n_segments"] == 11
    assert summ["c2"]["n_segments"] == 1 and summ["c2"]["total_ms"] == 50
    assert summ["c3"]["n_segments"] == 1 and not summ["c3"]["sliceable"]


def test_segments_reassemble_exactly(clips):
    """Concatenated segment decodes == whole-payload decode, per clip."""
    segs = segment_clips(clips, 100).collect()
    payloads = {r["clip_id"]: bytes(r["bytes"]) for r in clips.collect()}
    by_clip: dict = {}
    for r in segs:
        by_clip.setdefault(r["clip_id"], []).append(r)
    for cid, rows in by_clip.items():
        rows.sort(key=lambda r: r["seg_idx"])
        cat = np.concatenate([decode_payload(bytes(r["seg_bytes"])) for r in rows])
        assert np.array_equal(cat, decode_payload(payloads[cid])), cid


def test_segment_offsets(clips):
    segs = {
        (r["clip_id"], r["seg_idx"]): r
        for r in segment_clips(clips, 100).collect()
    }
    assert segs[("c1", 10)]["seg_start_ms"] == 1000
    assert segs[("c1", 10)]["seg_dur_ms"] == 15
    assert len(bytes(segs[("c1", 10)]["seg_bytes"])) == 500  # 250 samples
    assert segs[("c0", 3)]["seg_start_ms"] == 300


def test_min_tail_drops_short_tails(clips):
    segs = segment_clips(clips, 100, min_tail_ms=20)
    ids = {(r["clip_id"], r["seg_idx"]) for r in segs.collect()}
    assert ("c1", 10) not in ids   # 15ms tail dropped
    assert ("c2", 0) in ids        # 50ms single segment kept
    assert ("c3", 0) in ids        # non-sliceable passthrough exempt


def test_empty_payload_yields_no_segments(spark):
    df = spark.createDataFrame(
        [("e", b"", 16000, 0, "pcm_s16le")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
    )
    assert segment_clips(df, 100).count() == 0


def test_no_python_in_plan(clips):
    plan = segment_clips(clips, 100)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_segment_ms_validation(clips):
    with pytest.raises(ValueError):
        segment_clips(clips, 0)


def test_null_sr_pcm_passes_through_whole(spark):
    """A PCM row with NULL sample rate cannot be windowed — it must pass
    through as one whole unsliceable segment, never emit NULL slices."""
    df = spark.createDataFrame(
        [("n", b"\x01\x02\x03\x04", None, 100, "pcm_s16le")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
    )
    rows = segment_clips(df, 100).collect()
    assert len(rows) == 1
    r = rows[0]
    assert not r["sliceable"]
    assert bytes(r["seg_bytes"]) == b"\x01\x02\x03\x04"


def test_segment_transcript_alignment(clips):
    """seg_transcript slices are proportional char windows that reassemble
    the transcript exactly; non-sliceable rows carry the whole text."""
    withtx = clips.withColumn(
        "transcript", F.concat(F.lit("transcript of "), F.col("clip_id"))
    )
    segs = segment_clips(withtx, 100, transcript_col="transcript").collect()
    tx = {r["clip_id"]: r["transcript"] for r in withtx.collect()}
    by_clip: dict = {}
    for r in segs:
        by_clip.setdefault(r["clip_id"], []).append(r)
    for cid, rows in by_clip.items():
        rows.sort(key=lambda r: r["seg_idx"])
        if rows[0]["sliceable"]:
            assert "".join(r["seg_transcript"] for r in rows) == tx[cid], cid
        else:
            assert rows[0]["seg_transcript"] == tx[cid]
    # proportionality: clip c0 = 10 equal segments over an even split
    c0 = sorted(by_clip["c0"], key=lambda r: r["seg_idx"])
    n = len(tx["c0"])
    for r in c0:
        lo = r["seg_idx"] * 1600 * n // 16000
        hi = min((r["seg_idx"] + 1) * 1600, 16000) * n // 16000
        assert r["seg_transcript"] == tx["c0"][lo:hi]


def test_segment_transcript_nulls(spark):
    rows = [("cN", _clip(9, 1600)[1], 16000, 100, "pcm_s16le", None)]
    df = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
        "transcript string",
    )
    segs = segment_clips(df, 50, transcript_col="transcript").collect()
    assert all(r["seg_transcript"] is None for r in segs)
