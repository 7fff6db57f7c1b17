"""Codec-label agreement gate (containers.codec_match_gate; suite
check audio_codec).

The codec COLUMN is metadata someone typed; the payload's magic bytes
are ground truth. Anchors: truthful labels certify across every
container family (including the legitimate multi-container codecs —
G.711 in WAV and AU, bare PCM as WAV or headerless blob), wrong-family
lies and unknown labels ("amr") gate False, NULLs gate False.
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from jsonschema_spark.functions.containers import (
    CODEC_ACCEPT,
    codec_match_gate,
    codec_matches_container,
)


def test_python_truth_table():
    assert codec_matches_container("flac", "flac")
    assert codec_matches_container(" FLAC ", "flac")  # trim + case
    assert codec_matches_container("flac", "flac-synth")
    assert codec_matches_container("pcm_s16le", "wav")
    assert codec_matches_container("pcm_s16le", "raw")
    assert codec_matches_container("ulaw", "wav")
    assert codec_matches_container("ulaw", "au")
    assert codec_matches_container("opus", "ogg")
    assert codec_matches_container("vorbis", "ogg")
    assert not codec_matches_container("opus", "raw")
    assert not codec_matches_container("wav", "flac")
    assert not codec_matches_container("amr", "wav")
    assert not codec_matches_container(None, "wav")
    assert not codec_matches_container("flac", None)


def test_gate_matches_python_on_all_pairs(spark):
    """The Spark when-chain and the Python mapping must agree on every
    (label, container) pair — including unknown labels and NULLs."""
    containers = sorted(
        {c for cs in CODEC_ACCEPT.values() for c in cs}
    ) + ["weird", None]
    labels = sorted(CODEC_ACCEPT) + ["amr", "  FLAC ", None]
    rows = [(lab, con) for lab in labels for con in containers]
    df = spark.createDataFrame(rows, "codec string, container string")
    got = df.select(
        "codec", "container",
        codec_match_gate(
            F.struct(F.col("container").alias("container")), "codec"
        ).alias("ok"),
    ).collect()
    for r in got:
        assert r["ok"] == codec_matches_container(
            r["codec"], r["container"]
        ), (r["codec"], r["container"])


def test_codec_ledger_corpus_verifies(spark):
    from jsonschema_spark.functions.containers import (
        audio_container_profile,
    )
    from jsonschema_spark.sources.clips import synth_codec_clips

    clips = synth_codec_clips(spark, 40)
    prof = clips.select(
        "_row_idx", "codec", "_container", "_codec_ok",
        audio_container_profile("bytes").alias("p"),
    )
    rows = prof.select(
        "*", codec_match_gate(F.col("p"), "codec").alias("ok")
    ).collect()
    assert len(rows) == 40
    n_lie = n_amr = 0
    for r in rows:
        assert r["ok"] == r["_codec_ok"], r["_row_idx"]
        assert r["p"]["container"] == r["_container"], r["_row_idx"]
        if r["_row_idx"] % 8 == 5:
            assert r["codec"] == "amr" and r["_codec_ok"] is False
            n_amr += 1
        elif r["_row_idx"] % 4 == 1:
            assert r["_codec_ok"] is False, r["_row_idx"]
            n_lie += 1
        else:
            assert r["_codec_ok"] is True, r["_row_idx"]
    assert n_amr == 5 and n_lie == 5


def test_audio_codec_suite_check(spark):
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import synth_codec_clips

    clips = synth_codec_clips(spark, 40)
    cfg = {
        "checks": [
            {"name": "codec", "type": "audio_codec", "table": "clips",
             "max_violation_rate": 0.0},
            {"name": "codec_loose", "type": "audio_codec",
             "table": "clips", "max_violation_rate": 0.26},
        ]
    }
    rep = {
        r["check_name"]: r
        for r in run_suite({"clips": clips}, cfg).collect()
    }
    # 10 of 40 rows lie -> rate 0.25
    assert rep["codec"]["status"] == "fail"
    assert rep["codec_loose"]["status"] == "pass"
    assert abs(rep["codec"]["metric"] - 0.25) < 1e-9


def test_suggest_drafts_audio_codec(spark):
    """Audio-shaped tables WITH a codec column draft an audio_codec
    check anchored to the MEASURED disagreement rate."""
    from jsonschema_spark.operators.suggest import (
        as_suite_config,
        column_suggestions,
    )
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import synth_codec_clips

    clips = synth_codec_clips(spark, 40).drop(
        "_row_idx", "_container", "_ok", "_rate", "_channels", "_n",
        "_pdur", "_rate_ok", "_dur_ok", "_meta_ok", "_codec_ok",
    )
    cfg = as_suite_config(
        clips, column_suggestions(clips, ["clip_id", "sr_hz"]),
        table="clips",
    )
    cc = [c for c in cfg["checks"] if c["type"] == "audio_codec"]
    assert len(cc) == 1
    assert cc[0]["max_violation_rate"] >= 0.25
    rep = run_suite({"clips": clips}, {"checks": cc}).collect()
    assert rep[0]["status"] == "pass"
