"""A/V demux CLI (jobs/demux_av_job.py): videos in, audio-clips +
sampled-frames tables out; the audio table feeds the engine's audio
chain unchanged; broken files land in the report, never silently
dropped."""

import json

from pyspark.sql import functions as F

from jobs.demux_av_job import demux_table, main
from jsonschema_spark.sources.videos import (
    AV_CLS_MOD,
    AV_SILENT_CLS,
    AV_TORN_CLS,
    synth_av_videos,
)


def test_demux_report_and_outputs(spark, tmp_path, capsys):
    n = 4 * AV_CLS_MOD
    rc = main([
        "--synthesize", str(n),
        "--audio", str(tmp_path / "a"),
        "--frames", str(tmp_path / "f"),
        "--every-n", "2",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_torn = n // AV_CLS_MOD
    n_silent = n // AV_CLS_MOD
    assert rep["videos"] == n
    assert rep["ok_videos"] == n - n_torn
    assert rep["videos_with_audio"] == n - n_silent
    assert rep["audio_clips"] == n - n_silent
    assert rep["failed_frames"] == 0  # sampling uses actual counts here

    audio = spark.read.parquet(str(tmp_path / "a"))
    assert set(audio.columns) == {"clip_id", "bytes", "sr_hz", "dur_ms",
                                  "codec"}
    # the demuxed table flows through the audio chain unchanged:
    # every payload decodes (raw pcm_s16le) with the expected length
    from jsonschema_spark.functions.audio import audio_quality

    q = audio.select(
        "clip_id", "sr_hz",
        audio_quality("bytes", "sr_hz").alias("q"),
    ).collect()
    assert len(q) == n - n_silent
    for r in q:
        assert r["q"]["n_samples"] is not None and r["q"]["n_samples"] > 0

    frames = spark.read.parquet(str(tmp_path / "f"))
    assert frames.where(~F.col("decode_ok")).count() == 0
    assert frames.count() == rep["sampled_frames"]


def test_demux_table_embeddable(spark, tmp_path):
    vids = synth_av_videos(spark, AV_CLS_MOD)
    rep = demux_table(vids, str(tmp_path / "a2"), str(tmp_path / "f2"))
    assert rep["videos"] == AV_CLS_MOD
    assert rep["audio_clips"] == AV_CLS_MOD - 1  # one video-only class
