"""Snippet extraction job (jobs/snippet_clips_job.py): fixed training
windows in one scan + one Arrow hop, seeked where the container allows."""

import numpy as np

from jsonschema_spark.functions.audio import (
    encode_wav_pcm,
    pcm16_from_float,
    reference_signal,
)
from jsonschema_spark.functions.flac import encode_flac


def _clips(spark):
    rows = []
    n = 16000 * 2000 // 1000  # 2 s clips
    for i in range(6):
        cid = f"clip-{i:012d}"
        pcm = pcm16_from_float(reference_signal(cid, n))
        if i % 3 == 0:
            raw = encode_flac(pcm, 16000, seek_every=4)
        elif i % 3 == 1:
            raw = encode_wav_pcm(pcm, 16000)
        else:
            raw = pcm.astype("<i2").tobytes()
        rows.append((cid, bytearray(raw), 16000, 2000, "x", None))
    rows.append(("clip-null", None, 16000, 2000, "x", None))
    return spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )


def test_snippet_extraction_matches_source(spark):
    from jobs.snippet_clips_job import snippet_clips

    clips = _clips(spark)
    snips, stats = snippet_clips(clips, off_frac=0.4, win_ms=250)
    assert stats["input_rows"] == 7
    assert stats["extracted"] == 6 and stats["decode_failed"] == 1
    assert stats["short_windows"] == 0
    out = {r["clip_id"]: r for r in snips.collect()}
    # off = floor(2000 * 0.4) = 800 ms -> sample 12800; win = 4000 samples
    for i in range(6):
        cid = f"clip-{i:012d}"
        pcm = pcm16_from_float(reference_signal(cid, 32000)).astype(np.int64)
        got = np.frombuffer(bytes(out[cid]["bytes"]), dtype="<i2")
        assert np.array_equal(got.astype(np.int64), pcm[12800:16800]), cid
        assert out[cid]["n_out"] == 4000 and out[cid]["snip_ms"] == 250
    snips.unpersist()


def test_snippet_tail_clamp_and_abs_offset(spark):
    from jobs.snippet_clips_job import snippet_clips

    clips = _clips(spark)
    # absolute offset 1900 ms on a 2000 ms clip -> only 100 ms available
    snips, stats = snippet_clips(clips, off_ms=1900, win_ms=250)
    assert stats["extracted"] == 6
    assert stats["short_windows"] == 6
    for r in snips.collect():
        assert 0 < r["n_out"] <= 1600  # 100 ms of samples, clamped
    snips.unpersist()


def test_snippet_job_cli(spark, tmp_path, capsys):
    import json

    from jobs.snippet_clips_job import main

    src = str(tmp_path / "clips")
    _clips(spark).where("bytes is not null").write.parquet(src)
    out = str(tmp_path / "snips")
    assert main(["--input", src, "--output", out, "--win-ms", "200"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["extracted"] == 6 and stats["win_ms"] == 200
    back = spark.read.parquet(out)
    assert back.count() == 6
    assert set(back.columns) >= {"clip_id", "bytes", "sr_hz", "n_out",
                                 "snip_ms"}
