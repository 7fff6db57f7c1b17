"""Segmentation job (jobs/segment_clips_job.py): routed fan-out into
fixed training windows + one-pass report."""

from jsonschema_spark.sources.clips import synth_segment_clips


def test_segment_table_report_and_output(spark, tmp_path):
    from jobs.segment_clips_job import segment_table

    clips = synth_segment_clips(spark, 48).drop(
        "_row_idx", "_n_dec", "_seg_idxs", "_seg_ns", "_seg_md5s"
    )
    out = str(tmp_path / "segs")
    segs, stats = segment_table(clips, segment_ms=250, output=out)
    try:
        assert stats["clips"] == 48
        # torn-FLAC class is 1/6 of the corpus
        assert stats["undecodable_clips"] == 8
        assert stats["slice_segments"] + stats["decode_segments"] == stats[
            "segments"
        ]
        assert stats["slice_segments"] > 0 and stats["decode_segments"] > 0
        # every non-torn clip ends in a natural tail at these durations
        assert 0 < stats["short_tails"] <= stats["segments"]
        written = spark.read.parquet(out)
        assert written.count() == stats["segments"]
        assert written.where("seg_idx IS NULL").count() == 0
    finally:
        segs.unpersist()


def test_segment_job_cli_smoke(spark, tmp_path, capsys):
    import json

    from jobs.segment_clips_job import main

    out = str(tmp_path / "cli_segs")
    rc = main(
        [
            "--synthesize", "36",
            "--output", out,
            "--segment-ms", "250",
            "--min-tail-ms", "50",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["clips"] == 36 and stats["undecodable_clips"] == 6
    assert spark.read.parquet(out).count() == stats["segments"]


def test_segment_job_energy_flag(spark, tmp_path, capsys):
    import json

    from jobs.segment_clips_job import main

    out = str(tmp_path / "cli_energy")
    rc = main(["--synthesize", "36", "--output", out, "--energy"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the planted dead windows fire the gate through the CLI too
    assert stats["silent_segments"] > 0
    written = spark.read.parquet(out)
    assert {"seg_sumsq", "seg_peak", "silent"} <= set(written.columns)
    assert written.where("silent").count() == stats["silent_segments"]


def test_suite_audio_silence_check(spark):
    from jsonschema_spark.operators.suite import run_suite

    clips = synth_segment_clips(spark, 48).drop(
        "_row_idx", "_n_dec", "_seg_idxs", "_seg_ns", "_seg_md5s",
        "_seg_sumsqs", "_seg_peaks",
    )
    report = run_suite(
        {"clips": clips},
        {"checks": [
            # the corpus plants dead windows in ~1/4 of clips: a zero
            # ceiling must FAIL (the gate is seen firing) ...
            {"type": "audio_silence", "name": "no_dead_air",
             "table": "clips", "max_silent_rate": 0.0},
            # ... and a generous ceiling must pass
            {"type": "audio_silence", "name": "bounded_dead_air",
             "table": "clips", "max_silent_rate": 0.5},
        ]},
    ).collect()
    by = {r.check_name: r for r in report}
    assert by["no_dead_air"].status == "fail"
    assert by["bounded_dead_air"].status == "pass"
    assert 0.0 < by["no_dead_air"].metric <= 0.5


def test_suggest_drafts_audio_silence(spark):
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.operators.suggest import (
        as_suite_config,
        column_suggestions,
    )

    clips = synth_segment_clips(spark, 36).drop(
        "_row_idx", "_n_dec", "_seg_idxs", "_seg_ns", "_seg_md5s",
        "_seg_sumsqs", "_seg_peaks",
    )
    cfg = as_suite_config(
        clips, column_suggestions(clips, ["clip_id", "codec"]), "clips"
    )
    silence = [c for c in cfg["checks"] if c["type"] == "audio_silence"]
    assert len(silence) == 1
    # the drafted suite must pass on the data it was drafted from
    report = run_suite({"clips": clips}, {"checks": silence}).collect()
    assert report[0].status == "pass"


def test_profile_job_audio_section(spark):
    from jobs.profile_job import profile_table

    clips = synth_segment_clips(spark, 36).drop(
        "_row_idx", "_n_dec", "_seg_idxs", "_seg_ns", "_seg_md5s",
        "_seg_sumsqs", "_seg_peaks",
    )
    prof = profile_table(clips)
    audio = {r.metric: r.value_num
             for r in prof.where("section = 'audio'").collect()}
    assert set(audio) >= {"riff_frac", "flac_frac", "null_frac",
                          "decode_rate", "silent_seg_rate",
                          "lufs_measurable_frac", "true_peak_over_rate"}
    # loudness section: decodable >=400ms clips are measurable; a sane
    # corpus sits between always and never
    assert 0.0 < audio["lufs_measurable_frac"] <= 5 / 6 + 0.02
    if "lufs_integrated_median" in audio:
        assert -70.0 < audio["lufs_integrated_median"] < 0.0
    # torn-FLAC class is 1/6: decode rate 5/6; classes 0+5 are FLAC (2/6),
    # classes 1/2/3 are RIFF (3/6); planted dead windows keep the silent
    # rate strictly inside (0, 0.5)
    assert abs(audio["decode_rate"] - 5 / 6) < 0.02
    assert abs(audio["flac_frac"] - 2 / 6) < 0.02
    assert abs(audio["riff_frac"] - 3 / 6) < 0.02
    assert 0.0 < audio["silent_seg_rate"] < 0.5
    # container-dispatch section: same decodability through the unified
    # sniff; no MP3/Ogg in this corpus; hum screen counts at least the
    # torn class as violating
    assert set(audio) >= {"container_ok_rate", "container_meta_ok_rate",
                          "mp3_frac", "ogg_frac", "hum_dc_violation_rate"}
    assert abs(audio["container_ok_rate"] - 5 / 6) < 0.02
    assert audio["mp3_frac"] == 0.0 and audio["ogg_frac"] == 0.0
    assert audio["hum_dc_violation_rate"] >= 1 / 6 - 0.02


def test_codec_partitioned_corpus_prunes_router_branches(spark, tmp_path):
    """The scale claim in segment_auto's docstring, proven: over a corpus
    PARTITIONED BY codec, each router branch's codec predicate becomes a
    PartitionFilter — the slice branch reads only codec=pcm_s16le files,
    the decode branch only the rest."""
    from jsonschema_spark.operators.segments import segment_auto

    clips = synth_segment_clips(spark, 36).drop(
        "_row_idx", "_n_dec", "_seg_idxs", "_seg_ns", "_seg_md5s",
        "_seg_sumsqs", "_seg_peaks",
    )
    p = str(tmp_path / "by_codec")
    clips.write.partitionBy("codec").parquet(p)
    part = spark.read.parquet(p)
    plan = (
        segment_auto(part, 250)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # slice branch prunes TO codec=pcm_s16le, decode branch prunes it OUT
    assert re.search(
        r"PartitionFilters: \[coalesce\(\(codec#\d+ = pcm_s16le\)", plan
    )
    assert re.search(
        r"PartitionFilters: \[NOT coalesce\(\(codec#\d+ = pcm_s16le\)",
        plan,
    )
    assert "Exchange" not in plan
    # and the routed output over the partitioned table still matches the
    # unpartitioned routing
    a = sorted(
        (r.clip_id, r.seg_idx, r.seg_path)
        for r in segment_auto(part, 250)
        .select("clip_id", "seg_idx", "seg_path")
        .collect()
    )
    b = sorted(
        (r.clip_id, r.seg_idx, r.seg_path)
        for r in segment_auto(clips, 250)
        .select("clip_id", "seg_idx", "seg_path")
        .collect()
    )
    assert a == b


def test_segment_job_partition_by(spark, tmp_path, capsys):
    import os

    from jobs.segment_clips_job import main

    out = str(tmp_path / "parted")
    rc = main(["--synthesize", "24", "--output", out,
               "--partition-by", "codec"])
    assert rc == 0
    subdirs = {d for d in os.listdir(out) if d.startswith("codec=")}
    assert "codec=pcm_s16le" in subdirs and len(subdirs) >= 4
