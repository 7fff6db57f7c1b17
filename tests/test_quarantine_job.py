"""Quarantine split-writer (jobs/quarantine_job.py): one validated scan ->
valid parquet + violation-annotated quarantine parquet + JSON report."""

import json

from pyspark.sql import Row

from jobs.quarantine_job import split_quarantine

SCHEMA = {
    "type": "object",
    "properties": {
        "id": {"type": "integer", "minimum": 0},
        "status": {"enum": ["O", "F", "P"]},
        "amount": {"type": "number", "exclusiveMinimum": 0},
    },
    "required": ["id", "status", "amount"],
}


def _rows():
    return [
        Row(id=1, status="O", amount=10.0),
        Row(id=2, status="F", amount=5.5),
        Row(id=-3, status="O", amount=1.0),   # minimum violation
        Row(id=4, status="X", amount=2.0),    # enum violation
        Row(id=5, status="P", amount=0.0),    # exclusiveMinimum violation
        Row(id=6, status=None, amount=3.0),   # required violation
    ]


def test_split_quarantine(spark):
    df = spark.createDataFrame(_rows())
    valid, quarantine, annotated = split_quarantine(df, SCHEMA)
    try:
        ok = sorted(r.id for r in valid.collect())
        bad = sorted(r.id for r in quarantine.collect())
        assert ok == [1, 2]
        assert bad == [-3, 4, 5, 6]
        assert valid.columns == ["id", "status", "amount"]
        assert quarantine.columns == ["id", "status", "amount", "_violations_json"]
        # the violation payload is parseable JSON naming the keyword
        q = {r.id: json.loads(r._violations_json) for r in quarantine.collect()}
        assert q[-3][0]["keyword"] == "minimum"
        assert q[4][0]["keyword"] == "enum"
        assert q[5][0]["keyword"] == "exclusiveMinimum"
        assert {v["keyword"] for v in q[6]} == {"required"}
    finally:
        annotated.unpersist()


def test_quarantine_job_end_to_end(spark, tmp_path):
    """CLI main(): writes both sinks, prints the report line, and the exit
    code reflects the --max-violation-rate gate."""
    from jobs.quarantine_job import main

    src = str(tmp_path / "src")
    spark.createDataFrame(_rows()).write.parquet(src)
    schema_path = tmp_path / "s.json"
    schema_path.write_text(json.dumps(SCHEMA))
    v_out, q_out = str(tmp_path / "valid"), str(tmp_path / "quar")

    rc = main([
        "--input", src, "--schema", str(schema_path),
        "--valid", v_out, "--quarantine", q_out,
        "--max-violation-rate", "0.5",
    ])
    assert rc == 1  # 4/6 > 0.5

    assert sorted(r.id for r in spark.read.parquet(v_out).collect()) == [1, 2]
    quar = spark.read.parquet(q_out)
    assert sorted(r.id for r in quar.collect()) == [-3, 4, 5, 6]
    assert "_violations_json" in quar.columns

    rc2 = main([
        "--input", src, "--schema", str(schema_path),
        "--valid", v_out, "--quarantine", q_out,
        "--max-violation-rate", "0.9",
    ])
    assert rc2 == 0


def test_split_single_scan_plan(spark):
    """Both sinks must filter ABOVE the persist barrier: each output's plan
    contains the InMemoryTableScan, not a second validation scan."""
    df = spark.createDataFrame(_rows())
    valid, quarantine, annotated = split_quarantine(df, SCHEMA)
    try:
        for out in (valid, quarantine):
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "InMemoryTableScan" in plan
    finally:
        annotated.unpersist()


def test_profile_job(spark, tmp_path, capsys):
    """Table-profiler CLI: long-format report covers stats / shape /
    moments / skew sections with sane values."""
    import json as _json

    from jobs.profile_job import main, profile_table

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", None)],
        "id long, grp string, v double",
    )
    rep = profile_table(df, ["grp"]).collect()
    by = {(r.section, r.column, r.metric): r for r in rep}
    assert by[("stats", "v", "null_count")].value_num == 1.0
    assert by[("shape", "grp", "n_distinct")].value_num == 2.0
    assert by[("moments", "v", "mean")].value_num == 15.0
    assert by[("skew", "grp", "max_share_ppm")].value_num == 666666.0

    src = str(tmp_path / "t")
    df.write.parquet(src)
    out = str(tmp_path / "prof")
    rc = main(["--input", src, "--output", out, "--skew-candidates", "grp"])
    assert rc == 0
    j = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(j["sections"]) == {"stats", "shape", "moments", "skew", "encoding"}
    assert spark.read.parquet(out).count() == j["report_rows"]


def test_profile_encoding_section(spark):
    from jobs.profile_job import profile_table

    df = spark.createDataFrame(
        [("ok text", 1), ("bad \x07 ctl", 2), (None, 3)],
        "t string, n long",
    )
    rows = {
        (r["column"], r["metric"]): r["value_num"]
        for r in profile_table(df).filter("section = 'encoding'").collect()
    }
    assert rows[("t", "control_total")] == 1.0
    assert rows[("t", "mojibake_total")] == 0.0
    assert rows[("t", "bad_row_rate")] == 0.5  # 1 damaged of 2 non-NULL


def test_profile_packet_rate_metric(spark):
    """profile_table reports the packet-framing failure fraction for a
    uniformly-opus corpus (RFC 6716 certification as a profile metric,
    beside codec_mismatch_rate / ctc_infeasible_rate)."""
    from jobs.profile_job import profile_table
    from jsonschema_spark.sources.clips import (
        OPUS_PKT_CLASS_MOD,
        synth_opus_packet_clips,
    )

    clips = synth_opus_packet_clips(spark, 2 * OPUS_PKT_CLASS_MOD).select(
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"
    )
    rep = profile_table(clips).collect()
    rows = {
        r["metric"]: r["value_num"]
        for r in rep
        if r["section"] == "audio"
    }
    assert "opus_packet_fail_rate" in rows
    # 4 of 8 ledger classes are planted framing failures
    assert abs(rows["opus_packet_fail_rate"] - 0.5) < 1e-9
    assert "vorbis_packet_fail_rate" not in rows


def test_profile_mp3_sideinfo_rate_metric(spark):
    """Round-5: a uniformly-mp3 corpus profiles the Layer III
    side-info / bit-reservoir failure fraction."""
    from jobs.profile_job import profile_table
    from jsonschema_spark.sources.clips import (
        MP3SI_CLASS_MOD,
        synth_mp3si_clips,
    )

    clips = synth_mp3si_clips(spark, 2 * MP3SI_CLASS_MOD).select(
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"
    )
    rows = {
        r["metric"]: r["value_num"]
        for r in profile_table(clips).collect()
        if r["section"] == "audio"
    }
    assert "mp3_packet_fail_rate" in rows
    # 6 of 13 ledger classes are planted failures
    assert abs(rows["mp3_packet_fail_rate"] - 6 / 13) < 1e-9
