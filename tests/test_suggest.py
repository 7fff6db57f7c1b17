"""Constraint suggestion (operators/suggest).

Pins: the exact suggestion set on a hand-built frame (unique/not_null/
enum/numeric-range and the all-NULL edge), the two-pass plan shape, and
the self-consistency loop — a suggested suite must PASS on the table it
was profiled from (the Deequ ConstraintSuggestion contract).
"""

from pyspark.sql import functions as F

from jsonschema_spark.operators.suggest import (
    as_suite_config,
    column_suggestions,
)
from jsonschema_spark.operators.suite import run_suite


def _frame(spark):
    rows = [
        (i, "a" if i % 3 else "b", float(i) * 1.5 if i != 7 else None, None)
        for i in range(50)
    ]
    return spark.createDataFrame(
        rows, "id long, status string, val double, dead string"
    )


def test_suggestion_set(spark):
    df = _frame(spark)
    got = {
        (r["column"], r["check_type"]): (r["param_lo"], r["param_hi"])
        for r in column_suggestions(
            df, ["id", "status", "val", "dead"]
        ).collect()
    }
    assert got[("*", "row_count")] == (25.0, None)
    assert got[("id", "not_null")] == (None, None)
    assert got[("id", "unique")] == (None, None)
    assert got[("id", "mean_between")] == (0.0, 49.0)
    assert got[("status", "not_null")] == (None, None)
    assert got[("status", "completeness_categories")] == (2.0, None)
    # every status value matches the lower_snake library pattern
    assert ("status", "matches_regex") in got
    # val has a NULL -> no not_null; 49 distinct doubles -> range only
    assert ("val", "not_null") not in got
    assert got[("val", "unique")] == (None, None)
    assert got[("val", "mean_between")] == (0.0, 73.5)
    # all-NULL column suggests nothing
    assert not [k for k in got if k[0] == "dead"]


def test_suggested_suite_passes_on_source(spark):
    df = _frame(spark)
    sugg = column_suggestions(df, ["id", "status", "val"])
    cfg = as_suite_config(df, sugg, table="t")
    assert cfg["checks"], "must suggest something"
    report = run_suite({"t": df}, cfg).collect()
    assert all(r["status"] == "pass" for r in report)
    # and the enum list is the real domain, sorted
    cats = [c for c in cfg["checks"]
            if c["type"] == "completeness_categories"]
    assert cats and cats[0]["expected"] == ["a", "b"]
    rx = [c for c in cfg["checks"] if c["type"] == "matches_regex"]
    assert rx and rx[0]["pattern"] == "^[a-z_]+$"


def test_suggestions_detect_drift(spark):
    df = _frame(spark)
    cfg = as_suite_config(df, column_suggestions(df, ["id", "status"]), "t")
    drifted = df.filter("id % 3 != 0")  # category 'b' disappears
    report = {r["check_name"]: r["status"]
              for r in run_suite({"t": drifted}, cfg).collect()}
    assert report["status_completeness_categories"] == "fail"


def test_two_pass_plan(spark):
    df = _frame(spark)
    plan = (
        column_suggestions(df, ["id", "status", "val"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_suggest_job_chain(spark, tmp_path):
    import json

    from jobs.suggest_job import main as suggest_main
    from jobs.suite_job import main as suite_main

    src = str(tmp_path / "orders_src")
    _frame(spark).write.mode("overwrite").parquet(src)
    cfg = str(tmp_path / "suggested.json")
    rc = suggest_main(["--input", src, "--table", "t", "--output", cfg])
    assert rc == 0
    conf = json.load(open(cfg))
    assert conf["tables"] == {"t": src}
    assert any(c["type"] == "unique" for c in conf["checks"])
    # the suggested suite gates green on its own source
    assert suite_main(["--config", cfg]) == 0


def test_suggest_audio_shape_drafts_decode_gate(spark):
    """A table with the engine's audio shape (clip_id/bytes/sr_hz/dur_ms)
    gets an audio_decode check drafted at the MEASURED decode-rate floor,
    and the drafted suite passes on its own source."""
    from jsonschema_spark.functions.audio import (
        encode_wav_pcm,
        pcm16_from_float,
        reference_signal,
    )
    from jsonschema_spark.functions.flac import encode_flac

    def clip(i, corrupt=False):
        cid = f"clip-{i:012d}"
        pcm = pcm16_from_float(reference_signal(cid, 3200))
        if corrupt:
            raw = bytearray(encode_flac(pcm, 16000))
            raw[len(raw) // 2] ^= 0x10
            return (cid, bytes(raw), 16000, 200)
        return (cid, encode_wav_pcm(pcm, 16000), 16000, 200)

    rows = [clip(i, corrupt=(i == 7)) for i in range(10)]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int"
    )
    sugg = column_suggestions(df, ["clip_id", "sr_hz"])
    cfg = as_suite_config(df, sugg, table="clips")
    audio = [c for c in cfg["checks"] if c["type"] == "audio_decode"]
    assert len(audio) == 1
    # measured 9/10 decode, floored to 3 decimals
    assert audio[0]["min_pass_rate"] == 0.9
    assert audio[0]["payload_col"] == "bytes"
    report = run_suite({"clips": df}, cfg).collect()
    assert all(r["status"] == "pass" for r in report)
    # non-audio tables draft no audio check
    plain = df.select("clip_id", "sr_hz")
    cfg2 = as_suite_config(
        plain, column_suggestions(plain, ["clip_id"]), table="t"
    )
    assert not [c for c in cfg2["checks"] if c["type"] == "audio_decode"]


def test_suggest_drafts_adts_gate_for_uniform_aac(spark):
    """A uniformly-AAC clips table drafts the round-4 adts frame-walk
    gate, anchored to the measured failure rate (the opus/vorbis
    packet-gate pattern)."""
    from jsonschema_spark.functions.aac import encode_adts_stream

    rows = [
        (f"c{i}", bytearray(encode_adts_stream(5, seed=i)), 16000, 320,
         "aac", "hello world")
        for i in range(6)
    ]
    rows.append(
        ("c-bad", bytearray(b"\x00" * 40), 16000, 320, "aac",
         "hello world")
    )
    df = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    sugg = column_suggestions(df, ["clip_id", "codec"])
    cfg = as_suite_config(df, sugg, table="clips")
    adts = [c for c in cfg["checks"] if c["type"] == "adts"]
    assert len(adts) == 1
    assert abs(adts[0]["max_violation_rate"] - 0.143) < 1e-9  # ceil(1/7)
    # the drafted gate passes by construction on the profiled table
    rep = {r["check_name"]: r
           for r in run_suite({"clips": df}, cfg).collect()}
    assert rep["clips_adts"]["status"] == "pass"
