"""Declarative validation suites (operators/suite.py) on planted frames."""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.suite import run_suite, suite_summary

SCHEMA = {
    "type": "object",
    "required": ["id", "name"],
    "properties": {
        "id": {"type": "integer", "minimum": 1},
        "name": {"type": "string", "maxLength": 10},
    },
}


@pytest.fixture(scope="module")
def tables(spark):
    head = spark.createDataFrame(
        [
            (1, "alpha", "2026-01-01"),
            (2, "beta", "2026-01-02"),
            (2, "beta2", "2026-01-04"),   # dup id + a missing day (01-03)
            (0, "gamma", "2026-01-05"),   # schema violation (minimum)
            (5, None, "2026-01-06"),      # schema violation (required)
        ],
        "id long, name string, d string",
    ).select("id", "name", F.col("d").cast("date").alias("d"))
    detail = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (9, 90.0)], "fk long, amount double"
    )  # fk=9 is an orphan
    return {"head": head, "detail": detail}


def _report(tables, checks):
    rows = run_suite(tables, {"checks": checks}).collect()
    return {r["check_name"]: r for r in rows}


def test_suite_checks(tables):
    rep = _report(tables, [
        {"type": "schema", "name": "head_schema", "table": "head",
         "schema": SCHEMA, "max_violation_rate": 0.1},
        {"type": "unique", "name": "head_pk", "table": "head", "keys": ["id"]},
        {"type": "not_null", "name": "name_set", "table": "head",
         "column": "name", "max_null_rate": 0.0},
        {"type": "row_count", "name": "head_nonempty", "table": "head",
         "min_rows": 1},
        {"type": "referential", "name": "detail_head", "table": "detail",
         "keys": ["fk"], "ref_table": "head", "ref_keys": ["id"]},
        {"type": "completeness_days", "name": "head_days", "table": "head",
         "column": "d", "max_missing": 0},
    ])
    # 2 of 5 rows violate the schema -> rate 0.4 > 0.1
    assert rep["head_schema"]["status"] == "fail"
    assert abs(rep["head_schema"]["metric"] - 0.4) < 1e-12
    assert rep["head_pk"]["status"] == "fail" and rep["head_pk"]["metric"] == 1
    assert rep["name_set"]["status"] == "fail"
    assert rep["head_nonempty"]["status"] == "pass"
    assert rep["detail_head"]["status"] == "fail"
    assert rep["detail_head"]["metric"] == 1  # the fk=9 orphan
    assert rep["head_days"]["status"] == "fail"
    assert rep["head_days"]["metric"] == 1  # 2026-01-03 missing


def test_suite_thresholds_flip(tables):
    rep = _report(tables, [
        {"type": "schema", "name": "lenient", "table": "head",
         "schema": SCHEMA, "max_violation_rate": 0.5},
        {"type": "unique", "name": "dups_ok", "table": "head",
         "keys": ["id"], "max_duplicate_keys": 1},
        {"type": "referential", "name": "one_orphan_ok", "table": "detail",
         "keys": ["fk"], "ref_table": "head", "ref_keys": ["id"],
         "max_orphans": 1},
    ])
    assert all(r["status"] == "pass" for r in rep.values())


def test_suite_summary(tables):
    report = run_suite(tables, {"checks": [
        {"type": "row_count", "name": "a", "table": "head", "min_rows": 1},
        {"type": "row_count", "name": "b", "table": "head", "min_rows": 99},
    ]})
    s = suite_summary(report).collect()[0]
    assert (s["n_checks"], s["n_passed"], s["n_failed"]) == (2, 1, 1)


def test_suite_rejects_typos(tables):
    with pytest.raises(ValueError, match="unknown check type"):
        run_suite(tables, {"checks": [{"type": "uniqe", "name": "x",
                                       "table": "head", "keys": ["id"]}]})
    with pytest.raises(ValueError, match="unknown table"):
        run_suite(tables, {"checks": [{"type": "row_count", "name": "x",
                                       "table": "nope", "min_rows": 1}]})
    with pytest.raises(ValueError, match="no checks"):
        run_suite(tables, {"checks": []})


def test_suite_drift_checks(spark):
    cur = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50, "cat string"
    )
    same = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50, "cat string"
    )
    shifted = spark.createDataFrame(
        [("a",)] * 90 + [("b",)] * 10, "cat string"
    )
    tables = {"cur": cur, "same": same, "shifted": shifted}
    rep = _report(tables, [
        {"type": "drift_chi2", "name": "no_drift", "table": "cur",
         "column": "cat", "baseline_table": "same", "max_stat": 0.01},
        {"type": "drift_psi", "name": "psi_same", "table": "cur",
         "column": "cat", "baseline_table": "same", "max_psi": 0.01},
        {"type": "drift_chi2", "name": "drifted", "table": "cur",
         "column": "cat", "baseline_table": "shifted", "max_stat": 1.0},
        {"type": "drift_psi", "name": "psi_drifted", "table": "cur",
         "column": "cat", "baseline_table": "shifted", "max_psi": 0.1},
    ])
    assert rep["no_drift"]["status"] == "pass" and rep["no_drift"]["metric"] == 0.0
    assert rep["psi_same"]["status"] == "pass"
    assert rep["drifted"]["status"] == "fail" and rep["drifted"]["metric"] > 1.0
    assert rep["psi_drifted"]["status"] == "fail"
    # unknown baseline table fails at plan time
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown baseline_table"):
        run_suite(tables, {"checks": [
            {"type": "drift_psi", "name": "x", "table": "cur",
             "column": "cat", "baseline_table": "nope", "max_psi": 0.1}]})


def test_suite_reconcile_check(spark):
    head = spark.createDataFrame(
        [(1, 30.0), (2, 50.0), (3, 10.0)], "k long, total double"
    )
    detail = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 49.0)], "fk long, amt double"
    )  # key 2 mismatches (49 vs 50 at 1%: 0.02 > 0.01); key 3 has no details
    tables = {"head": head, "detail": detail}
    rep = _report(tables, [
        {"type": "reconcile", "name": "totals", "table": "head",
         "detail_table": "detail", "key": "k", "detail_key": "fk",
         "value": "total", "detail_amount": "amt"},
        {"type": "reconcile", "name": "totals_lenient", "table": "head",
         "detail_table": "detail", "key": "k", "detail_key": "fk",
         "value": "total", "detail_amount": "amt", "rel_tol": 0.05,
         "max_mismatches": 1},
    ])
    assert rep["totals"]["status"] == "fail" and rep["totals"]["metric"] == 2
    assert rep["totals_lenient"]["status"] == "pass"
    assert rep["totals_lenient"]["metric"] == 1  # only the missing-detail key


def test_suite_job_history_regression(spark, tmp_path, capsys):
    """suite_job --history: run-over-run metric regression detection —
    stable runs build a baseline, a doubled table flags, and
    --fail-on-regression turns the flag into the exit code."""
    import json as _json

    from jobs.suite_job import main

    src = str(tmp_path / "t")
    hist = str(tmp_path / "hist")
    cfg_path = tmp_path / "suite.json"
    cfg_path.write_text(_json.dumps({
        "tables": {"t": src},
        "checks": [
            {"type": "row_count", "name": "t_rows", "table": "t",
             "min_rows": 1},
        ],
    }))

    def run(n_rows, run_id, fail_on_regression=False):
        spark.createDataFrame(
            [(i,) for i in range(n_rows)], "id long"
        ).write.mode("overwrite").parquet(src)
        argv = ["--config", str(cfg_path), "--history", hist,
                "--run-id", run_id]
        if fail_on_regression:
            argv.append("--fail-on-regression")
        rc = main(argv)
        return rc, _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # four stable runs build the baseline (first run has no history yet)
    for i, n in enumerate((100, 101, 99, 100)):
        rc, out = run(n, f"r{i}")
        assert rc == 0
        assert out.get("n_regressed", 0) == 0

    # doubled row count: regression reported, advisory by default
    rc, out = run(200, "r4")
    assert rc == 0
    assert out["n_regressed"] == 1
    reg = {r["check"]: r for r in out["regressions"]}
    assert reg["t_rows"]["regressed"] is True

    # ...and gating with --fail-on-regression
    rc, out = run(200, "r5", fail_on_regression=True)
    assert rc == 1


def test_suite_relational_checks(spark):
    """fd / sequence / freshness / skew check types: metric arithmetic and
    threshold verdicts on planted frames."""
    import datetime as dt

    ev = spark.createDataFrame(
        [
            ("u", 1, dt.datetime(2024, 1, 1, 0, 0, 0)),
            ("u", 2, dt.datetime(2024, 1, 1, 0, 0, 10)),
            ("u", 3, dt.datetime(2024, 1, 1, 0, 0, 5)),   # regression
            ("v", 1, dt.datetime(2024, 1, 1, 0, 0, 0)),
        ],
        "k string, i int, t timestamp",
    )
    fd_t = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "det int, dep string"
    )
    skew_t = spark.createDataFrame(
        [("hot",)] * 9 + [("cold",)], "c string"
    )
    rep = _report({"ev": ev, "fd_t": fd_t, "skew_t": skew_t}, [
        {"type": "fd", "name": "det_dep", "table": "fd_t",
         "determinant": "det", "dependent": "dep"},
        {"type": "sequence", "name": "ev_seq", "table": "ev",
         "key": "k", "ts": "t", "id": "i", "max_gap_s": 60.0},
        {"type": "freshness", "name": "ev_fresh", "table": "ev",
         "column": "t", "as_of": "2024-01-01 01:00:00",
         "max_age_s": 7200.0},
        {"type": "freshness", "name": "ev_stale", "table": "ev",
         "column": "t", "as_of": "2024-01-02 00:00:00",
         "max_age_s": 3600.0},
        {"type": "skew", "name": "c_skew", "table": "skew_t",
         "column": "c", "max_share_ppm": 500_000},
    ])
    assert rep["det_dep"]["status"] == "fail" and rep["det_dep"]["metric"] == 1.0
    assert rep["ev_seq"]["status"] == "fail" and rep["ev_seq"]["metric"] == 1.0
    # newest t = 00:00:10, as_of 01:00 -> age 3590 s <= 7200
    assert rep["ev_fresh"]["status"] == "pass"
    assert rep["ev_fresh"]["metric"] == 3590.0
    assert rep["ev_stale"]["status"] == "fail"
    assert rep["c_skew"]["status"] == "fail"
    assert rep["c_skew"]["metric"] == 900_000.0


def test_suite_freshness_empty_fails(spark):
    """No data is never fresh: an all-NULL timestamp column must FAIL,
    not pass on a NULL age."""
    ev = spark.createDataFrame([(None,)], "t timestamp")
    rep = _report({"ev": ev}, [
        {"type": "freshness", "name": "f", "table": "ev", "column": "t",
         "as_of": "2024-01-01 00:00:00", "max_age_s": 1e12},
    ])
    assert rep["f"]["status"] == "fail"


def test_suite_where_scoping(spark):
    """A check with a "where" predicate runs on the matching slice only."""
    t = spark.createDataFrame(
        [(1, "a"), (2, "a"), (2, "a"), (3, "b"), (3, "b")],
        "id long, grp string",
    )
    rep = _report({"t": t}, [
        {"type": "unique", "name": "all_ids", "table": "t", "keys": ["id"]},
        {"type": "unique", "name": "a_ids", "table": "t", "keys": ["id"],
         "where": "grp = 'a'"},
        {"type": "row_count", "name": "b_rows", "table": "t",
         "where": "grp = 'b'", "min_rows": 3},
    ])
    assert rep["all_ids"]["metric"] == 2.0      # ids 2 and 3 duplicated
    assert rep["a_ids"]["metric"] == 1.0        # only id 2 inside grp=a
    assert rep["b_rows"]["metric"] == 2.0
    assert rep["b_rows"]["status"] == "fail"


def test_suite_mean_and_entropy_checks(spark):
    t = spark.createDataFrame(
        [(10.0, "a"), (20.0, "a"), (30.0, "a"), (None, "a"), (40.0, "b")],
        "v double, c string",
    )
    rep = _report({"t": t}, [
        {"type": "mean_between", "name": "v_mean_ok", "table": "t",
         "column": "v", "min_mean": 20.0, "max_mean": 30.0},
        {"type": "mean_between", "name": "v_mean_tight", "table": "t",
         "column": "v", "min_mean": 26.0, "max_mean": 30.0},
        {"type": "entropy_min", "name": "c_entropy", "table": "t",
         "column": "c", "min_entropy": 1.0},
    ])
    assert rep["v_mean_ok"]["metric"] == 25.0
    assert rep["v_mean_ok"]["status"] == "pass"
    assert rep["v_mean_tight"]["status"] == "fail"
    # 4/5 'a': H = ln 5 - (4 ln 4)/5 ~ 0.5004 < 1.0 -> degenerate, fails
    assert rep["c_entropy"]["status"] == "fail"
    assert abs(rep["c_entropy"]["metric"] - 0.500402) < 1e-5


def test_suite_mean_empty_column_fails(spark):
    t = spark.createDataFrame([(None,)], "v double")
    rep = _report({"t": t}, [
        {"type": "mean_between", "name": "m", "table": "t", "column": "v",
         "min_mean": 0.0, "max_mean": 1.0},
    ])
    assert rep["m"]["status"] == "fail"


def test_suite_completeness_categories(spark):
    t = spark.createDataFrame([("pcm",), ("flac",), (None,)], "codec string")
    rep = _report({"t": t}, [
        {"type": "completeness_categories", "name": "codecs", "table": "t",
         "column": "codec", "expected": ["pcm", "flac", "opus"]},
        {"type": "completeness_categories", "name": "codecs_lenient",
         "table": "t", "column": "codec",
         "expected": ["pcm", "flac", "opus"], "max_missing": 1},
    ])
    assert rep["codecs"]["metric"] == 1.0 and rep["codecs"]["status"] == "fail"
    assert rep["codecs_lenient"]["status"] == "pass"


def test_suite_session_check(spark):
    """Stuck-session gate: tight SLA fails, loose SLA passes; empty feed
    fails (never vanishes)."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.suite import run_suite

    df = spark.createDataFrame(
        [
            (1, 10, "2026-01-01 00:00:00"),
            (1, 11, "2026-01-01 00:00:40"),
            (1, 12, "2026-01-01 00:01:20"),  # one 80s session
            (2, 20, "2026-01-01 00:00:00"),
        ],
        "user_id long, event_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cfg = {
        "checks": [
            {"type": "session", "name": "tight", "table": "t",
             "key": "user_id", "ts": "ts", "id": "event_id",
             "gap_s": 60.0, "max_duration_s": 30.0},
            {"type": "session", "name": "loose", "table": "t",
             "key": "user_id", "ts": "ts", "id": "event_id",
             "gap_s": 60.0, "max_duration_s": 300.0},
        ]
    }
    rows = {r["check_name"]: r for r in run_suite({"t": df}, cfg).collect()}
    assert rows["tight"]["status"] == "fail"
    assert rows["tight"]["metric"] == 80.0
    assert rows["loose"]["status"] == "pass"

    empty = df.where(F.lit(False))
    out = run_suite({"t": empty}, {"checks": [
        {"type": "session", "name": "none", "table": "t",
         "key": "user_id", "ts": "ts", "id": "event_id",
         "gap_s": 60.0, "max_duration_s": 300.0},
    ]}).collect()
    assert len(out) == 1 and out[0]["status"] == "fail"


def test_suite_join_explosion_check(spark):
    from jsonschema_spark.operators.suite import run_suite

    left = spark.createDataFrame(
        [("hot",)] * 10 + [("c1",)], "k string"
    )
    right = spark.createDataFrame(
        [("hot",)] * 10 + [("c2",)], "j string"
    )
    cfg = {
        "checks": [
            {"type": "join_explosion", "name": "blowup", "table": "l",
             "ref_table": "r", "key": "k", "ref_key": "j",
             "max_ratio": 4.0},
            {"type": "join_explosion", "name": "fk_ok", "table": "l",
             "ref_table": "dim", "key": "k", "ref_key": "d",
             "max_ratio": 4.0},
        ]
    }
    dim = spark.createDataFrame([("hot",), ("c1",)], "d string")
    rows = {
        r["check_name"]: r
        for r in run_suite({"l": left, "r": right, "dim": dim}, cfg).collect()
    }
    # hot*hot = 100 est rows over 11 inputs -> ratio ~9.09 -> fail
    assert rows["blowup"]["status"] == "fail"
    assert rows["blowup"]["metric"] == pytest.approx(100.0 / 11.0)
    # 1:1 dim join: est 11 rows over 11 -> ratio 1.0 -> pass
    assert rows["fk_ok"]["status"] == "pass"
    assert rows["fk_ok"]["metric"] == pytest.approx(1.0)


def test_suite_matches_regex_and_encoding_checks(spark):
    from jsonschema_spark.operators.suite import run_suite

    df = spark.createDataFrame(
        [("click", "clean text"), ("VIEW", "bad \x07 text"),
         (None, None), ("scroll", "fine")],
        "et string, txt string",
    )
    cfg = {
        "checks": [
            {"type": "matches_regex", "name": "shape", "table": "t",
             "column": "et", "pattern": "^[a-z_]+$",
             "max_violation_rate": 0.0},
            {"type": "matches_regex", "name": "shape_loose", "table": "t",
             "column": "et", "pattern": "^[a-z_]+$",
             "max_violation_rate": 0.5},
            {"type": "encoding", "name": "enc", "table": "t",
             "column": "txt", "max_bad_rate": 0.0},
        ]
    }
    rows = {r["check_name"]: r for r in run_suite({"t": df}, cfg).collect()}
    # 3 non-null et values, 1 ('VIEW') violates -> rate 1/3
    assert rows["shape"]["status"] == "fail"
    assert rows["shape"]["metric"] == pytest.approx(1 / 3)
    assert rows["shape_loose"]["status"] == "pass"
    # 3 non-null txt values, 1 control-damaged -> rate 1/3 -> fail at 0.0
    assert rows["enc"]["status"] == "fail"
    assert rows["enc"]["metric"] == pytest.approx(1 / 3)


def test_suite_values_in_set_check(spark):
    from jsonschema_spark.operators.suite import run_suite

    df = spark.createDataFrame(
        [("a",), ("b",), ("c",), (None,)], "k string"
    )
    cfg = {"checks": [
        {"type": "values_in_set", "name": "strict", "table": "t",
         "column": "k", "expected": ["a", "b"],
         "max_unexpected_rate": 0.0},
        {"type": "values_in_set", "name": "loose", "table": "t",
         "column": "k", "expected": ["a", "b"],
         "max_unexpected_rate": 0.5},
    ]}
    rows = {r["check_name"]: r for r in run_suite({"t": df}, cfg).collect()}
    assert rows["strict"]["status"] == "fail"
    assert rows["strict"]["metric"] == pytest.approx(1 / 3)
    assert rows["loose"]["status"] == "pass"


def test_suite_expr_check(spark):
    from jsonschema_spark.operators.suite import run_suite

    df = spark.createDataFrame(
        [(1.0, 2.0), (3.0, 1.0), (None, 5.0)], "a double, b double"
    )
    cfg = {"checks": [
        {"type": "expr", "name": "a_lt_b", "table": "t",
         "expr": "a < b", "max_violation_rate": 0.0},
        {"type": "expr", "name": "a_lt_b_loose", "table": "t",
         "expr": "a < b", "max_violation_rate": 0.7},
    ]}
    rows = {r["check_name"]: r for r in run_suite({"t": df}, cfg).collect()}
    # row2 violates; row3's NULL predicate counts as a violation (loud)
    assert rows["a_lt_b"]["status"] == "fail"
    assert rows["a_lt_b"]["metric"] == pytest.approx(2 / 3)
    assert rows["a_lt_b_loose"]["status"] == "pass"


def test_suite_audio_decode_check(spark):
    """The payload axis as a declarative gate: decode rate, SNR invariant
    and length reconciliation in one Arrow hop."""
    import numpy as np

    from jsonschema_spark.functions.audio import (
        encode_wav_pcm,
        pcm16_from_float,
        reference_signal,
    )
    from jsonschema_spark.functions.flac import encode_flac

    def clip(i, corrupt=False, short=False):
        cid = f"clip-{i:012d}"
        n = 16000 * 200 // 1000
        pcm = pcm16_from_float(reference_signal(cid, n))
        if corrupt:
            raw = bytearray(encode_flac(pcm, 16000))
            raw[len(raw) // 2] ^= 0x10  # CRC/MD5 chain must raise
            return (cid, bytes(raw), 16000, 200)
        raw = encode_wav_pcm(pcm, 16000)
        if short:
            raw = raw[: 44 + (len(raw) - 44) // 2]  # torn PCM: decodes SHORT
        return (cid, raw, 16000, 200)

    rows = [clip(0), clip(1), clip(2, corrupt=True), clip(3, short=True)]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int"
    )
    rep = _report({"clips": df}, [
        {"type": "audio_decode", "name": "decodable", "table": "clips",
         "min_pass_rate": 0.75},
        {"type": "audio_decode", "name": "decodable_strict", "table": "clips",
         "min_pass_rate": 0.76},
        {"type": "audio_decode", "name": "length_ok", "table": "clips",
         "min_pass_rate": 0.5, "check_length": True},
        {"type": "audio_decode", "name": "snr_ok", "table": "clips",
         "min_pass_rate": 0.5, "min_snr_db": 30.0},
    ])
    # 3/4 decode (the bit-flipped FLAC raises)
    assert rep["decodable"]["metric"] == pytest.approx(0.75)
    assert rep["decodable"]["status"] == "pass"
    assert rep["decodable_strict"]["status"] == "fail"
    # torn PCM decodes but fails length reconciliation -> 2/4
    assert rep["length_ok"]["metric"] == pytest.approx(0.5)
    assert rep["length_ok"]["status"] == "pass"
    # clean clips meet the reference-signal SNR invariant; torn one does
    # not (truncated-vs-reference SNR is -inf) -> 2/4
    assert rep["snr_ok"]["metric"] == pytest.approx(0.5)
    # empty table passes vacuously
    rep0 = _report({"clips": df.where(F.lit(False))}, [
        {"type": "audio_decode", "name": "vacuous", "table": "clips",
         "min_pass_rate": 1.0},
    ])
    assert rep0["vacuous"]["status"] == "pass"
    assert rep0["vacuous"]["metric"] == 1.0


def test_round4_walker_gates(spark):
    """The round-4 walker-backed check types: Vorbis sample-decode SNR,
    ADTS, h264, MP4 and WebM structure gates — clean corpora pass at
    rate 0, planted-failure corpora fail their thresholds."""
    import pandas as pd

    from jsonschema_spark.functions.aac import encode_adts_stream
    from jsonschema_spark.functions.h264 import encode_h264_stream
    from jsonschema_spark.functions.mp4 import encode_mp4_h264
    from jsonschema_spark.functions.vorbis import (
        encode_vorbis_clip,
        vorbis_reference,
    )
    from jsonschema_spark.functions.webm import encode_webm
    from jsonschema_spark.operators.suite import run_suite

    def tbl(rows, schema):
        return spark.createDataFrame(rows, schema)

    vb = []
    for i in range(6):
        pcm = vorbis_reference(f"s{i}", 3000, 1 + i % 2)
        raw, _ = encode_vorbis_clip(pcm, 16000, coupling=(i % 2 == 1))
        vb.append((f"s{i}", bytearray(raw), 16000, 187))
    vb.append(("s-bad", bytearray(raw[:-5]), 16000, 187))
    clips = tbl(vb, "clip_id string, bytes binary, sr_hz int, dur_ms int")

    media = tbl(
        [
            ("a0", bytearray(encode_adts_stream(6, seed=1))),
            ("a1", bytearray(encode_adts_stream(6, crc=True, seed=2))),
            ("h0", bytearray(encode_h264_stream(4, seed=3))),
            ("m0", bytearray(encode_mp4_h264(4, seed=4))),
            ("w0", bytearray(encode_webm(4, 6, seed=5))),
        ],
        "media_id string, bytes binary",
    )
    tables = {"clips": clips, "media": media}
    cfg = {
        "checks": [
            {"type": "vorbis_decode", "name": "vb", "table": "clips",
             "max_violation_rate": 0.2},
            {"type": "adts", "name": "aac", "table": "media",
             "max_violation_rate": 0.7},
            {"type": "h264", "name": "h", "table": "media",
             "max_violation_rate": 0.9},
            {"type": "mp4_structure", "name": "m", "table": "media",
             "max_violation_rate": 0.9},
            {"type": "webm_structure", "name": "w", "table": "media",
             "max_violation_rate": 0.9},
        ],
    }
    rows = {r["check_name"]: r for r in run_suite(tables, cfg).collect()}
    # clips: 1 of 7 fails decode -> rate ~0.143 <= 0.2 passes
    assert rows["vb"]["status"] == "pass"
    assert abs(rows["vb"]["metric"] - 1 / 7) < 1e-9
    # media table mixes formats: each gate sees the others as failures,
    # rates are (n - matching)/n
    assert abs(rows["aac"]["metric"] - 3 / 5) < 1e-9
    assert rows["aac"]["status"] == "pass"
    for name, matching in (("h", 1), ("m", 1), ("w", 1)):
        assert abs(rows[name]["metric"] - (5 - matching) / 5) < 1e-9
        assert rows[name]["status"] == "pass"
    # tightening the threshold flips the verdict
    cfg["checks"] = [
        {"type": "vorbis_decode", "name": "vb0", "table": "clips",
         "max_violation_rate": 0.0},
    ]
    r = run_suite(tables, cfg).collect()[0]
    assert r["status"] == "fail"


def test_mp3_sideinfo_gate(spark):
    """Round-5 mp3_sideinfo check type: a corpus with one unflushed
    byte-slice (reservoir_underflow) and one conforming stream."""
    from jsonschema_spark.functions.mp3 import frame_length
    from jsonschema_spark.functions.mp3_sideinfo import (
        encode_sideinfo_stream,
    )
    from jsonschema_spark.operators.suite import run_suite

    good, _ = encode_sideinfo_stream(
        n_frames=8, version_id=3, sr_hz=32000, mode="mono",
        bitrates_kbps=(64,), seed=2,
    )
    ln = frame_length(3, 3, 64000, 32000, 0)
    cut = good[3 * ln :]  # mdb now points before the stream start
    clips = spark.createDataFrame(
        [("g", bytearray(good)), ("c", bytearray(cut))],
        "clip_id string, bytes binary",
    )
    cfg = {
        "checks": [
            {"type": "mp3_sideinfo", "name": "si", "table": "clips",
             "max_violation_rate": 0.5},
            {"type": "mp3_sideinfo", "name": "si0", "table": "clips",
             "max_violation_rate": 0.0},
        ],
    }
    rows = {r["check_name"]: r for r in
            run_suite({"clips": clips}, cfg).collect()}
    assert rows["si"]["status"] == "pass"
    assert abs(rows["si"]["metric"] - 0.5) < 1e-9
    assert rows["si0"]["status"] == "fail"
