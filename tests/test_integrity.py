"""Container/metadata integrity checks (operators/integrity.py).

Planted-class semantics over the WAV ledger corpus, exact expected byte
lengths for every synthetic container, and the zero-Python plan invariant
(these checks must run at scan speed — whole-stage codegen only)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.functions.audio import (
    encode_payload,
    encode_wav_pcm16,
    pcm16_from_float,
    reference_signal,
)
from jsonschema_spark.operators.integrity import payload_integrity, wav_header_checks
from jsonschema_spark.sources.clips import (
    WAV_CLASS_MOD,
    WAV_CLS_BAD_MAGIC,
    WAV_CLS_DUR_DRIFT,
    WAV_CLS_RAW_PCM,
    WAV_CLS_SR_MISMATCH,
    WAV_CLS_TRUNCATED,
    synth_wav_clips,
)

N = 2 * WAV_CLASS_MOD + 3  # every class at least twice


@pytest.fixture(scope="module")
def wav_flags(spark):
    df = wav_header_checks(synth_wav_clips(spark, N, partitions=2))
    return {int(r["_row_idx"]): r.asDict() for r in df.collect()}


def test_wav_planted_classes(wav_flags):
    assert len(wav_flags) == N
    for i, r in wav_flags.items():
        cls = i % WAV_CLASS_MOD
        if cls == WAV_CLS_SR_MISMATCH:
            assert r["canonical"] and r["fmt_ok"] and not r["sr_match"]
            assert r["header_sr"] == 32000 and r["samples_match"]
        elif cls == WAV_CLS_TRUNCATED:
            assert r["canonical"] and not r["riff_size_ok"]
            assert not r["data_size_ok"] and r["sr_match"]
        elif cls == WAV_CLS_DUR_DRIFT:
            assert r["canonical"] and not r["samples_match"]
            assert r["riff_size_ok"] and r["data_size_ok"] and r["sr_match"]
        elif cls == WAV_CLS_RAW_PCM:
            assert not r["is_riff"] and not r["canonical"]
            assert r["header_sr"] is None
        elif cls == WAV_CLS_BAD_MAGIC:
            assert not r["is_riff"]
        else:
            assert r["header_ok"], f"clean row {i} flagged: {r}"
        if cls in (
            WAV_CLS_SR_MISMATCH,
            WAV_CLS_TRUNCATED,
            WAV_CLS_DUR_DRIFT,
            WAV_CLS_RAW_PCM,
            WAV_CLS_BAD_MAGIC,
        ):
            assert not r["header_ok"]


def test_wav_header_fields_parse_exactly(spark):
    pcm = pcm16_from_float(reference_signal("clip-x", 1600))
    row = [("a", encode_wav_pcm16(pcm, 16000), 16000, 100, "wav", "t")]
    df = spark.createDataFrame(
        row, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
    )
    r = wav_header_checks(df).collect()[0]
    assert (
        r["audio_format"],
        r["n_channels"],
        r["header_sr"],
        r["byte_rate"],
        r["block_align"],
        r["bits_per_sample"],
        r["data_size"],
    ) == (1, 1, 16000, 32000, 2, 16, 3200)
    assert r["header_ok"]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    )


def test_payload_integrity_lengths(spark):
    sig = reference_signal("clip-y", 800)
    pcm = pcm16_from_float(sig)
    rows = [
        ("pcm", encode_payload(pcm, "pcm_s16le"), 8000, 100, "pcm_s16le"),
        ("flac", encode_payload(pcm, "flac"), 8000, 100, "flac"),
        ("opus", encode_payload(pcm, "opus"), 8000, 100, "opus"),
        ("wav", encode_wav_pcm16(pcm, 8000), 8000, 100, "wav"),
        ("trunc", encode_payload(pcm, "pcm_s16le")[:-2], 8000, 100, "pcm_s16le"),
        ("unknown", encode_payload(pcm, "amr"), 8000, 100, "amr"),
        ("nullb", None, 8000, 100, "pcm_s16le"),
    ]
    out = {r["clip_id"]: r.asDict() for r in payload_integrity(_mk(spark, rows)).collect()}
    assert out["pcm"]["expected_len"] == 1600 and out["pcm"]["integrity_ok"]
    assert out["flac"]["expected_len"] == 5 + 4 * 800 and out["flac"]["integrity_ok"]
    assert out["opus"]["expected_len"] == 4 + 2 * 800 and out["opus"]["integrity_ok"]
    assert out["wav"]["expected_len"] == 44 + 1600 and out["wav"]["integrity_ok"]
    assert not out["trunc"]["len_ok"] and not out["trunc"]["integrity_ok"]
    assert out["trunc"]["magic_ok"]  # truncation is a length defect, not magic
    assert out["unknown"]["expected_len"] is None
    assert not out["unknown"]["integrity_ok"] and not out["unknown"]["magic_ok"]
    assert not out["nullb"]["magic_ok"] and not out["nullb"]["integrity_ok"]


def test_wrong_container_magic_flagged(spark):
    pcm = pcm16_from_float(reference_signal("clip-z", 400))
    rows = [("mislabeled", encode_payload(pcm, "flac"), 8000, 50, "opus")]
    r = payload_integrity(_mk(spark, rows)).collect()[0]
    assert not r["magic_ok"] and not r["integrity_ok"]


def test_integrity_plans_are_pure_codegen(spark):
    pcm = pcm16_from_float(np.zeros(80))
    rows = [("a", encode_wav_pcm16(pcm, 8000), 8000, 10, "wav")]
    for op in (payload_integrity, wav_header_checks):
        plan = op(_mk(spark, rows))._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, f"{op.__name__} plan has Python nodes"
        assert "Exchange" not in plan, f"{op.__name__} plan shuffles"


def test_content_manifest_differential(spark):
    """Manifest recomputed independently in Python: bucket assignment,
    counts, byte totals, and the commutative digest sum must match; any
    single-byte payload flip or key rename must move its bucket's sum."""
    import hashlib

    from pyspark.sql import Row

    from jsonschema_spark.operators.integrity import content_manifest

    def md5_60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = []
    for i in range(40):
        payload = None if i % 7 == 5 else bytes([i % 251]) * (50 + i)
        rows.append(Row(clip_id=f"clip-{i:012d}", bytes=payload))
    df = spark.createDataFrame(rows)
    got = {r["bucket"]: r for r in content_manifest(df, n_buckets=4).collect()}

    exp: dict = {}
    for r in rows:
        b = md5_60(r.clip_id) % 4
        ph = (
            hashlib.md5(r.bytes.hex().upper().encode()).hexdigest()
            if r.bytes is not None
            else "null"
        )
        h = md5_60(f"{r.clip_id}:{ph}")
        n, tot, s = exp.get(b, (0, 0, 0))
        exp[b] = (n + 1, tot + (len(r.bytes) if r.bytes else 0), s + h)
    assert set(got) == set(exp)
    for b, (n, tot, s) in exp.items():
        assert got[b]["n_rows"] == n
        assert got[b]["total_bytes"] == tot
        assert int(got[b]["digest_sum"]) == s

    # sensitivity: flip one byte -> that bucket's digest moves, others don't
    flipped = [
        Row(
            clip_id=r.clip_id,
            bytes=(bytes([r.bytes[0] ^ 1]) + r.bytes[1:])
            if r.clip_id.endswith("0") and r.bytes
            else r.bytes,
        )
        for r in rows
    ]
    got2 = {
        r["bucket"]: r
        for r in content_manifest(
            spark.createDataFrame(flipped), n_buckets=4
        ).collect()
    }
    moved = {
        b
        for b in got
        if int(got[b]["digest_sum"]) != int(got2[b]["digest_sum"])
    }
    touched = {
        md5_60(r.clip_id) % 4
        for r in rows
        if r.clip_id.endswith("0") and r.bytes
    }
    assert moved == touched


def test_content_manifest_partition_invariant(spark):
    """The digest sum must be identical under any partitioning/order."""
    from pyspark.sql import Row

    from jsonschema_spark.operators.integrity import content_manifest

    rows = [
        Row(clip_id=f"clip-{i:012d}", bytes=bytes([i % 17]) * (10 + i))
        for i in range(30)
    ]
    df1 = spark.createDataFrame(rows).repartition(1)
    df2 = spark.createDataFrame(list(reversed(rows))).repartition(13)
    a = sorted(
        (r["bucket"], r["n_rows"], r["total_bytes"], str(r["digest_sum"]))
        for r in content_manifest(df1, n_buckets=4).collect()
    )
    b = sorted(
        (r["bucket"], r["n_rows"], r["total_bytes"], str(r["digest_sum"]))
        for r in content_manifest(df2, n_buckets=4).collect()
    )
    assert a == b


def test_manifest_suite_check(spark):
    """Suite check type 'manifest': identical tables pass; a single
    flipped payload fails with exactly the touched bucket counted."""
    from pyspark.sql import Row

    from jsonschema_spark.operators.suite import run_suite

    rows = [
        Row(clip_id=f"clip-{i:012d}", bytes=bytes([i % 11]) * (20 + i))
        for i in range(25)
    ]
    src = spark.createDataFrame(rows)
    same = spark.createDataFrame(list(reversed(rows))).repartition(5)
    flipped = spark.createDataFrame(
        [Row(clip_id=r.clip_id,
             bytes=(bytes([r.bytes[0] ^ 1]) + r.bytes[1:])
             if r.clip_id == "clip-000000000003" else r.bytes)
         for r in rows]
    )
    config = {
        "checks": [
            {"type": "manifest", "name": "copy_ok", "table": "src",
             "ref_table": "dst_same", "n_buckets": 4},
            {"type": "manifest", "name": "copy_corrupt", "table": "src",
             "ref_table": "dst_flipped", "n_buckets": 4},
        ]
    }
    rep = {
        r["check_name"]: r
        for r in run_suite(
            {"src": src, "dst_same": same, "dst_flipped": flipped}, config
        ).collect()
    }
    assert rep["copy_ok"]["status"] == "pass"
    assert rep["copy_ok"]["metric"] == 0.0
    assert rep["copy_corrupt"]["status"] == "fail"
    assert rep["copy_corrupt"]["metric"] == 1.0  # exactly one bucket moved
