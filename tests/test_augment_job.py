"""Augmentation funnel CLI (jobs/augment_clips_job.py): planted corpus run
through mask -> mix -> speed-set expansion; the final payload bytes of a
probed clip must equal composing the standalone kernels in stage order,
and the stats line must account for every row."""

import hashlib

import numpy as np
import pandas as pd

from jobs.augment_clips_job import _parse_speed_set, augment_clips
from jsonschema_spark.functions.audio import (
    decode_payload,
    mix_payloads_batch,
    speed_gather_batch,
)
from jsonschema_spark.sources.clips import CLIPS_SCHEMA


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _mk_rows():
    rng = np.random.RandomState(11)
    rows = []
    for i in range(6):
        n = 3200 + 320 * i
        pcm = rng.randint(-25000, 25000, n).astype("<i2")
        rows.append((f"clip-{i:012d}", bytes(pcm.tobytes()), 16000,
                     n * 1000 // 16000, "pcm_s16le", "x"))
    # one container row: unmaskable (passes through the mask stage) but
    # mixable (the mix decode transcodes it)
    q = (rng.randint(-8000, 8000, 3200) >> 2).astype("<i2")
    rows.append(("clip-000000000006", b"OpuS" + q.tobytes(), 16000, 200,
                 "opus", "x"))
    return rows


def test_parse_speed_set():
    assert _parse_speed_set("9/10,11/10") == [(9, 10), (11, 10)]
    assert _parse_speed_set("2") == [(2, 1)]


def test_augment_job_planted_composition(spark, tmp_path):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, CLIPS_SCHEMA)
    out, stats = augment_clips(
        df,
        n_time_masks=1,
        mask_ms=50,
        noise=df,
        mix_gain=0.25,
        speed_set=[(11, 10)],
        output=str(tmp_path / "aug"),
    )
    assert stats["input_rows"] == 7
    assert stats["normalized_rows"] == 7
    assert stats["rows_masked"] == 6          # opus row passes the mask stage
    assert stats["rows_mixed"] == 7           # mix decodes containers too
    assert stats["output_rows"] == 14         # corpus + one speed copy
    assert stats["speed_factors"] == ["11/10"]

    got = {r["clip_id"]: bytes(r["bytes"]) for r in out.collect()}
    assert len(got) == 14
    payloads = {r[0]: r[1] for r in rows}

    # independent composition for a probed pcm clip
    cid = "clip-000000000002"
    pcm = np.frombuffer(payloads[cid], dtype="<i2").copy()
    n = len(pcm)
    w = min(16000 * 50 // 1000, n)
    s = _md5_60(f"{cid}:tm0") % (n - w + 1)
    pcm[s : s + w] = 0                         # stage: time mask
    nid = _md5_60(f"{cid}:mx") % 7             # stage: noise overlay
    noise_cid = f"clip-{nid:012d}"
    mixed = mix_payloads_batch(
        pd.Series([pcm.tobytes()]), pd.Series([payloads[noise_cid]]), 0.25
    )["out_bytes"][0]
    assert got[cid] == mixed                   # normalized copy
    sp = speed_gather_batch(pd.Series([mixed]), 11, 10)["out_bytes"][0]
    assert got[cid + "#sp11/10"] == sp         # expanded copy

    # the opus row: mask passes through, mix transcodes its decode
    ocid = "clip-000000000006"
    omix = mix_payloads_batch(
        pd.Series([payloads[ocid]]),
        pd.Series([payloads[f"clip-{_md5_60(ocid + ':mx') % 7:012d}"]]),
        0.25,
    )["out_bytes"][0]
    assert got[ocid] == omix
    assert (
        len(got[ocid + "#sp11/10"]) // 2
        == (len(decode_payload(payloads[ocid])) * 10) // 11
    )


def test_augment_job_no_output_persist_path(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, CLIPS_SCHEMA)
    out, stats = augment_clips(df, n_time_masks=2, mask_ms=100)
    assert stats["output_rows"] == stats["normalized_rows"] == 7
    assert stats["rows_masked"] == 6
    assert out.count() == 7
