"""Bandwidth / upsample-consistency signals (functions/audio.audio_bandwidth).

Pins: the zero-crossing kernel against an independent per-sample Python
count, the dominant-frequency estimator's accuracy on pure tones (the
~sr/n bound the clips_bandwidth ledger oracle relies on), the planted-class
margins, NULL/undecodable handling, and the gate booleans end-to-end on a
small synth run.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.functions.audio import (
    audio_bandwidth,
    bandwidth_gates,
    bandwidth_profile_batch,
    encode_payload,
    pcm16_from_float,
)
from jsonschema_spark.sources.clips import (
    BW_CLASS_MOD,
    BW_CLS_CROWDED,
    BW_CLS_UPSAMPLED,
    BW_SR,
    bw_tone_freq,
    synth_bandwidth_clips,
)


def _tone(f: float, n: int, sr: int = 16000, amp: float = 0.7) -> bytes:
    t = np.arange(n, dtype=np.float64)
    return encode_payload(
        pcm16_from_float(amp * np.sin(2.0 * np.pi * f * t / sr + 0.37)),
        "pcm_s16le",
    )


def _one(raw, sr=16000):
    return bandwidth_profile_batch(pd.Series([raw]), pd.Series([sr])).iloc[0]


def _naive_zc(pcm: np.ndarray) -> int:
    c = 0
    for i in range(1, len(pcm)):
        if (pcm[i] >= 0) != (pcm[i - 1] >= 0):
            c += 1
    return c


def test_kernel_matches_naive_count():
    rng = np.random.default_rng(7)
    x = (rng.random(4000) * 2.0 - 1.0) * 0.9
    raw = encode_payload(pcm16_from_float(x), "pcm_s16le")
    pcm = np.frombuffer(raw, dtype="<i2")
    r = _one(raw)
    assert int(r["zero_crossings"]) == _naive_zc(pcm)
    assert int(r["n_samples"]) == 4000


@pytest.mark.parametrize("f", [150.0, 440.0, 1250.0, 5450.0, 7750.0])
def test_pure_tone_estimate_within_bound(f):
    n = 3200  # 200 ms at 16 kHz — the corpus minimum
    r = _one(_tone(f, n))
    assert abs(float(r["est_freq_hz"]) - f) <= 16000.0 / (n - 1)


def test_planted_classes_land_mid_bin():
    # every ledger row's estimate must fall inside its 100-Hz bin with
    # >= 45 Hz margin (the clips_bandwidth oracle contract)
    for i in range(60):
        f = bw_tone_freq(i)
        n = BW_SR * 200 // 1000
        r = _one(_tone(f, n, BW_SR))
        est = float(r["est_freq_hz"])
        assert int(est // 100) == int(f // 100), (i, f, est)
        assert abs(est - f) < 45.0


def test_undecodable_and_null_rows():
    out = bandwidth_profile_batch(
        pd.Series([None, b"\x01"]), pd.Series([16000, 16000])
    )
    assert int(out["n_samples"].iloc[0]) == -1  # NULL payload
    assert np.isnan(out["est_freq_hz"].iloc[0])
    assert np.isnan(out["est_freq_hz"].iloc[1])  # odd-length / undecodable


def test_empty_payload_zero_crossings():
    r = _one(b"")
    assert int(r["zero_crossings"]) == 0
    assert np.isnan(r["est_freq_hz"])


def test_gates_end_to_end(spark):
    clips = synth_bandwidth_clips(spark, 90, partitions=4)
    b = clips.select(
        "clip_id", "sr_hz", "_row_idx",
        audio_bandwidth("bytes", "sr_hz").alias("bw"),
    )
    g = bandwidth_gates(F.col("bw"), "sr_hz")
    rows = b.select(
        "_row_idx",
        g["upsample_suspect"].alias("up"),
        g["nyquist_crowded"].alias("crowd"),
        g["bandwidth_ok"].alias("ok"),
    ).collect()
    assert len(rows) == 90
    for r in rows:
        cls = r["_row_idx"] % BW_CLASS_MOD
        assert r["up"] == (cls == BW_CLS_UPSAMPLED)
        assert r["crowd"] == (cls == BW_CLS_CROWDED)
        assert r["ok"] == (cls not in (BW_CLS_UPSAMPLED, BW_CLS_CROWDED))


def test_one_arrow_hop_plan(spark):
    clips = synth_bandwidth_clips(spark, 12, partitions=2)
    df = clips.select(audio_bandwidth("bytes", "sr_hz").alias("bw"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") <= 1
    assert "BatchEvalPython" not in plan
