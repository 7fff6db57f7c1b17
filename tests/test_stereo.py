"""Stereo-integrity screen (functions/stereo.py; suite check
audio_stereo).

Analytic anchors: exact dual-mono has side RMS 0 and corr +1; exact
polarity inversion has corr -1 and mid RMS 0; a dead channel reads
imbalanced with a degenerate (NaN) correlation; independent channels
read corr ~ 0 and clear every gate; correlated-but-true stereo (the
floor-tightness anchor) stays stereo_ok. The channel dispatch is
pinned across all four real containers (WAV / AIFF / AU / FLAC).
"""

import numpy as np
import pandas as pd
import pytest

from jsonschema_spark.functions.audio import (
    decode_payload_channels,
    encode_aiff,
    encode_au,
    encode_wav_pcm,
    encode_wav_pcm16,
    encode_wav_pcm16_stereo,
)
from jsonschema_spark.functions.stereo import (
    stereo_profile_batch,
    stereo_profile_one,
)

SR = 16000


def _noise(n, seed=1, amp=8000):
    rng = np.random.RandomState(seed)
    return rng.randint(-amp, amp, n).astype(np.int64)


def _st(left, right):
    return np.stack([left, right], axis=1).astype(np.int32)


def test_dual_mono_anchor():
    x = _noise(SR)
    ch, corr, rl, rr, rm, rs = stereo_profile_one(_st(x, x))
    assert ch == 2 and corr == 1.0 and rs == 0.0
    assert rl == rr == rm > 0


def test_polarity_inversion_anchor():
    x = _noise(SR, 2)
    ch, corr, rl, rr, rm, rs = stereo_profile_one(_st(x, -x))
    assert ch == 2 and corr == -1.0 and rm == 0.0
    assert rl == rr == rs > 0


def test_dead_channel_anchor():
    x = _noise(SR, 3)
    ch, corr, rl, rr, rm, rs = stereo_profile_one(
        _st(x, np.zeros(SR, dtype=np.int64))
    )
    assert ch == 2 and np.isnan(corr) and rr == 0.0 and rl > 0
    # mid and side are both half the live channel
    assert rm == rs == pytest.approx(rl / 2)


def test_independent_channels_clear():
    ch, corr, rl, rr, rm, rs = stereo_profile_one(
        _st(_noise(SR, 4), _noise(SR, 5))
    )
    assert ch == 2 and abs(corr) < 0.05
    # side/mid ~ 1 for independent equal-power channels
    assert 0.8 < rs / rm < 1.25


def test_mono_and_empty():
    x = _noise(1000, 6)
    ch, corr, rl, rr, rm, rs = stereo_profile_one(x.reshape(-1, 1))
    assert ch == 1 and np.isnan(corr) and rl > 0 and np.isnan(rr)
    ch, corr, *_ = stereo_profile_one(np.zeros((0, 2), dtype=np.int32))
    assert ch == 2 and np.isnan(corr)


def test_pearson_matches_numpy():
    a, b = _noise(4000, 7), _noise(4000, 8)
    mix = a + (b >> 1)
    _, corr, *_ = stereo_profile_one(_st(a, mix))
    assert corr == pytest.approx(np.corrcoef(a, mix)[0, 1], abs=1e-12)


def test_channel_dispatch_all_containers():
    left, right = _noise(800, 10), _noise(800, 11)
    st64 = np.stack([left, right], axis=1)
    payloads = [
        encode_wav_pcm16_stereo(
            left.astype(np.int16), right.astype(np.int16), SR
        ),
        encode_aiff(st64, SR, bits=16),
        encode_au(st64, SR, encoding="pcm16"),
    ]
    from jsonschema_spark.functions.flac import encode_flac

    payloads.append(encode_flac(st64, SR))
    for raw in payloads:
        x = decode_payload_channels(raw)
        assert x.shape == (800, 2)
        assert np.array_equal(x[:, 0], left) and np.array_equal(
            x[:, 1], right
        ), raw[:4]
    # mono payloads arrive as (n, 1)
    m = decode_payload_channels(encode_wav_pcm16(left, SR))
    assert m.shape == (800, 1) and np.array_equal(m[:, 0], left)


def test_batch_failure_sentinels():
    out = stereo_profile_batch(pd.Series([None, b"RIFF1234WAVEbroken"]))
    assert list(out["n_samples"]) == [-1, -1]
    assert list(out["n_channels"]) == [0, 0]


def test_stereo_ledger_corpus_verifies(spark):
    import pyspark.sql.functions as F

    from jsonschema_spark.functions.stereo import audio_stereo, stereo_gates
    from jsonschema_spark.sources.clips import (
        STEREO_CLASS_MOD,
        synth_stereo_screen_clips,
    )

    clips = synth_stereo_screen_clips(spark, 2 * STEREO_CLASS_MOD)
    prof = clips.select(
        "_row_idx", "_nch", "_corr", "_rmsl", "_rmsr", "_rmsm", "_rmss",
        "_n", "_stereo", "_dual", "_phase", "_imb", "_ok", "_meas",
        audio_stereo("bytes").alias("p"),
    )
    rows = prof.select("*", stereo_gates(F.col("p")).alias("g")).collect()
    assert len(rows) == 2 * STEREO_CLASS_MOD
    for r in rows:
        cls = r["_row_idx"] % STEREO_CLASS_MOD
        p, g = r["p"], r["g"]
        for led, got in (
            (r["_corr"], p["corr_lr"]),
            (r["_rmsl"], p["rms_l"]),
            (r["_rmsr"], p["rms_r"]),
            (r["_rmsm"], p["rms_mid"]),
            (r["_rmss"], p["rms_side"]),
        ):
            if led is None:
                assert got is None, r["_row_idx"]
            else:
                assert got == led, r["_row_idx"]
        assert p["n_channels"] == r["_nch"] and p["n_samples"] == r["_n"]
        for k, col in (
            ("is_stereo", "_stereo"), ("dual_mono", "_dual"),
            ("out_of_phase", "_phase"), ("imbalanced", "_imb"),
            ("stereo_ok", "_ok"), ("measurable", "_meas"),
        ):
            assert g[k] == r[col], (r["_row_idx"], k)
        # class semantics
        if cls in (0, 5, 7):
            assert r["_ok"] is True
        elif cls == 1:
            assert r["_dual"] is True and r["_ok"] is False
        elif cls == 2:
            assert r["_phase"] is True and r["_ok"] is False
        elif cls in (3, 4):
            assert r["_imb"] is True and r["_ok"] is False
        else:
            assert r["_meas"] is False and r["_ok"] is False


def test_audio_stereo_suite_check(spark):
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import (
        STEREO_CLASS_MOD,
        synth_stereo_screen_clips,
    )

    clips = synth_stereo_screen_clips(spark, 2 * STEREO_CLASS_MOD)
    cfg = {
        "checks": [
            {"name": "stereo", "type": "audio_stereo", "table": "clips",
             "max_violation_rate": 0.0},
            {"name": "stereo_loose", "type": "audio_stereo",
             "table": "clips", "max_violation_rate": 0.63},
        ]
    }
    rep = {
        r["check_name"]: r
        for r in run_suite({"clips": clips}, cfg).collect()
    }
    # classes 1,2,3,4,6 of 8 violate -> rate 5/8
    assert rep["stereo"]["status"] == "fail"
    assert rep["stereo_loose"]["status"] == "pass"
    assert abs(rep["stereo"]["metric"] - 5.0 / 8.0) < 1e-9


def test_suggest_drafts_audio_stereo(spark):
    """Audio-shaped tables draft an audio_stereo check anchored to the
    MEASURED violating rate (must-pass-on-draft-data stance)."""
    from jsonschema_spark.operators.suggest import (
        as_suite_config,
        column_suggestions,
    )
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import (
        STEREO_CLASS_MOD,
        synth_stereo_screen_clips,
    )

    clips = synth_stereo_screen_clips(spark, 2 * STEREO_CLASS_MOD).drop(
        "_row_idx", "_nch", "_corr", "_rmsl", "_rmsr", "_rmsm", "_rmss",
        "_n", "_stereo", "_dual", "_phase", "_imb", "_ok", "_meas",
    )
    cfg = as_suite_config(
        clips, column_suggestions(clips, ["clip_id", "sr_hz"]),
        table="clips",
    )
    st = [c for c in cfg["checks"] if c["type"] == "audio_stereo"]
    assert len(st) == 1
    assert st[0]["max_violation_rate"] >= 5.0 / 8.0
    rep = run_suite({"clips": clips}, {"checks": st}).collect()
    assert rep[0]["status"] == "pass"
