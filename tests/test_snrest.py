"""Reference-free SNR screen (functions/snrest.py; suite check
audio_snr).

Analytic anchors: the percentile-energy estimate tracks PLANTED SNRs
(alpha-scaled noise against measured speech power) with a small
positive bias (p90 measures speech+noise, and speech-frame variance
picks the loud tail) — monotone, within a few dB; stationary static
reads ~0 dB; a digital-zero floor under real signal reads +inf;
silence and sub-window clips certify nothing.
"""

import numpy as np
import pandas as pd
import pytest

from jsonschema_spark.functions.audio import encode_wav_pcm16
from jsonschema_spark.functions.snrest import (
    snr_profile_batch,
    snr_profile_one,
)
from jsonschema_spark.sources.clips import _gated_speech, _noise_signal

SR = 16000


def _mix(planted_db, n=SR, seed=7):
    s = _gated_speech(140.0, n, seed * (1 << 32))
    nz = _noise_signal(n, seed * (1 << 32) + (1 << 31)).astype(np.float64)
    p_s = float((s[s != 0.0] ** 2).mean())
    p_n = float((nz ** 2).mean())
    a = np.sqrt(p_s / p_n / 10.0 ** (planted_db / 10.0))
    return np.clip(np.round(s + a * nz), -32768, 32767).astype(np.int64)


def test_estimate_tracks_planted_snr():
    prev = np.inf
    for planted in (40.0, 25.0, 15.0, 8.0, 0.0):
        est, p10, p90, act, k = snr_profile_one(_mix(planted), SR)
        assert est == pytest.approx(planted, abs=5.0), planted
        assert est >= planted - 0.5  # bias is positive
        assert est < prev  # monotone in planted SNR
        prev = est


def test_pure_noise_reads_near_zero():
    est, *_ = snr_profile_one(
        _noise_signal(SR, 3 << 33).astype(np.int64), SR
    )
    assert abs(est) < 3.0


def test_digital_zero_floor_reads_inf():
    s = np.round(_gated_speech(140.0, SR, 1 << 40)).astype(np.int64)
    est, p10, *_ = snr_profile_one(s, SR)
    assert np.isinf(est) and p10 == 0.0


def test_silence_and_subwindow_not_measurable():
    est, p10, p90, act, k = snr_profile_one(
        np.zeros(SR, dtype=np.int64), SR
    )
    assert np.isnan(est) and p90 < 10000.0
    est, *_ , k = snr_profile_one(np.ones(1000, dtype=np.int64), SR)
    assert np.isnan(est) and k < 10


def test_activity_fraction():
    # 60% duty cycle -> roughly that fraction of frames 6 dB above floor
    est, _, _, act, _ = snr_profile_one(_mix(30.0), SR)
    assert 0.4 < act < 0.8


def test_batch_failure_sentinels():
    out = snr_profile_batch(
        pd.Series([None, b"RIFF1234WAVEbroken"]), pd.Series([SR, SR])
    )
    assert list(out["n_samples"]) == [-1, -1]
    assert np.isnan(out["snr_est_db"]).all()


def test_snr_ledger_corpus_verifies(spark):
    import pyspark.sql.functions as F

    from jsonschema_spark.functions.snrest import audio_snr_est, snr_gates
    from jsonschema_spark.sources.clips import (
        SNR_CLASS_MOD,
        synth_snr_clips,
    )

    clips = synth_snr_clips(spark, 2 * SNR_CLASS_MOD)
    prof = clips.select(
        "_row_idx", "_planted_db", "_est", "_p10", "_p90", "_act",
        "_nfr", "_n", "_noisy", "_ok", "_meas",
        audio_snr_est("bytes", "sr_hz").alias("p"),
    )
    rows = prof.select("*", snr_gates(F.col("p")).alias("g")).collect()
    assert len(rows) == 2 * SNR_CLASS_MOD
    for r in rows:
        cls = r["_row_idx"] % SNR_CLASS_MOD
        p, g = r["p"], r["g"]
        for led, got in (
            (r["_est"], p["snr_est_db"]), (r["_p10"], p["noise_ms_p10"]),
            (r["_p90"], p["speech_ms_p90"]),
            (r["_act"], p["activity_frac"]),
        ):
            if led is None:
                assert got is None, r["_row_idx"]
            else:
                assert got == led, r["_row_idx"]
        assert p["n_frames"] == r["_nfr"] and p["n_samples"] == r["_n"]
        for k, col in (
            ("too_noisy", "_noisy"), ("snr_ok", "_ok"),
            ("measurable", "_meas"),
        ):
            assert g[k] == r[col], (r["_row_idx"], k)
        # class semantics + estimate-vs-planted tracking
        if cls in (0, 1):
            assert r["_ok"] is True
            assert r["_est"] >= r["_planted_db"] - 0.5
        elif cls in (2, 3):
            assert r["_noisy"] is True
            assert abs(r["_est"] - r["_planted_db"]) < 6.0
        elif cls == 4:
            assert r["_noisy"] is True and abs(r["_est"]) < 3.0
        else:
            assert r["_meas"] is False and r["_ok"] is False


def test_audio_snr_suite_check(spark):
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import (
        SNR_CLASS_MOD,
        synth_snr_clips,
    )

    clips = synth_snr_clips(spark, 2 * SNR_CLASS_MOD)
    cfg = {
        "checks": [
            {"name": "snr", "type": "audio_snr", "table": "clips",
             "max_violation_rate": 0.0},
            {"name": "snr_loose", "type": "audio_snr", "table": "clips",
             "max_violation_rate": 0.72},
        ]
    }
    rep = {
        r["check_name"]: r
        for r in run_suite({"clips": clips}, cfg).collect()
    }
    # classes 2,3,4,5,6 of 7 violate -> rate 5/7
    assert rep["snr"]["status"] == "fail"
    assert rep["snr_loose"]["status"] == "pass"
    assert abs(rep["snr"]["metric"] - 5.0 / 7.0) < 1e-9


def test_suggest_drafts_audio_snr(spark):
    """Audio-shaped tables draft an audio_snr check anchored to the
    MEASURED violating rate (must-pass-on-draft-data stance)."""
    from jsonschema_spark.operators.suggest import (
        as_suite_config,
        column_suggestions,
    )
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import (
        SNR_CLASS_MOD,
        synth_snr_clips,
    )

    clips = synth_snr_clips(spark, 2 * SNR_CLASS_MOD).drop(
        "_row_idx", "_planted_db", "_est", "_p10", "_p90", "_act",
        "_nfr", "_n", "_noisy", "_ok", "_meas",
    )
    cfg = as_suite_config(
        clips, column_suggestions(clips, ["clip_id", "sr_hz"]),
        table="clips",
    )
    sn = [c for c in cfg["checks"] if c["type"] == "audio_snr"]
    assert len(sn) == 1
    assert sn[0]["max_violation_rate"] >= 5.0 / 7.0
    rep = run_suite({"clips": clips}, {"checks": sn}).collect()
    assert rep[0]["status"] == "pass"
