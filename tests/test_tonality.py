"""Tonality / spectral-flatness screen (functions/tonality.py; suite
check audio_tonality).

Analytic anchors: a pure tone has near-zero Wiener entropy with a
rock-steady dominant bin (true at ANY frequency — including inside the
pitch band, where the pitch screen calls it "speechlike"); DTMF pairs
and sweeps are line spectra too but a sweep's dominant bin never
settles; avalanche-hash noise sits at high flatness; a formant-shaped
harmonic stack over aspiration noise (the speech proxy) sits orders of
magnitude above the tonal gate and below the noise gate; digital
silence certifies nothing.
"""

import numpy as np
import pandas as pd
import pytest

from jsonschema_spark.functions.audio import encode_wav_pcm16
from jsonschema_spark.functions.tonality import (
    tonality_profile_batch,
    tonality_profile_one,
)

SR = 16000
T1 = np.arange(SR, dtype=np.float64) / SR


def test_pure_tone_any_frequency_is_tonal():
    for f in (120.0, 440.0, 1000.0, 3001.0, 6500.0):
        x = np.round(8000 * np.sin(2 * np.pi * f * T1)).astype(np.int64)
        flat, line, stab, efrac, k = tonality_profile_one(x, SR)
        assert flat < 1e-6, f
        assert line > 0.999 and stab == 1.0 and efrac == 1.0 and k > 0


def test_tone_survives_noise_floor():
    rng = np.random.RandomState(5)
    x = 8000 * np.sin(2 * np.pi * 440 * T1) + rng.randint(-80, 80, SR)
    flat, *_ = tonality_profile_one(np.round(x).astype(np.int64), SR)
    assert flat < 1e-3  # still under the tonal gate with 1% noise


def test_dtmf_is_tonal_and_steady():
    x = 5000 * np.sin(2 * np.pi * 697 * T1) + 5000 * np.sin(
        2 * np.pi * 1209 * T1
    )
    flat, line, stab, *_ = tonality_profile_one(
        np.round(x).astype(np.int64), SR
    )
    assert flat < 1e-6 and line > 0.99 and stab == 1.0


def test_sweep_is_tonal_but_not_steady():
    x = 8000 * np.sin(2 * np.pi * (200 * T1 + 1900 * T1 * T1))
    flat, line, stab, *_ = tonality_profile_one(
        np.round(x).astype(np.int64), SR
    )
    assert flat < 1e-6  # per-frame line spectrum
    assert stab < 0.2  # dominant bin slides every frame


def test_noise_is_flat():
    rng = np.random.RandomState(9)
    x = rng.randint(-8000, 8000, SR).astype(np.int64)
    flat, line, *_ = tonality_profile_one(x, SR)
    assert flat > 0.4 and line < 0.3


def test_speech_proxy_clears_both_gates():
    from jsonschema_spark.sources.clips import _speech_proxy

    for f0 in (90.0, 150.0, 250.0):
        x = _speech_proxy(f0, SR, 12345, 900)
        flat, *_ = tonality_profile_one(x, SR)
        assert 1e-3 < flat < 0.4, f0


def test_silence_and_subwindow_not_measurable():
    flat, line, stab, efrac, k = tonality_profile_one(
        np.zeros(SR, dtype=np.int64), SR
    )
    assert np.isnan(flat) and efrac == 0.0 and k > 0
    flat, _, _, _, k = tonality_profile_one(
        np.ones(100, dtype=np.int64), SR
    )
    assert np.isnan(flat) and k == 0


def test_batch_failure_sentinels():
    out = tonality_profile_batch(
        pd.Series([None, b"RIFF1234WAVEbroken"]), pd.Series([SR, SR])
    )
    assert list(out["n_samples"]) == [-1, -1]
    assert np.isnan(out["flat_med"]).all()


def test_tonality_ledger_corpus_verifies(spark):
    import pyspark.sql.functions as F

    from jsonschema_spark.functions.tonality import (
        audio_tonality,
        tonality_gates,
    )
    from jsonschema_spark.sources.clips import (
        TONALITY_CLASS_MOD,
        synth_tonality_clips,
    )

    clips = synth_tonality_clips(spark, 2 * TONALITY_CLASS_MOD)
    prof = clips.select(
        "_row_idx", "_flat", "_line", "_stab", "_efrac", "_nfr", "_n",
        "_tonal", "_steady", "_noise", "_ok", "_meas",
        audio_tonality("bytes", "sr_hz").alias("p"),
    )
    rows = prof.select(
        "*", tonality_gates(F.col("p")).alias("g")
    ).collect()
    assert len(rows) == 2 * TONALITY_CLASS_MOD
    for r in rows:
        cls = r["_row_idx"] % TONALITY_CLASS_MOD
        p, g = r["p"], r["g"]
        for led, got in (
            (r["_flat"], p["flat_med"]), (r["_line"], p["line_frac"]),
            (r["_stab"], p["dom_stab"]), (r["_efrac"], p["energ_frac"]),
        ):
            if led is None:
                assert got is None, r["_row_idx"]
            else:
                assert got == led, r["_row_idx"]
        assert p["n_frames"] == r["_nfr"] and p["n_samples"] == r["_n"]
        for k, col in (
            ("tonal", "_tonal"), ("steady_tone", "_steady"),
            ("noiselike", "_noise"), ("spectral_ok", "_ok"),
            ("measurable", "_meas"),
        ):
            assert g[k] == r[col], (r["_row_idx"], k)
        # class semantics
        if cls in (0, 5):
            assert r["_ok"] is True
        elif cls in (1, 2):
            assert r["_tonal"] is True and r["_steady"] is True
        elif cls == 3:
            assert r["_tonal"] is True and r["_steady"] is False
        elif cls == 4:
            assert r["_noise"] is True
        else:
            assert r["_meas"] is False and r["_ok"] is False


def test_audio_tonality_suite_check(spark):
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import (
        TONALITY_CLASS_MOD,
        synth_tonality_clips,
    )

    clips = synth_tonality_clips(spark, 2 * TONALITY_CLASS_MOD)
    cfg = {
        "checks": [
            {"name": "spectral", "type": "audio_tonality",
             "table": "clips", "max_violation_rate": 0.0},
            {"name": "spectral_loose", "type": "audio_tonality",
             "table": "clips", "max_violation_rate": 0.76},
        ]
    }
    rep = {
        r["check_name"]: r
        for r in run_suite({"clips": clips}, cfg).collect()
    }
    # classes 1,2,3,4,6,7 of 8 violate -> rate 6/8
    assert rep["spectral"]["status"] == "fail"
    assert rep["spectral_loose"]["status"] == "pass"
    assert abs(rep["spectral"]["metric"] - 6.0 / 8.0) < 1e-9


def test_suggest_drafts_audio_tonality(spark):
    """Audio-shaped tables draft an audio_tonality check anchored to
    the MEASURED violating rate (must-pass-on-draft-data stance)."""
    from jsonschema_spark.operators.suggest import (
        as_suite_config,
        column_suggestions,
    )
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import (
        TONALITY_CLASS_MOD,
        synth_tonality_clips,
    )

    clips = synth_tonality_clips(spark, 2 * TONALITY_CLASS_MOD).drop(
        "_row_idx", "_flat", "_line", "_stab", "_efrac", "_nfr", "_n",
        "_tonal", "_steady", "_noise", "_ok", "_meas",
    )
    cfg = as_suite_config(
        clips, column_suggestions(clips, ["clip_id", "sr_hz"]),
        table="clips",
    )
    tn = [c for c in cfg["checks"] if c["type"] == "audio_tonality"]
    assert len(tn) == 1
    assert tn[0]["max_violation_rate"] >= 6.0 / 8.0
    rep = run_suite({"clips": clips}, {"checks": tn}).collect()
    assert rep[0]["status"] == "pass"
