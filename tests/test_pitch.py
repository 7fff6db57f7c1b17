"""Pitch / voicing screen (functions/pitch.py; suite check audio_pitch).

Analytic anchors: a planted fundamental is recovered within the integer
lag quantization (sr/lag grid), harmonically rich frames resolve to the
FUNDAMENTAL (smallest lag among NACF ties), noise and digital silence
read unvoiced, and the energy floor keeps quiet periodicity from
counting as voice.
"""

import numpy as np
import pandas as pd
import pytest

from jsonschema_spark.functions.audio import encode_wav_pcm16
from jsonschema_spark.functions.pitch import (
    pitch_profile_batch,
    pitch_profile_one,
)

SR = 16000


def _voiced(f0, n, seed=1, amp=6000.0, noise=300):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / SR
    x = np.zeros(n)
    for h in range(1, 9):
        x += (amp / h) * np.sin(2 * np.pi * f0 * h * t + 0.3 * h)
    x += rng.randint(-noise, noise, n)
    return np.clip(np.round(x), -32768, 32767).astype(np.int64)


def test_fundamental_recovered_within_lag_grid():
    for f0 in (90.0, 120.0, 150.0, 250.0, 330.0):
        got, vf, k = pitch_profile_one(_voiced(f0, SR), SR)
        # the estimate is sr/lag for an integer lag within one step of
        # the true period (noise + windowing can shift the discrete max
        # by a lag), hence within ~2% of truth at these f0s
        lag = SR / got
        assert abs(lag - round(lag)) < 1e-9, f0
        assert abs(lag - SR / f0) <= 1.0, f0
        assert abs(got - f0) / f0 < 0.02, f0
        assert vf == 1.0 and k == 49


def test_pure_sine_is_voiced_at_its_period():
    t = np.arange(SR) / SR
    sine = np.round(8000 * np.sin(2 * np.pi * 120 * t)).astype(np.int64)
    f0, vf, _ = pitch_profile_one(sine, SR)
    assert vf == 1.0 and abs(f0 - 120) < 3


def test_noise_and_silence_read_unvoiced():
    rng = np.random.RandomState(9)
    noise = rng.randint(-8000, 8000, SR).astype(np.int64)
    f0, vf, k = pitch_profile_one(noise, SR)
    assert vf == 0.0 and np.isnan(f0) and k == 49
    f0, vf, _ = pitch_profile_one(np.zeros(SR, dtype=np.int64), SR)
    assert vf == 0.0 and np.isnan(f0)


def test_energy_floor_blocks_quiet_periodicity():
    t = np.arange(SR) / SR
    quiet = np.round(40 * np.sin(2 * np.pi * 120 * t)).astype(np.int64)
    _, vf, _ = pitch_profile_one(quiet, SR)  # ms = 800 < 10000 floor
    assert vf == 0.0


def test_mixed_clip_voiced_fraction():
    half = SR // 2
    rng = np.random.RandomState(3)
    pcm = np.concatenate(
        [_voiced(140.0, half), rng.randint(-8000, 8000, half)]
    ).astype(np.int64)
    f0, vf, _ = pitch_profile_one(pcm, SR)
    assert 0.35 < vf < 0.65
    assert abs(f0 - 140) < 4


def test_sub_window_and_failures():
    f0, vf, k = pitch_profile_one(_voiced(120.0, 300), SR)
    assert k == 0 and np.isnan(f0) and np.isnan(vf)
    raw = encode_wav_pcm16(_voiced(120.0, SR), SR)
    out = pitch_profile_batch(
        pd.Series([raw[:25], None]), pd.Series([SR, SR])
    )
    assert out["n_samples"].tolist() == [-1, -1]
    assert out["n_frames"].tolist() == [0, 0]


def test_pitch_ledger_corpus_verifies(spark):
    import pyspark.sql.functions as F

    from jsonschema_spark.functions.pitch import audio_pitch, pitch_gates
    from jsonschema_spark.sources.clips import (
        PITCH_CLASS_MOD,
        synth_pitch_clips,
    )

    clips = synth_pitch_clips(spark, 2 * PITCH_CLASS_MOD)
    prof = clips.select(
        "_row_idx", "_f0", "_vf", "_nfr", "_n", "_speech", "_unvoiced",
        "_meas", audio_pitch("bytes", "sr_hz").alias("p"),
    )
    rows = prof.select("*", pitch_gates(F.col("p")).alias("g")).collect()
    assert len(rows) == 2 * PITCH_CLASS_MOD
    for r in rows:
        cls = r["_row_idx"] % PITCH_CLASS_MOD
        p, g = r["p"], r["g"]
        for led, got in ((r["_f0"], p["f0_median_hz"]),
                         (r["_vf"], p["voiced_frac"])):
            if led is None or np.isnan(led):
                assert got is None or np.isnan(got), r["_row_idx"]
            else:
                assert got == led, r["_row_idx"]
        assert p["n_frames"] == r["_nfr"] and p["n_samples"] == r["_n"]
        assert g["speechlike"] == r["_speech"], r["_row_idx"]
        assert g["unvoiced"] == r["_unvoiced"], r["_row_idx"]
        assert g["measurable"] == r["_meas"], r["_row_idx"]
        # class semantics: voiced classes speechlike, noise unvoiced,
        # short/torn unmeasurable
        if cls in (0, 2, 3):
            assert r["_speech"] is True
        elif cls == 1:
            assert r["_unvoiced"] is True
        else:
            assert r["_meas"] is False


def test_audio_pitch_suite_check(spark):
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import (
        PITCH_CLASS_MOD,
        synth_pitch_clips,
    )

    clips = synth_pitch_clips(spark, 2 * PITCH_CLASS_MOD)
    cfg = {
        "checks": [
            {"name": "speech", "type": "audio_pitch", "table": "clips",
             "max_violation_rate": 0.0},
            {"name": "speech_loose", "type": "audio_pitch",
             "table": "clips", "max_violation_rate": 0.51},
        ]
    }
    rep = {
        r["check_name"]: r
        for r in run_suite({"clips": clips}, cfg).collect()
    }
    # classes 1 (noise), 4 (short), 5 (torn) of 6 violate -> rate 3/6
    assert rep["speech"]["status"] == "fail"
    assert rep["speech_loose"]["status"] == "pass"
    assert abs(rep["speech"]["metric"] - 0.5) < 1e-9


def test_suggest_drafts_audio_pitch(spark):
    """Audio-shaped tables draft an audio_pitch check anchored to the
    MEASURED not-speechlike rate (must-pass-on-draft-data stance)."""
    from jsonschema_spark.operators.suggest import (
        as_suite_config,
        column_suggestions,
    )
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import (
        PITCH_CLASS_MOD,
        synth_pitch_clips,
    )

    clips = synth_pitch_clips(spark, 2 * PITCH_CLASS_MOD).drop(
        "_row_idx", "_f0", "_vf", "_nfr", "_n",
        "_speech", "_unvoiced", "_meas",
    )
    cfg = as_suite_config(
        clips, column_suggestions(clips, ["clip_id", "sr_hz"]),
        table="clips",
    )
    pitch = [c for c in cfg["checks"] if c["type"] == "audio_pitch"]
    assert len(pitch) == 1
    # 3 of 6 classes are not speechlike; ceiled rate must admit them
    assert pitch[0]["max_violation_rate"] >= 3.0 / 6.0
    rep = run_suite({"clips": clips}, {"checks": pitch}).collect()
    assert rep[0]["status"] == "pass"
