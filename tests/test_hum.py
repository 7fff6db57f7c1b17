"""Mains-hum / DC-offset screen (functions/audio.py: hum_profile_batch,
audio_hum, hum_gates; operators/suite.py: audio_hum check).

Anchors are ANALYTIC, independent of the kernel: a pure tone of known
amplitude A riding program of known mean square must read within
tolerance of 10*log10((A^2/2) / mean(xd^2)) and tower over its ±7 Hz
flanks; a line-free clip must show near-zero prominence; a planted DC
bias must read exactly mean/32768 (integer samples in, one
correctly-rounded IEEE mean out).
"""

import numpy as np
import pandas as pd
import pytest

from jsonschema_spark.functions.audio import (
    encode_wav_pcm16,
    hum_profile_batch,
)

SR = 16000


def _noise(n, seed=1):
    # line-free program: smoothed deterministic noise (8-tap MA)
    rng = np.random.RandomState(seed)
    x = rng.randint(-6000, 6000, n + 8).astype(np.int64)
    c = np.concatenate(([0], np.cumsum(x)))
    return (c[8:] - c[:-8])[:n] // 8


def _profile(pcm, sr=SR):
    raw = encode_wav_pcm16(pcm, sr)
    return hum_profile_batch(pd.Series([raw]), pd.Series([sr])).iloc[0]


def test_pure_60hz_tone_reads_analytic_level_and_prominence():
    n = SR  # 1 s
    t = np.arange(n) * (2 * np.pi / SR)
    prog = _noise(n)
    amp = 1500.0
    x = np.clip(
        np.floor(prog + amp * np.sin(60.0 * t) + 0.5), -32768, 32767
    ).astype(np.int64)
    led = _profile(x)
    xd = x.astype(np.float64) - x.mean()
    expect = 10 * np.log10((amp * amp / 2) / np.mean(xd * xd))
    assert abs(led["hum_dbr_60"] - expect) < 0.2
    assert led["hum_prom_60"] > 20  # a line towers over its flanks
    # the 50 Hz family must NOT light up on a 60 Hz tone
    assert led["hum_prom_50"] < 10


def test_harmonic_family_pools_power():
    n = SR
    t = np.arange(n) * (2 * np.pi / SR)
    prog = _noise(n, seed=2)
    x = np.clip(
        np.floor(
            prog + 1200 * np.sin(50 * t) + 600 * np.sin(100 * t)
            + 300 * np.sin(150 * t) + 0.5
        ),
        -32768, 32767,
    ).astype(np.int64)
    led = _profile(x)
    xd = x.astype(np.float64) - x.mean()
    expect = 10 * np.log10(
        ((1200**2 + 600**2 + 300**2) / 2) / np.mean(xd * xd)
    )
    assert abs(led["hum_dbr_50"] - expect) < 0.3
    assert led["hum_prom_50"] > 20
    assert led["hum_prom_60"] < 10


def test_line_free_program_shows_no_prominence():
    led = _profile(_noise(SR, seed=3))
    # leakage puts SOME power in the mains bins, but no LINE: the
    # prominence over ±7 Hz flanks stays near 0 dB
    assert led["hum_prom_50"] < 10 and led["hum_prom_60"] < 10
    assert abs(led["dc_offset"]) < 0.005


def test_dc_offset_is_exact_mean():
    x = _noise(SR, seed=4) + 1638  # ~5% FS
    x = np.clip(x, -32768, 32767).astype(np.int64)
    led = _profile(x)
    assert led["dc_offset"] == x.astype(np.float64).mean() / 32768.0
    assert abs(led["dc_offset"] - 0.05) < 0.01


def test_short_clip_gates_on_dc_alone():
    x = _noise(SR // 10)  # 100 ms < the 200 ms resolution window
    led = _profile(x)
    assert np.isnan(led["hum_dbr_50"]) and np.isnan(led["hum_prom_60"])
    assert not np.isnan(led["dc_offset"])
    assert led["n_samples"] == SR // 10


def test_failure_modes():
    raw = encode_wav_pcm16(_noise(SR), SR)
    led = hum_profile_batch(
        pd.Series([raw[:25], None]), pd.Series([SR, SR])
    )
    assert led["n_samples"].tolist() == [-1, -1]
    assert np.isnan(led["dc_offset"]).all()
    # digitally silent clip: DC defined (0), hum undefined
    silent = encode_wav_pcm16(np.zeros(SR, dtype=np.int64), SR)
    led = hum_profile_batch(pd.Series([silent]), pd.Series([SR])).iloc[0]
    assert led["dc_offset"] == 0.0
    assert np.isnan(led["hum_dbr_60"])


def test_hum_ledger_corpus_verifies(spark):
    from jsonschema_spark.functions.audio import audio_hum, hum_gates
    from jsonschema_spark.sources.clips import (
        HUM_CLASS_MOD,
        synth_hum_clips,
    )
    import pyspark.sql.functions as F

    clips = synth_hum_clips(spark, 2 * HUM_CLASS_MOD)
    prof = clips.select(
        "_row_idx", "_dc", "_h50", "_h60", "_p50", "_p60", "_n",
        audio_hum("bytes", "sr_hz").alias("h"),
    )
    rows = prof.select(
        "*", hum_gates(F.col("h")).alias("g")
    ).collect()
    assert len(rows) == 2 * HUM_CLASS_MOD
    for r in rows:
        cls = r["_row_idx"] % HUM_CLASS_MOD
        h = r["h"]
        # distributed kernel must land on the synth-time ledger EXACTLY
        for led, got in ((r["_dc"], h["dc_offset"]),
                         (r["_h50"], h["hum_dbr_50"]),
                         (r["_h60"], h["hum_dbr_60"]),
                         (r["_p50"], h["hum_prom_50"]),
                         (r["_p60"], h["hum_prom_60"])):
            if led is None or np.isnan(led):
                assert got is None or np.isnan(got), r["_row_idx"]
            else:
                assert got == led, r["_row_idx"]
        assert h["n_samples"] == r["_n"], r["_row_idx"]
        g = r["g"]
        if cls == 0:
            assert g["hum_ok"] and not g["hum_suspect"]
        elif cls in (1, 2):
            assert g["hum_suspect"] and not g["hum_ok"]
        elif cls == 3:
            assert g["dc_suspect"] and not g["hum_ok"]
        elif cls == 4:
            assert g["hum_ok"]  # short: DC fine, hum unresolvable
        else:  # torn: gates must be STRICT booleans, never NULL
            assert g["hum_ok"] is False and g["hum_suspect"] is False
            assert g["dc_suspect"] is False


def test_audio_hum_suite_check(spark):
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import (
        HUM_CLASS_MOD,
        synth_hum_clips,
    )

    clips = synth_hum_clips(spark, 2 * HUM_CLASS_MOD)
    cfg = {
        "checks": [
            {"name": "hum_gate", "type": "audio_hum", "table": "clips",
             "max_violation_rate": 0.0},
            {"name": "hum_gate_loose", "type": "audio_hum",
             "table": "clips", "max_violation_rate": 0.7},
        ]
    }
    rep = {
        r["check_name"]: r
        for r in run_suite({"clips": clips}, cfg).collect()
    }
    # classes 1,2,3,5 of 6 violate -> rate 4/6: strict fails, loose passes
    assert rep["hum_gate"]["status"] == "fail"
    assert rep["hum_gate_loose"]["status"] == "pass"
    assert abs(rep["hum_gate"]["metric"] - 4.0 / 6.0) < 1e-9


def test_suggest_drafts_hum_gate_that_passes_on_draft_data(spark):
    from jsonschema_spark.operators.suggest import (
        as_suite_config,
        column_suggestions,
    )
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import (
        HUM_CLASS_MOD,
        synth_hum_clips,
    )

    clips = synth_hum_clips(spark, 2 * HUM_CLASS_MOD).drop(
        "_row_idx", "_dc", "_h50", "_h60", "_p50", "_p60", "_n"
    )
    cfg = as_suite_config(
        clips, column_suggestions(clips, ["clip_id", "sr_hz"]),
        table="clips",
    )
    hum = [c for c in cfg["checks"] if c["type"] == "audio_hum"]
    assert len(hum) == 1
    # 4 of 6 classes violate; ceiled measured rate must admit them
    assert hum[0]["max_violation_rate"] >= 4.0 / 6.0
    rep = run_suite({"clips": clips}, {"checks": hum}).collect()
    assert rep[0]["status"] == "pass"
