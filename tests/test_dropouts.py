"""Dropout / click screen (functions/dropouts.py; suite check
audio_artifacts).

Analytic anchors: planted exact-zero runs are recovered with EXACT
counts and durations (forced-nonzero boundaries pin run length);
leading/trailing silence is never a dropout; sub-threshold zero runs
don't count; planted impulses are recovered exactly by the two-sided
opposite-sign criterion while the worst speech proxy and avalanche
noise never false-positive (measured 0.60x / 1.09x p99 vs the 2x
threshold).
"""

import numpy as np
import pandas as pd
import pytest

from jsonschema_spark.functions.dropouts import (
    artifact_profile_batch,
    artifact_profile_one,
)
from jsonschema_spark.sources.clips import _noise_signal, _speech_proxy

SR = 16000


def _speech(seed=7, n=SR, noise=800):
    return _speech_proxy(140.0, n, seed * (1 << 32), noise)


def test_planted_dropouts_exact():
    x = _speech()
    spans = ((3000, 480), (9000, 800), (13000, 1600))
    for s, ln in spans:
        x[s:s + ln] = 0
        x[s - 1] = x[s - 1] or 137
        x[s + ln] = x[s + ln] or 137
    nd, dms, mdms, nc, thr, itn = artifact_profile_one(x, SR)
    assert nd == 3 and nc == 0
    assert dms == (480 + 800 + 1600) * 1000 // SR
    assert mdms == 1600 * 1000 // SR


def test_edge_silence_is_not_a_dropout():
    x = _speech()
    x[:4000] = 0
    x[-4000:] = 0
    nd, *_ = artifact_profile_one(x, SR)
    assert nd == 0


def test_short_zero_runs_dont_count():
    x = _speech()
    x[5000:5000 + SR * 10 // 1000] = 0  # 10 ms < 20 ms floor
    nd, *_ = artifact_profile_one(x, SR)
    assert nd == 0


def test_planted_clicks_exact():
    x = _speech()
    quiet = np.flatnonzero(
        (np.abs(x[:-2]) < 2500)
        & (np.abs(np.roll(x, 1)[:-2]) < 2500)
        & (np.abs(np.roll(x, -1)[:-2]) < 2500)
    )
    quiet = quiet[(quiet > 100) & (quiet < len(x) - 100)]
    picks, last = [], -(10 ** 9)
    for q in quiet:
        if q - last >= 100:
            picks.append(int(q))
            last = q
        if len(picks) == 5:
            break
    assert len(picks) == 5
    for q in picks:
        x[q] = 28000 if (q & 1) else -28000
    nd, _, _, nc, thr, _ = artifact_profile_one(x, SR)
    assert nc == 5 and nd == 0


def test_speech_and_noise_never_false_positive():
    for seed in (1, 2, 3):
        nd, _, _, nc, *_ = artifact_profile_one(_speech(seed), SR)
        assert nd == 0 and nc == 0
    nd, _, _, nc, *_ = artifact_profile_one(
        _noise_signal(SR, 9 << 33).astype(np.int64), SR
    )
    assert nd == 0 and nc == 0


def test_all_zero_has_no_signal_region():
    nd, dms, mdms, nc, thr, itn = artifact_profile_one(
        np.zeros(SR, dtype=np.int64), SR
    )
    assert itn == 0 and np.isnan(thr)


def test_batch_failure_sentinels():
    out = artifact_profile_batch(
        pd.Series([None, b"RIFF1234WAVEbroken"]), pd.Series([SR, SR])
    )
    assert list(out["n_samples"]) == [-1, -1]
    assert list(out["interior_n"]) == [0, 0]


def test_dropout_ledger_corpus_verifies(spark):
    import pyspark.sql.functions as F

    from jsonschema_spark.functions.dropouts import (
        artifact_gates,
        audio_artifacts,
    )
    from jsonschema_spark.sources.clips import (
        DROPOUT_CLASS_MOD,
        synth_dropout_clips,
    )

    clips = synth_dropout_clips(spark, 2 * DROPOUT_CLASS_MOD)
    prof = clips.select(
        "_row_idx", "_nd", "_dms", "_mdms", "_nc", "_thr", "_int", "_n",
        "_drop", "_click", "_ok", "_meas",
        audio_artifacts("bytes", "sr_hz").alias("p"),
    )
    rows = prof.select(
        "*", artifact_gates(F.col("p")).alias("g")
    ).collect()
    assert len(rows) == 2 * DROPOUT_CLASS_MOD
    for r in rows:
        cls = r["_row_idx"] % DROPOUT_CLASS_MOD
        p, g = r["p"], r["g"]
        assert p["n_dropouts"] == r["_nd"], r["_row_idx"]
        assert p["dropout_ms"] == r["_dms"], r["_row_idx"]
        assert p["max_dropout_ms"] == r["_mdms"], r["_row_idx"]
        assert p["n_clicks"] == r["_nc"], r["_row_idx"]
        if r["_thr"] is None:
            assert p["click_thr"] is None
        else:
            assert p["click_thr"] == r["_thr"]
        assert p["interior_n"] == r["_int"] and p["n_samples"] == r["_n"]
        for k, col in (
            ("has_dropouts", "_drop"), ("clicky", "_click"),
            ("artifact_ok", "_ok"), ("measurable", "_meas"),
        ):
            assert g[k] == r[col], (r["_row_idx"], k)
        # class semantics; counts are generator arithmetic
        if cls == 0:
            assert r["_ok"] is True
        elif cls == 1:
            assert r["_drop"] is True and r["_nd"] >= 2
        elif cls == 2:
            assert r["_click"] is True and r["_nc"] >= 3
        elif cls == 3:
            assert r["_drop"] is True and r["_click"] is True
        else:
            assert r["_meas"] is False and r["_ok"] is False


def test_audio_artifacts_suite_check(spark):
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import (
        DROPOUT_CLASS_MOD,
        synth_dropout_clips,
    )

    clips = synth_dropout_clips(spark, 2 * DROPOUT_CLASS_MOD)
    cfg = {
        "checks": [
            {"name": "art", "type": "audio_artifacts", "table": "clips",
             "max_violation_rate": 0.0},
            {"name": "art_loose", "type": "audio_artifacts",
             "table": "clips", "max_violation_rate": 0.84},
        ]
    }
    rep = {
        r["check_name"]: r
        for r in run_suite({"clips": clips}, cfg).collect()
    }
    # classes 1,2,3,4,5 of 6 violate -> rate 5/6
    assert rep["art"]["status"] == "fail"
    assert rep["art_loose"]["status"] == "pass"
    assert abs(rep["art"]["metric"] - 5.0 / 6.0) < 1e-9


def test_suggest_drafts_audio_artifacts(spark):
    """Audio-shaped tables draft an audio_artifacts check anchored to
    the MEASURED violating rate (must-pass-on-draft-data stance)."""
    from jsonschema_spark.operators.suggest import (
        as_suite_config,
        column_suggestions,
    )
    from jsonschema_spark.operators.suite import run_suite
    from jsonschema_spark.sources.clips import (
        DROPOUT_CLASS_MOD,
        synth_dropout_clips,
    )

    clips = synth_dropout_clips(spark, 2 * DROPOUT_CLASS_MOD).drop(
        "_row_idx", "_nd", "_dms", "_mdms", "_nc", "_thr", "_int", "_n",
        "_drop", "_click", "_ok", "_meas",
    )
    cfg = as_suite_config(
        clips, column_suggestions(clips, ["clip_id", "sr_hz"]),
        table="clips",
    )
    ar = [c for c in cfg["checks"] if c["type"] == "audio_artifacts"]
    assert len(ar) == 1
    assert ar[0]["max_violation_rate"] >= 5.0 / 6.0
    rep = run_suite({"clips": clips}, {"checks": ar}).collect()
    assert rep[0]["status"] == "pass"
