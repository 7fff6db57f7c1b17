"""Audio quality signals (functions/audio.audio_quality_batch + gates).

Pins: kernel values on known waveforms, the planted-class margins the
clips_audio_quality ledger oracle relies on, the one-Arrow-hop plan shape,
and the curation-funnel quality stage.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.functions.audio import (
    audio_quality,
    audio_quality_batch,
    encode_payload,
    pcm16_from_float,
    quality_gates,
    reference_signal,
)
from jsonschema_spark.sources.clips import (
    QUALITY_CLASS_MOD,
    QUALITY_CLS_CLIPPED,
    QUALITY_CLS_HALF_SILENT,
    QUALITY_CLS_QUIET,
    synth_quality_clips,
)


def _payload(x: np.ndarray) -> bytes:
    return encode_payload(pcm16_from_float(x), "pcm_s16le")


def _one(raw, sr=16000):
    return audio_quality_batch(pd.Series([raw]), pd.Series([sr])).iloc[0]


def test_kernel_sine_loudness():
    # full-scale-ish sine: rms = amp/sqrt(2) -> dBFS = 20log10(amp) - 3.01
    t = np.arange(16000)
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t / 16000.0)
    q = _one(_payload(x))
    assert q["rms_dbfs"] == pytest.approx(20 * np.log10(0.5) - 3.01, abs=0.05)
    assert q["peak_dbfs"] == pytest.approx(20 * np.log10(0.5), abs=0.01)
    assert q["silence_frac"] == 0.0
    assert q["clipping_frac"] == 0.0
    assert q["n_samples"] == 16000


def test_kernel_silence_fraction_exact():
    # 100 frames of 320 samples; zero out exactly 30 frames
    x = 0.5 * np.sin(2 * np.pi * 300.0 * np.arange(32000) / 16000.0)
    x[: 30 * 320] = 0.0
    q = _one(_payload(x))
    assert q["silence_frac"] == pytest.approx(0.3, abs=1e-9)


def test_kernel_clipping_detected():
    x = 1.5 * np.sin(2 * np.pi * 200.0 * np.arange(8000) / 16000.0)
    q = _one(_payload(x))
    # |1.5 sin| >= 1 for 1-(2/pi)asin(1/1.5) ~ 0.535 of the period
    # (sampled on a 80-samples/period grid -> small discretization bias)
    assert q["clipping_frac"] == pytest.approx(1 - (2 / np.pi) * np.arcsin(2 / 3),
                                               abs=0.02)
    assert q["peak_dbfs"] == pytest.approx(0.0, abs=0.01)


def test_kernel_all_zero_is_silent_minus_inf():
    q = _one(_payload(np.zeros(4000)))
    assert q["rms_dbfs"] == -np.inf
    assert q["silence_frac"] == 1.0


def test_kernel_null_and_garbage_payloads():
    q = audio_quality_batch(
        pd.Series([None, b"RIFF1234WAVEtrunc"]), pd.Series([16000, 16000])
    )
    assert list(q["n_samples"]) == [-1, -1]
    assert np.isnan(q["rms_dbfs"]).all()


def test_planted_class_margins():
    """The margins the ledger oracle depends on: every planted class clears
    its gate threshold by a wide factor across the amplitude range."""
    payloads, srs, cls = [], [], []
    for i in range(120):
        cid = f"clip-{i:012d}"
        n = 8000
        sig = reference_signal(cid, n).astype(np.float64)
        c = i % QUALITY_CLASS_MOD
        if c == QUALITY_CLS_HALF_SILENT:
            sig[n // 2 :] = 0.0
        elif c == QUALITY_CLS_CLIPPED:
            sig = sig * 2.2
        elif c == QUALITY_CLS_QUIET:
            sig = sig * 0.001
        payloads.append(_payload(sig))
        srs.append(16000)
        cls.append(c)
    q = audio_quality_batch(pd.Series(payloads), pd.Series(srs))
    q["cls"] = cls
    planted_silent = q[q.cls == QUALITY_CLS_HALF_SILENT]
    assert (planted_silent.silence_frac > 0.4).all()
    assert (q[q.cls == QUALITY_CLS_CLIPPED].clipping_frac > 0.1).all()
    assert (q[q.cls == QUALITY_CLS_QUIET].rms_dbfs < -60).all()
    clean = q[~q.cls.isin([QUALITY_CLS_HALF_SILENT, QUALITY_CLS_CLIPPED,
                           QUALITY_CLS_QUIET])]
    assert (clean.silence_frac == 0.0).all()
    assert (clean.clipping_frac == 0.0).all()
    assert (clean.rms_dbfs > -15).all()


def test_gates_end_to_end(spark):
    clips = synth_quality_clips(spark, 120, partitions=4)
    g = quality_gates(audio_quality("bytes", "sr_hz"))
    out = clips.select(
        "_row_idx",
        g["silent"].alias("silent"),
        g["clipped"].alias("clipped"),
        g["too_quiet"].alias("too_quiet"),
        g["pass"].alias("ok"),
    ).collect()
    for r in out:
        c = r["_row_idx"] % QUALITY_CLASS_MOD
        assert r["silent"] == (c in (QUALITY_CLS_HALF_SILENT, QUALITY_CLS_QUIET))
        assert r["clipped"] == (c == QUALITY_CLS_CLIPPED)
        assert r["too_quiet"] == (c == QUALITY_CLS_QUIET)
        assert r["ok"] == (
            c not in (QUALITY_CLS_HALF_SILENT, QUALITY_CLS_CLIPPED, QUALITY_CLS_QUIET)
        )


def test_single_arrow_hop_plan(spark):
    """The whole signal family costs ONE ArrowEvalPython node even when
    four gate columns reference the struct."""
    clips = synth_quality_clips(spark, 12, partitions=2)
    g = quality_gates(audio_quality("bytes", "sr_hz"))
    df = clips.select(
        "clip_id", g["silent"].alias("s"), g["clipped"].alias("c"),
        g["too_quiet"].alias("q"), g["pass"].alias("p"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") <= 1


def test_curate_quality_stage(spark):
    """Funnel attribution: planted defect classes are counted as
    quality_rejected, clean rows survive."""
    from jobs.curate_clips_job import curate_clips

    clips = synth_quality_clips(spark, 120, partitions=4).drop("_row_idx")
    _curated, stats = curate_clips(
        clips, snr_threshold_db=None, quality_gate=True
    )
    # 120 rows, 10 per class: 3 defect classes -> 30 rejected
    assert stats["input_rows"] == 120
    assert stats["schema_invalid"] == 0
    assert stats["quality_rejected"] == 30
    assert stats["output_rows"] == 90
