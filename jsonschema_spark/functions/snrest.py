"""Reference-free SNR / noise-floor screen — recording-quality signals
per clip, in pure numpy (no speech libs).

The engine's decode-PCM SNR (functions/audio.snr_db) measures fidelity
against a KNOWN reference — a transfer-integrity check. Production
corpora have no reference: the question is "how noisy is this
recording?", and the textbook reference-free answer is the
percentile-energy method — speech has pauses, so the quiet frames ARE
the noise floor and the loud frames are speech-plus-noise:

  noise_ms_p10    10th-percentile frame mean-square (linear LSB^2):
                  the noise-floor estimate
  speech_ms_p90   90th-percentile frame mean-square: the active-speech
                  level estimate
  snr_est_db      10*log10(p90/p10) — +inf when the floor is digital
                  zero under real signal (inf survives Arrow; only NaN
                  becomes NULL)
  activity_frac   fraction of frames more than 6 dB above the floor
                  (>= 4x the p10 mean-square)

Frames: 32 ms window / 16 ms hop. The estimate assumes pauses exist; a
clip that is ALL speech (no gaps) under-reports SNR — conservative in
the right direction for a quality gate (it can only over-reject).
Stationary pure noise has p90/p10 near 1 → ~0 dB → too_noisy, which is
the correct verdict for noise mislabeled as speech.

Gates: too_noisy (snr_est_db under ``min_snr_db``), snr_ok,
measurable (enough frames to split percentiles AND a speech level
above an absolute floor — silence and undecodable payloads certify
nothing and must not pass a suite gate).

Scale shape: ONE Arrow hop; O(n) numpy per clip (frame dots + one
sort), no per-frame Python.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column

from jsonschema_spark.functions.audio import decode_payload

__all__ = [
    "snr_profile_one",
    "snr_profile_batch",
    "audio_snr_est",
    "snr_gates",
    "SNR_PROFILE_TYPE",
]

SNR_PROFILE_TYPE = T.StructType(
    [
        T.StructField("snr_est_db", T.DoubleType()),
        T.StructField("noise_ms_p10", T.DoubleType()),
        T.StructField("speech_ms_p90", T.DoubleType()),
        T.StructField("activity_frac", T.DoubleType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
    ]
)

MIN_SNR_DB = 15.0
_WIN_MS = 32
_HOP_MS = 16
_MIN_FRAMES = 10
# same absolute energy floor family as the pitch/tonality screens:
# a "speech level" below 100^2 LSB^2 is digital near-silence
_SPEECH_FLOOR_MS = 10000.0


def _frames(x: np.ndarray, win: int, hop: int) -> np.ndarray:
    k = 1 + (len(x) - win) // hop if len(x) >= win else 0
    if k <= 0:
        return np.zeros((0, win))
    idx = np.arange(win)[None, :] + hop * np.arange(k)[:, None]
    return x[idx]


def snr_profile_one(pcm: np.ndarray, sr: int) -> tuple:
    """(snr_est_db, noise_ms_p10, speech_ms_p90, activity_frac,
    n_frames) for one decoded clip — shared by the batch kernel, the
    synth ledger and unit tests."""
    win = sr * _WIN_MS // 1000
    hop = sr * _HOP_MS // 1000
    fr = _frames(pcm.astype(np.float64), win, hop)
    k = fr.shape[0]
    if k < _MIN_FRAMES:
        return np.nan, np.nan, np.nan, np.nan, int(k)
    ms = (fr * fr).mean(axis=1)
    p10 = float(np.percentile(ms, 10.0))
    p90 = float(np.percentile(ms, 90.0))
    act = float(np.mean(ms > 4.0 * p10))
    if p90 < _SPEECH_FLOOR_MS:
        # no certifiable signal level — silence
        return np.nan, p10, p90, act, int(k)
    if p10 <= 0.0:
        return np.inf, p10, p90, act, int(k)
    return 10.0 * np.log10(p90 / p10), p10, p90, act, int(k)


def snr_profile_batch(payloads: pd.Series, srs: pd.Series) -> pd.DataFrame:
    n = len(payloads)
    sn = np.full(n, np.nan)
    p10 = np.full(n, np.nan)
    p90 = np.full(n, np.nan)
    ac = np.full(n, np.nan)
    kf = np.zeros(n, dtype=np.int64)
    ns = np.full(n, -1, dtype=np.int64)
    for i, (raw, sr) in enumerate(zip(payloads.tolist(), srs.tolist())):
        if raw is None or sr is None or (
            isinstance(sr, float) and np.isnan(sr)
        ):
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
        ns[i] = len(pcm)
        sn[i], p10[i], p90[i], ac[i], kf[i] = snr_profile_one(pcm, int(sr))
    return pd.DataFrame(
        {
            "snr_est_db": sn,
            "noise_ms_p10": p10,
            "speech_ms_p90": p90,
            "activity_frac": ac,
            "n_frames": kf.astype(np.int32),
            "n_samples": ns,
        }
    )


@F.pandas_udf(SNR_PROFILE_TYPE)
def _snr_udf(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
    return snr_profile_batch(p, sr)


def audio_snr_est(
    payload: Column | str = "bytes",
    sr_hz: Column | str = "sr_hz",
) -> Column:
    """struct(snr_est_db, noise_ms_p10, speech_ms_p90, activity_frac,
    n_frames, n_samples) — ONE Arrow hop. Persist the projected struct
    before deriving multiple gate columns (Catalyst project collapsing
    re-runs the UDF)."""
    return _snr_udf(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


def snr_gates(p: Column, min_snr_db: float = MIN_SNR_DB) -> Column:
    """struct(too_noisy, snr_ok, measurable) over an ``audio_snr_est``
    struct — NULL-safe (Arrow nan-as-null; every predicate coalesces
    to False — CLAUDE.md). ``snr_est_db`` of +inf (digital-zero floor
    under real signal) passes snr_ok; NaN (silence, sub-window,
    undecodable) is not measurable and passes nothing."""
    snr = p["snr_est_db"]
    measurable = F.coalesce(
        snr.isNotNull() & ~F.isnan(snr), F.lit(False)
    )
    noisy = F.coalesce(
        measurable & (snr < F.lit(min_snr_db)), F.lit(False)
    )
    ok = measurable & ~noisy
    return F.struct(
        noisy.alias("too_noisy"),
        ok.alias("snr_ok"),
        measurable.alias("measurable"),
    )
