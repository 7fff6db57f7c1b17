"""Pitch / voicing screen — speech-plausibility signals per clip, in
pure numpy (no speech libs).

A corpus labeled "speech" should mostly contain voiced frames whose
fundamental frequency sits in the human range; a corpus of music, tones
or noise mislabeled as speech is the kind of large-scale contamination
a validation engine must surface. The screen frames each clip (40 ms
window, 20 ms hop), computes the normalized autocorrelation (NACF) per
frame via batched FFTs (all frames of a clip transform in one numpy
call), and searches the lag window for the human f0 range [60, 400] Hz:

  voiced_frac   fraction of frames with NACF peak > 0.5 AND energy
                above an absolute floor (digital silence is not voiced)
  f0_median_hz  median sr/lag* over voiced frames (argmax takes the
                SMALLEST lag among ties, so harmonically rich periodic
                frames resolve to the fundamental, not a subharmonic)
  n_frames      frames analyzed (0 when shorter than one window)
  n_samples     decoded count (-1 on decode failure)

NACF-threshold pitch tracking is the textbook method (autocorrelation
pitch detection; the 0.5 voicing threshold is the classic operating
point) — deliberately simple, deterministic, and vectorized: per clip
the only Python is one rfft/irfft pair over the (n_frames x nfft)
matrix and a handful of argmax/median reductions.

Scale shape: one Arrow hop; O(n_frames · nfft log nfft) numpy per clip,
no per-frame Python.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column

from jsonschema_spark.functions.audio import decode_payload

__all__ = [
    "pitch_profile_batch",
    "audio_pitch",
    "pitch_gates",
    "PITCH_PROFILE_TYPE",
]

PITCH_PROFILE_TYPE = T.StructType(
    [
        T.StructField("f0_median_hz", T.DoubleType()),
        T.StructField("voiced_frac", T.DoubleType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
    ]
)

F0_LO_HZ = 60.0
F0_HI_HZ = 400.0
NACF_VOICED = 0.5
# absolute per-frame energy floor: mean square >= 100^2 (LSB^2 units) —
# digital near-silence must not count as voiced no matter how periodic
_ENERGY_FLOOR_MS = 10000.0
_WIN_MS = 40
_HOP_MS = 20


def _frames(x: np.ndarray, win: int, hop: int) -> np.ndarray:
    k = 1 + (len(x) - win) // hop if len(x) >= win else 0
    if k <= 0:
        return np.zeros((0, win))
    idx = np.arange(win)[None, :] + hop * np.arange(k)[:, None]
    return x[idx]


def pitch_profile_one(pcm: np.ndarray, sr: int) -> tuple:
    """(f0_median_hz, voiced_frac, n_frames) for one decoded clip —
    shared by the batch kernel, the synth ledger and unit tests."""
    win = sr * _WIN_MS // 1000
    hop = sr * _HOP_MS // 1000
    fr = _frames(pcm.astype(np.float64), win, hop)
    k = fr.shape[0]
    if k == 0:
        return np.nan, np.nan, 0
    fr = fr - fr.mean(axis=1, keepdims=True)
    nfft = 1 << int(np.ceil(np.log2(2 * win)))
    spec = np.fft.rfft(fr, nfft, axis=1)
    ac = np.fft.irfft(spec * np.conj(spec), nfft, axis=1)[:, :win]
    r0 = ac[:, 0]
    lag_lo = max(1, int(sr / F0_HI_HZ))
    lag_hi = min(win - 1, int(sr / F0_LO_HZ))
    if lag_hi <= lag_lo:
        return np.nan, np.nan, int(k)
    window = ac[:, lag_lo:lag_hi + 1]
    best = np.argmax(window, axis=1)  # first max == smallest lag on ties
    peak = window[np.arange(k), best]
    safe_r0 = np.maximum(r0, 1e-300)
    nacf = peak / safe_r0
    energy_ms = r0 / win
    voiced = (nacf > NACF_VOICED) & (energy_ms >= _ENERGY_FLOOR_MS)
    vf = float(np.mean(voiced))
    if not voiced.any():
        return np.nan, vf, int(k)
    f0 = float(sr) / (best[voiced] + lag_lo)
    return float(np.median(f0)), vf, int(k)


def pitch_profile_batch(payloads: pd.Series, srs: pd.Series) -> pd.DataFrame:
    n = len(payloads)
    f0 = np.full(n, np.nan)
    vf = np.full(n, np.nan)
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
        f0[i], vf[i], kf[i] = pitch_profile_one(pcm, int(sr))
    return pd.DataFrame(
        {"f0_median_hz": f0, "voiced_frac": vf,
         "n_frames": kf.astype(np.int32), "n_samples": ns}
    )


@F.pandas_udf(PITCH_PROFILE_TYPE)
def _pitch_udf(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
    return pitch_profile_batch(p, sr)


def audio_pitch(
    payload: Column | str = "bytes",
    sr_hz: Column | str = "sr_hz",
) -> Column:
    """struct(f0_median_hz, voiced_frac, n_frames, n_samples) — ONE
    Arrow hop. Persist the projected struct before deriving multiple
    gate columns (Catalyst project collapsing re-runs the UDF)."""
    return _pitch_udf(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


def pitch_gates(
    p: Column,
    min_voiced_frac: float = 0.2,
    f0_lo_hz: float = F0_LO_HZ,
    f0_hi_hz: float = F0_HI_HZ,
) -> Column:
    """struct(speechlike, unvoiced, measurable) over an ``audio_pitch``
    struct — NULL-safe (Arrow nan-as-null: guard with isNotNull, not
    isnan alone — CLAUDE.md). ``speechlike``: enough voiced frames AND
    a median f0 inside the human range. ``unvoiced``: measurable but
    voiced_frac below the floor (noise / ambience mislabeled as
    speech). Undecodable / sub-window clips are not ``measurable`` —
    a speech-corpus suite gate should treat them as violating (a gate
    that cannot certify must not pass)."""
    vf, f0 = p["voiced_frac"], p["f0_median_hz"]
    measurable = F.coalesce(
        vf.isNotNull() & ~F.isnan(vf) & (p["n_frames"] > F.lit(0)),
        F.lit(False),
    )
    speech = F.coalesce(
        measurable & (vf >= F.lit(min_voiced_frac))
        & f0.isNotNull() & ~F.isnan(f0)
        & (f0 >= F.lit(f0_lo_hz)) & (f0 <= F.lit(f0_hi_hz)),
        F.lit(False),
    )
    unvoiced = F.coalesce(
        measurable & (vf < F.lit(min_voiced_frac)), F.lit(False)
    )
    return F.struct(
        speech.alias("speechlike"),
        unvoiced.alias("unvoiced"),
        measurable.alias("measurable"),
    )
