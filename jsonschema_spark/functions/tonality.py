"""Tonality / spectral-flatness screen — synthetic-signal contamination
per clip, in pure numpy (no audio libs).

Web-crawled "speech" corpora carry test tones, DTMF dials, sine sweeps,
beeps and raw static — synthetic signals that poison speech training
runs. The pitch screen (functions/pitch.py) cannot catch them: a pure
tone at any f0 inside 60-400 Hz reads perfectly voiced and passes as
"speechlike", and tones OUTSIDE that band are simply invisible to it.
This screen looks at the whole spectrum instead:

  flat_med   median per-frame spectral flatness (Wiener entropy:
             geometric mean / arithmetic mean of the power spectrum,
             DC excluded). The classic tonality coefficient — ~1 for
             white noise, ~1e-2 for voiced speech (a harmonic stack
             shaped by formants plus an aspiration-noise floor),
             <1e-4 for line spectra (tones, DTMF, per-frame-narrowband
             sweeps). Measured separations on the ledger classes:
             tones+1% noise 4.5e-5, worst speech 2.0e-3, noise 0.56 —
             the 1e-3 / 0.4 defaults sit >=2x from every class.
  line_frac  median fraction of frame energy in the top 8 bins —
             how "line spectrum" each frame is (reported signal).
  dom_stab   modal share of the per-frame dominant bin — a steady
             tone holds ONE bin for the whole clip, a sweep never
             does (separates steady_tone from sweep inside tonal).
  energ_frac fraction of frames above an absolute energy floor
             (digital near-silence has no certifiable spectrum).

Frames: 64 ms window / 32 ms hop, Hann-windowed, one batched rfft over
the (n_frames x win) matrix per clip. Gates: tonal (flat_med under
``max_tonal_flat``), steady_tone (tonal with a stable dominant bin),
noiselike (flat_med above ``min_noise_flat``), spectral_ok,
measurable (>= 1 energetic frame; undecodable/silent clips must not
pass a suite gate).

Scale shape: ONE Arrow hop; O(n_frames * win log win) numpy per clip,
no per-frame Python.
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
    "tonality_profile_one",
    "tonality_profile_batch",
    "audio_tonality",
    "tonality_gates",
    "TONALITY_PROFILE_TYPE",
]

TONALITY_PROFILE_TYPE = T.StructType(
    [
        T.StructField("flat_med", T.DoubleType()),
        T.StructField("line_frac", T.DoubleType()),
        T.StructField("dom_stab", T.DoubleType()),
        T.StructField("energ_frac", T.DoubleType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
    ]
)

MAX_TONAL_FLAT = 1e-3
MIN_NOISE_FLAT = 0.4
MIN_STEADY_STAB = 0.9
_WIN_MS = 64
_HOP_MS = 32
_TOP_BINS = 8
# same absolute per-frame energy floor as the pitch screen: mean square
# >= 100^2 LSB^2 — a spectrum of digital near-silence certifies nothing
_ENERGY_FLOOR_MS = 10000.0


def _frames(x: np.ndarray, win: int, hop: int) -> np.ndarray:
    k = 1 + (len(x) - win) // hop if len(x) >= win else 0
    if k <= 0:
        return np.zeros((0, win))
    idx = np.arange(win)[None, :] + hop * np.arange(k)[:, None]
    return x[idx]


def tonality_profile_one(pcm: np.ndarray, sr: int) -> tuple:
    """(flat_med, line_frac, dom_stab, energ_frac, n_frames) for one
    decoded clip — shared by the batch kernel, the synth ledger and
    unit tests. NaN metrics when no frame clears the energy floor."""
    win = sr * _WIN_MS // 1000
    hop = sr * _HOP_MS // 1000
    fr = _frames(pcm.astype(np.float64), win, hop)
    k = fr.shape[0]
    if k == 0:
        return np.nan, np.nan, np.nan, np.nan, 0
    ms = (fr * fr).mean(axis=1)
    energetic = ms >= _ENERGY_FLOOR_MS
    efrac = float(np.mean(energetic))
    if not energetic.any():
        return np.nan, np.nan, np.nan, efrac, int(k)
    fr = fr - fr.mean(axis=1, keepdims=True)
    spec = np.fft.rfft(fr * np.hanning(win), axis=1)
    power = (spec.real * spec.real + spec.imag * spec.imag)[:, 1:]
    tot = np.maximum(power.sum(axis=1), 1e-300)
    flat = np.exp(np.log(power + 1e-300).mean(axis=1)) / (
        power.mean(axis=1) + 1e-300
    )
    top = np.sort(power, axis=1)[:, -_TOP_BINS:].sum(axis=1) / tot
    dom = np.argmax(power, axis=1)[energetic]
    _, counts = np.unique(dom, return_counts=True)
    return (
        float(np.median(flat[energetic])),
        float(np.median(top[energetic])),
        float(counts.max()) / len(dom),
        efrac,
        int(k),
    )


def tonality_profile_batch(
    payloads: pd.Series, srs: pd.Series
) -> pd.DataFrame:
    n = len(payloads)
    fl = np.full(n, np.nan)
    ln = np.full(n, np.nan)
    st = np.full(n, np.nan)
    ef = np.full(n, np.nan)
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
        fl[i], ln[i], st[i], ef[i], kf[i] = tonality_profile_one(
            pcm, int(sr)
        )
    return pd.DataFrame(
        {
            "flat_med": fl,
            "line_frac": ln,
            "dom_stab": st,
            "energ_frac": ef,
            "n_frames": kf.astype(np.int32),
            "n_samples": ns,
        }
    )


@F.pandas_udf(TONALITY_PROFILE_TYPE)
def _tonality_udf(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
    return tonality_profile_batch(p, sr)


def audio_tonality(
    payload: Column | str = "bytes",
    sr_hz: Column | str = "sr_hz",
) -> Column:
    """struct(flat_med, line_frac, dom_stab, energ_frac, n_frames,
    n_samples) — ONE Arrow hop. Persist the projected struct before
    deriving multiple gate columns (Catalyst project collapsing
    re-runs the UDF)."""
    return _tonality_udf(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


def tonality_gates(
    p: Column,
    max_tonal_flat: float = MAX_TONAL_FLAT,
    min_noise_flat: float = MIN_NOISE_FLAT,
    min_steady_stab: float = MIN_STEADY_STAB,
) -> Column:
    """struct(tonal, steady_tone, noiselike, spectral_ok, measurable)
    over an ``audio_tonality`` struct — NULL-safe (Arrow nan-as-null:
    NaN metrics arrive as NULL; every predicate coalesces to False so
    NULL can never silently pass — CLAUDE.md). ``tonal``: line
    spectrum (test tones, DTMF, sweeps). ``steady_tone``: tonal with
    one dominant bin for the whole clip (a sweep is tonal but never
    steady). ``noiselike``: flat spectrum (static). Undecodable or
    all-quiet clips are not measurable — a gate that cannot certify a
    spectrum must not pass it."""
    flat = p["flat_med"]
    measurable = F.coalesce(
        flat.isNotNull() & ~F.isnan(flat) & (p["n_frames"] > F.lit(0)),
        F.lit(False),
    )
    tonal = F.coalesce(
        measurable & (flat <= F.lit(max_tonal_flat)), F.lit(False)
    )
    stab = p["dom_stab"]
    steady = F.coalesce(
        tonal & stab.isNotNull() & ~F.isnan(stab)
        & (stab >= F.lit(min_steady_stab)),
        F.lit(False),
    )
    noise = F.coalesce(
        measurable & (flat >= F.lit(min_noise_flat)), F.lit(False)
    )
    ok = measurable & ~tonal & ~noise
    return F.struct(
        tonal.alias("tonal"),
        steady.alias("steady_tone"),
        noise.alias("noiselike"),
        ok.alias("spectral_ok"),
        measurable.alias("measurable"),
    )
