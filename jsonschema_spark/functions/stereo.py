"""Stereo-integrity screen — channel-layout health per clip, in pure
numpy (no audio libs).

Web-crawled "stereo" audio is routinely fake or broken stereo, and each
failure class wastes or poisons training data in its own way:

  dual mono      L == R (or nearly): the file costs 2x storage/IO for
                 zero information over mono — flag for downmix.
  out of phase   R ~ -L: a mono downmix (the engine's own ingestion
                 convention, (l+r)>>1) CANCELS the signal — silent or
                 hollow training audio from a payload that sounds fine
                 in stereo. The classic miswired-cable artifact.
  imbalanced     one dead / near-dead channel (broken capture rig):
                 the downmix halves the level and the "stereo" label
                 lies.

The screen decodes channel-preserving (audio.decode_payload_channels),
then computes per clip: channel count, Pearson correlation of L vs R,
per-channel RMS, and mid/side RMS ((l±r)/2 — the standard M/S
decomposition). Gates derive dual_mono (side/mid RMS ratio under a
floor), out_of_phase (corr below a negative threshold) and imbalanced
(min/max channel RMS under a floor); clips with more than 2 channels
are screened on their FIRST TWO channels (documented convention —
n_channels still reports the true count). Mono clips pass trivially
(nothing to check); undecodable payloads are not measurable and a
suite gate counts them as violating (a gate that cannot certify must
not pass).

Scale shape: ONE Arrow hop; O(n) numpy per clip (a handful of dot
products), no per-sample Python.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column

from jsonschema_spark.functions.audio import decode_payload_channels

__all__ = [
    "stereo_profile_one",
    "stereo_profile_batch",
    "audio_stereo",
    "stereo_gates",
    "STEREO_PROFILE_TYPE",
]

STEREO_PROFILE_TYPE = T.StructType(
    [
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("corr_lr", T.DoubleType()),
        T.StructField("rms_l", T.DoubleType()),
        T.StructField("rms_r", T.DoubleType()),
        T.StructField("rms_mid", T.DoubleType()),
        T.StructField("rms_side", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
    ]
)

# defaults: side/mid < 0.1% -> dual mono; corr <= -0.9 -> out of phase;
# min/max channel RMS < 1% -> dead-channel imbalance
MAX_SIDE_RATIO = 1e-3
MAX_PHASE_CORR = -0.9
MIN_BALANCE = 0.01
_RMS_FLOOR = 1e-12


def _rms(v: np.ndarray) -> float:
    return float(np.sqrt(np.dot(v, v) / len(v)))


def stereo_profile_one(x: np.ndarray) -> tuple:
    """(n_channels, corr_lr, rms_l, rms_r, rms_mid, rms_side) for one
    decoded ``(n, ch)`` clip — shared by the batch kernel, the synth
    ledger and unit tests. NaN marks not-applicable (mono) or
    degenerate (constant-channel correlation)."""
    n, ch = x.shape
    if n == 0:
        return int(ch), np.nan, np.nan, np.nan, np.nan, np.nan
    left = x[:, 0].astype(np.float64)
    rms_l = _rms(left)
    if ch == 1:
        return 1, np.nan, rms_l, np.nan, np.nan, np.nan
    right = x[:, 1].astype(np.float64)
    rms_r = _rms(right)
    rms_mid = _rms((left + right) * 0.5)
    rms_side = _rms((left - right) * 0.5)
    lc = left - left.mean()
    rc = right - right.mean()
    denom = float(np.sqrt(np.dot(lc, lc) * np.dot(rc, rc)))
    corr = float(np.dot(lc, rc)) / denom if denom > 0.0 else np.nan
    return int(ch), corr, rms_l, rms_r, rms_mid, rms_side


def stereo_profile_batch(payloads: pd.Series) -> pd.DataFrame:
    n = len(payloads)
    nch = np.zeros(n, dtype=np.int32)
    corr = np.full(n, np.nan)
    rms_l = np.full(n, np.nan)
    rms_r = np.full(n, np.nan)
    rms_m = np.full(n, np.nan)
    rms_s = np.full(n, np.nan)
    ns = np.full(n, -1, dtype=np.int64)
    for i, raw in enumerate(payloads.tolist()):
        if raw is None:
            continue
        try:
            x = decode_payload_channels(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
        ns[i] = x.shape[0]
        nch[i], corr[i], rms_l[i], rms_r[i], rms_m[i], rms_s[i] = (
            stereo_profile_one(x)
        )
    return pd.DataFrame(
        {
            "n_channels": nch,
            "corr_lr": corr,
            "rms_l": rms_l,
            "rms_r": rms_r,
            "rms_mid": rms_m,
            "rms_side": rms_s,
            "n_samples": ns,
        }
    )


@F.pandas_udf(STEREO_PROFILE_TYPE)
def _stereo_udf(p: pd.Series) -> pd.DataFrame:
    return stereo_profile_batch(p)


def audio_stereo(payload: Column | str = "bytes") -> Column:
    """struct(n_channels, corr_lr, rms_l, rms_r, rms_mid, rms_side,
    n_samples) — ONE Arrow hop. Persist the projected struct before
    deriving multiple gate columns (Catalyst project collapsing
    re-runs the UDF)."""
    return _stereo_udf(
        F.col(payload) if isinstance(payload, str) else payload
    )


def stereo_gates(
    p: Column,
    max_side_ratio: float = MAX_SIDE_RATIO,
    max_phase_corr: float = MAX_PHASE_CORR,
    min_balance: float = MIN_BALANCE,
) -> Column:
    """struct(is_stereo, dual_mono, out_of_phase, imbalanced,
    stereo_ok, measurable) over an ``audio_stereo`` struct — NULL-safe
    (Arrow nan-as-null: NaN doubles arrive as NULL; every predicate is
    coalesced to False so a NULL can never silently pass a gate —
    CLAUDE.md). Mono clips are stereo_ok (nothing to check);
    undecodable clips are not measurable and therefore not ok."""
    measurable = F.coalesce(p["n_samples"] > F.lit(0), F.lit(False))
    is_stereo = F.coalesce(
        measurable & (p["n_channels"] >= F.lit(2)), F.lit(False)
    )
    side, mid = p["rms_side"], p["rms_mid"]
    dual = F.coalesce(
        is_stereo & side.isNotNull() & ~F.isnan(side)
        & (side <= F.lit(max_side_ratio)
           * F.greatest(mid, F.lit(_RMS_FLOOR))),
        F.lit(False),
    )
    corr = p["corr_lr"]
    phase = F.coalesce(
        is_stereo & corr.isNotNull() & ~F.isnan(corr)
        & (corr <= F.lit(max_phase_corr)),
        F.lit(False),
    )
    lo = F.least(p["rms_l"], p["rms_r"])
    hi = F.greatest(p["rms_l"], p["rms_r"], F.lit(_RMS_FLOOR))
    imb = F.coalesce(
        is_stereo & lo.isNotNull() & ~F.isnan(lo)
        & (lo <= F.lit(min_balance) * hi),
        F.lit(False),
    )
    ok = measurable & (~is_stereo | (~dual & ~phase & ~imb))
    return F.struct(
        is_stereo.alias("is_stereo"),
        dual.alias("dual_mono"),
        phase.alias("out_of_phase"),
        imb.alias("imbalanced"),
        ok.alias("stereo_ok"),
        measurable.alias("measurable"),
    )
