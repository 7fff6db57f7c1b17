"""Dropout / click screen — transport-damage artifacts per clip, in
pure numpy (no audio libs).

Two artifact families that survive every container check (the bytes
are well-formed) but poison training audio:

  dropouts   runs of EXACT digital zero inside the signal region —
             the packet-loss / buffer-underrun concealment signature.
             Real room recordings have a noise floor and never sit at
             exact zero for tens of milliseconds; concealment does.
             Leading/trailing silence is NOT a dropout (clips are
             routinely padded); only runs strictly inside the
             first..last-nonzero interior count, at >= ``min_drop_ms``.
  clicks     single-sample impulses (glitches, seam pops). Detector:
             the two-sided opposite-sign criterion — an impulse makes
             BOTH neighboring first differences large with OPPOSITE
             signs, while speech's big diffs (zero crossings of
             low-f0 swings) are same-sign and its opposite-sign pairs
             (waveform peaks) are small. Score = min(|d[i-1]|, |d[i]|)
             gated on opposite signs; click when score >
             max(2 * p99(|d|), 2500). Measured margins: worst speech
             proxy 0.60 x p99, avalanche noise 1.09 x p99, planted
             impulses >= 3.4 x p99 — the 2x threshold sits >= 1.8x
             from every class.

Both detectors are exact integer/order-statistic arithmetic — the
ledger corpus plants dropouts and clicks by GENERATOR arithmetic and
the oracle requires the detector to recover the planted counts and
durations EXACTLY (stronger than kernel-replay truth).

Gates: has_dropouts, clicky, artifact_ok, measurable (a clip with no
nonzero sample has no signal region and certifies nothing).

Scale shape: ONE Arrow hop; O(n) numpy per clip (diffs, one
percentile), no per-sample Python.
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
    "artifact_profile_one",
    "artifact_profile_batch",
    "audio_artifacts",
    "artifact_gates",
    "ARTIFACT_PROFILE_TYPE",
]

ARTIFACT_PROFILE_TYPE = T.StructType(
    [
        T.StructField("n_dropouts", T.IntegerType()),
        T.StructField("dropout_ms", T.LongType()),
        T.StructField("max_dropout_ms", T.LongType()),
        T.StructField("n_clicks", T.IntegerType()),
        T.StructField("click_thr", T.DoubleType()),
        T.StructField("interior_n", T.LongType()),
        T.StructField("n_samples", T.LongType()),
    ]
)

MIN_DROP_MS = 20
_CLICK_P99_MULT = 2.0
_CLICK_ABS_FLOOR = 2500.0


def artifact_profile_one(
    pcm: np.ndarray, sr: int, min_drop_ms: int = MIN_DROP_MS
) -> tuple:
    """(n_dropouts, dropout_ms, max_dropout_ms, n_clicks, click_thr,
    interior_n) for one decoded clip — shared by the batch kernel, the
    synth ledger verification and unit tests."""
    x = np.asarray(pcm, dtype=np.int64)
    nz = np.flatnonzero(x)
    if len(nz) == 0:
        return 0, 0, 0, 0, np.nan, 0
    core = x[nz[0]: nz[-1] + 1]
    # exact-zero runs inside the signal region
    z = (core == 0).astype(np.int8)
    edges = np.diff(np.concatenate((np.int8([0]), z, np.int8([0]))))
    runs = np.flatnonzero(edges == -1) - np.flatnonzero(edges == 1)
    min_run = sr * min_drop_ms // 1000
    drops = runs[runs >= min_run]
    n_drop = int(len(drops))
    drop_ms = int(drops.sum() * 1000 // sr) if n_drop else 0
    max_ms = int(drops.max() * 1000 // sr) if n_drop else 0
    # two-sided opposite-sign impulse detector
    d = np.diff(core.astype(np.float64))
    if len(d) < 2:
        return n_drop, drop_ms, max_ms, 0, np.nan, int(len(core))
    thr = max(
        _CLICK_P99_MULT * float(np.percentile(np.abs(d), 99.0)),
        _CLICK_ABS_FLOOR,
    )
    opp = (d[:-1] * d[1:]) < 0.0
    score = np.minimum(np.abs(d[:-1]), np.abs(d[1:]))
    n_click = int(((score > thr) & opp).sum())
    return n_drop, drop_ms, max_ms, n_click, thr, int(len(core))


def artifact_profile_batch(
    payloads: pd.Series, srs: pd.Series
) -> pd.DataFrame:
    n = len(payloads)
    nd = np.zeros(n, dtype=np.int64)
    dm = np.zeros(n, dtype=np.int64)
    mx = np.zeros(n, dtype=np.int64)
    nc = np.zeros(n, dtype=np.int64)
    th = np.full(n, np.nan)
    it = np.zeros(n, dtype=np.int64)
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
        nd[i], dm[i], mx[i], nc[i], th[i], it[i] = artifact_profile_one(
            pcm, int(sr)
        )
    return pd.DataFrame(
        {
            "n_dropouts": nd.astype(np.int32),
            "dropout_ms": dm,
            "max_dropout_ms": mx,
            "n_clicks": nc.astype(np.int32),
            "click_thr": th,
            "interior_n": it,
            "n_samples": ns,
        }
    )


@F.pandas_udf(ARTIFACT_PROFILE_TYPE)
def _artifact_udf(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
    return artifact_profile_batch(p, sr)


def audio_artifacts(
    payload: Column | str = "bytes",
    sr_hz: Column | str = "sr_hz",
) -> Column:
    """struct(n_dropouts, dropout_ms, max_dropout_ms, n_clicks,
    click_thr, interior_n, n_samples) — ONE Arrow hop. Persist the
    projected struct before deriving multiple gate columns (Catalyst
    project collapsing re-runs the UDF)."""
    return _artifact_udf(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


def artifact_gates(p: Column) -> Column:
    """struct(has_dropouts, clicky, artifact_ok, measurable) over an
    ``audio_artifacts`` struct — NULL-safe (every predicate coalesces
    to False — CLAUDE.md). A clip with no nonzero sample has no signal
    region: not measurable, not ok."""
    measurable = F.coalesce(
        (p["n_samples"] > F.lit(0)) & (p["interior_n"] > F.lit(0)),
        F.lit(False),
    )
    drops = F.coalesce(
        measurable & (p["n_dropouts"] > F.lit(0)), F.lit(False)
    )
    clicks = F.coalesce(
        measurable & (p["n_clicks"] > F.lit(0)), F.lit(False)
    )
    ok = measurable & ~drops & ~clicks
    return F.struct(
        drops.alias("has_dropouts"),
        clicks.alias("clicky"),
        ok.alias("artifact_ok"),
        measurable.alias("measurable"),
    )
