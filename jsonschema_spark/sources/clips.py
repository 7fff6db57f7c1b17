"""Deterministic synthetic clips source (FIXTURES.md F1).

clips(clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
      transcript string)

Generation is fully distributed: ``spark.range`` drives a ``mapInPandas``
generator, so payload synthesis runs on executors in Arrow batches — the
driver never materializes a row. Everything derives arithmetically from the
row index / md5(clip_id), so regeneration is bit-identical at any scale and
any partitioning (seed 42 convention, FIXTURES.md synthesis rules).

Planted violations (deterministic by index; period => known a-priori rates):
- i % 199 == 198  -> duplicate clip_id (uniqueness check, ~0.5%)
- i % 97  == 96   -> sr_hz = 12345 (enum violation, ~1%)
- i % 101 == 100  -> dur_ms out of [200, 30000] (range violation, ~1%)
- i % 103 == 102  -> codec "amr" (enum violation, ~1%; decodes as raw PCM so
                     the enum violation is not shadowed by the SNR check)
- i % 107 == 106  -> empty transcript (minLength violation, ~1%)
- i % 109 == 108  -> corrupted payload (SNR < 30 dB, ~1%)
- i % 211 == 210  -> transcript mismatch vs reference (~0.5%)
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from jsonschema_spark.functions.audio import (
    encode_payload,
    pcm16_from_float,
    reference_signal,
)

CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
    ]
)

SR_CHOICES = (8000, 16000, 22050, 44100, 48000)
CODEC_CHOICES = ("pcm_s16le", "flac", "opus")

_WORDS = (
    "the quick brown fox jumps over a lazy dog while rain falls on green "
    "hills and children sing old songs near the river bank at dusk"
).split()

# The flagship compile input (FIXTURES.md F1).
CLIPS_JSON_SCHEMA = {
    "$id": "https://example.com/clips.schema.json",
    "type": "object",
    "required": ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"],
    "properties": {
        "clip_id": {"type": "string", "pattern": "^clip-\\d{12}$"},
        "bytes": {"contentMediaType": "audio/*"},
        "sr_hz": {"enum": list(SR_CHOICES)},
        "dur_ms": {"type": "integer", "minimum": 200, "maximum": 30000},
        "codec": {"enum": list(CODEC_CHOICES)},
        "transcript": {"type": "string", "minLength": 1, "maxLength": 500},
    },
    "additionalProperties": False,
}


def clips_schema() -> dict:
    return CLIPS_JSON_SCHEMA


def _clip_id(i: int) -> str:
    if i % 199 == 198 and i > 0:
        i = i - 1  # planted duplicate
    return f"clip-{i:012d}"


def _hash(i: int) -> int:
    return int.from_bytes(hashlib.md5(f"row-{i}".encode()).digest()[:8], "little")


def transcript_for(clip_id: str) -> str:
    """Reference transcript, regenerable from clip_id alone (row invariant).
    Single source of truth shared with the checker (functions/audio)."""
    from jsonschema_spark.functions.audio import reference_transcript

    return reference_transcript(clip_id)


def _gen_batch(ids: np.ndarray, dur_min: int, dur_max: int, violations: bool) -> pd.DataFrame:
    rows = {k: [] for k in ("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")}
    log_lo, log_hi = np.log(dur_min), np.log(dur_max)
    for i in ids.tolist():
        h = _hash(i)
        cid = _clip_id(i) if violations else f"clip-{i:012d}"

        # sr: 70% hot at 16000 (deliberate skew for salting/AQE paths)
        r = h % 100
        if r < 70:
            sr = 16000
        else:
            sr = SR_CHOICES[(h >> 8) % len(SR_CHOICES)]

        u = ((h >> 16) % 1_000_000) / 1_000_000.0
        dur = int(np.exp(log_lo + u * (log_hi - log_lo)))

        c = (h >> 24) % 100
        codec = "pcm_s16le" if c < 80 else ("flac" if c < 90 else "opus")

        transcript = transcript_for(cid)

        if violations:
            if i % 97 == 96:
                sr = 12345
            if i % 101 == 100:
                dur = 50 if (h & 1) else 45000
            if i % 103 == 102:
                codec = "amr"
            if i % 107 == 106:
                transcript = ""
            if i % 211 == 210:
                transcript = transcript + " xyzzy"

        n_samples = sr * dur // 1000
        sig = reference_signal(cid, n_samples)
        if violations and i % 109 == 108:
            # corruption: strong additive tone not in the reference
            t = np.arange(n_samples, dtype=np.float64)
            sig = sig + 0.6 * np.sin(2 * np.pi * 1234.5 * t / 16000.0 + 0.7)
        payload = encode_payload(pcm16_from_float(sig), codec)

        rows["clip_id"].append(cid)
        rows["bytes"].append(payload)
        rows["sr_hz"].append(sr)
        rows["dur_ms"].append(dur)
        rows["codec"].append(codec)
        rows["transcript"].append(transcript)
    return pd.DataFrame(rows)


def synth_clips(
    spark: SparkSession,
    n: int,
    partitions: Optional[int] = None,
    dur_range: tuple[int, int] = (200, 2000),
    violations: bool = True,
) -> DataFrame:
    """Distributed deterministic clips table. ``dur_range`` bounds the
    *generated* durations (payload size control); the schema's legal range
    stays [200, 30000] and planted violations fall outside it."""
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)
    dur_min, dur_max = dur_range

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            yield _gen_batch(ids, dur_min, dur_max, violations)

    return (
        spark.range(0, n, 1, parts)
        .mapInPandas(gen, schema=CLIPS_SCHEMA)
    )


def codecs_dim(spark: SparkSession) -> DataFrame:
    """Tiny codec dimension for referential checks (broadcast side)."""
    return spark.createDataFrame(
        [("pcm_s16le", "wav"), ("flac", "flac"), ("opus", "ogg")],
        ["codec", "container"],
    )
