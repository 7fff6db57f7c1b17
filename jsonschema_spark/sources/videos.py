"""Deterministic ledger video corpus (REAL Y4M / YUV4MPEG2 payloads) for
the video frame-sampling contract query.

Every row is a genuine YUV4MPEG2 stream (the uncompressed interchange
format ffmpeg/mjpegtools speak — functions/multimodal.encode_y4m), tiny
8x8 frames so the DuckDB oracle can re-slice the SAME parquet bytes and
recompute every sampled frame's mean luma from hex arithmetic alone:

  header        fixed 39 bytes ("YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C420jpeg\\n")
  frame block   102 bytes = 6 ("FRAME\\n") + 64 (Y) + 32 (U+V @ 4:2:0)
  Y pixel p of frame f of row i = (i*7 + f*13 + p*3) % 256

Planted defect (_row_idx % 11 == 4): the stream is TRUNCATED 10 bytes
mid-final-frame while the ``n_frames`` metadata still claims the full
count — the torn-upload signature. Complete frames = n_frames - 1 for
those rows, so the expected ``decode_ok`` of every sampled index is pure
ledger arithmetic.

Oracle-cache protocol: materialized once under /tmp/jss_oracle_cache
(atomic rename); bump ``_VIDEOS_VER`` when generator arithmetic changes.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from jsonschema_spark.functions.multimodal import encode_y4m
from jsonschema_spark.sources.clips import _MATERIALIZE_ROOT, publish_once

_VIDEOS_VER = "v1"
VID_W = VID_H = 8
Y4M_HEADER_LEN = 39
Y4M_FRAME_LEN = 6 + VID_W * VID_H + 2 * ((VID_H // 2) * (VID_W // 2))  # 102
TRUNC_MOD = 11
TRUNC_CLS = 4
TRUNC_BYTES = 10

VIDEOS_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("_row_idx", T.LongType(), False),
    ]
)


def video_n_frames(i: int) -> int:
    return 4 + (i % 7)


def video_frames(i: int) -> np.ndarray:
    """(n_frames, 8, 8) uint8 luma stack for ledger row i."""
    n = video_n_frames(i)
    f = np.arange(n, dtype=np.int64)[:, None]
    p = np.arange(VID_W * VID_H, dtype=np.int64)[None, :]
    y = (i * 7 + f * 13 + p * 3) % 256
    return y.astype(np.uint8).reshape(n, VID_H, VID_W)


def _row(i: int) -> tuple:
    raw = encode_y4m(video_frames(i))
    if i % TRUNC_MOD == TRUNC_CLS:
        raw = raw[:-TRUNC_BYTES]
    return (
        f"vid-{i:06d}",
        bytearray(raw),
        VID_W,
        VID_H,
        video_n_frames(i),
        i,
    )


def synth_videos(
    spark: SparkSession, n: int, partitions: Optional[int] = None
) -> DataFrame:
    """Deterministic Y4M video table with the planted truncation ledger."""
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(range(n), parts).map(_row),
        VIDEOS_SCHEMA,
    )


def videos_path(n: int) -> str:
    return os.path.join(_MATERIALIZE_ROOT, f"videos_{_VIDEOS_VER}_{n}")


def materialized_videos(spark: SparkSession, n: int) -> tuple[DataFrame, str]:
    """Video ledger table materialized once (oracle-cache protocol); the
    DuckDB oracle reads the SAME files and re-slices the Y planes."""
    path = videos_path(n)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        publish_once(synth_videos(spark, n), path)
    return spark.read.parquet(path), path
