"""Streaming gap sessionization with watermark-bounded state.

The streaming face of :func:`jsonschema_spark.operators.temporal.sessionize`:
the same native ``F.session_window`` aggregation, run incrementally. The
state store holds ONE open session per (key, gap window); the watermark
closes a session once event time has advanced past ``session_end +
watermark``, emits its final row (append mode), and drops the state —
state is bounded by (active keys x open sessions), never by history.

Batch/stream parity: both paths use ``F.session_window`` with the same
gap, so an event merges into the current session iff it arrives at most
``gap_s`` after the previous event. ``session_idx`` and
``idle_before_us`` need the key's full ordered history and are therefore
batch-only columns; the streaming output identifies a session by its
(key, n_events, min/max event id, duration) content, which is what the
parity test compares.

Scale: one shuffle per micro-batch on the key (the session-window
aggregation exchange); final rows append to any sink. No driver loops,
no collect, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    stream: DataFrame,
    key: str,
    ts_col: str,
    gap_s: float,
    id_col: str,
    watermark: str = "10 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Watermarked per-key session aggregation over an event stream.

    Output (append mode, one row per CLOSED session): key, ``n_events``,
    ``min_event_id`` / ``max_event_id``, ``duration_us`` and — when
    ``value_col`` is given — ``sum_value_c`` (exact cents). Rows with a
    NULL key or NULL timestamp are dropped (a session is a position on
    the key's timeline; see the batch operator's docstring).
    """
    gap_us = int(round(gap_s * 1_000_000))
    base = stream.where(
        F.col(key).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key).alias("k"),
        F.col(ts_col).alias("t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t_us"),
        F.col(id_col).cast("bigint").alias("i"),
        *(
            [F.floor(F.col(value_col) * 100 + F.lit(0.5)).alias("v_c")]
            if value_col is not None
            else []
        ),
    )
    return (
        base.withWatermark("t", watermark)
        .groupBy("k", F.session_window("t", f"{gap_us} microseconds").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("i").alias("min_event_id"),
            F.max("i").alias("max_event_id"),
            (F.max("t_us") - F.min("t_us")).alias("duration_us"),
            *(
                [F.sum("v_c").alias("sum_value_c")]
                if value_col is not None
                else []
            ),
        )
        .select(
            F.col("k").alias(key),
            "n_events",
            "min_event_id",
            "max_event_id",
            "duration_us",
            *(["sum_value_c"] if value_col is not None else []),
        )
    )
