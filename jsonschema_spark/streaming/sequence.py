"""Stateful streaming sequence monitor: per-key ordering/gap health.

The streaming counterpart of ``operators.sequence.sequence_profile`` —
a feed monitor that watches every key's event stream across micro-batches
and maintains (n_events, n_null_ts, regressions, dup_ts, max_gap_us,
span_us) with ``applyInPandasWithState``. State is ONE small record per
key (eight counters), so the state store is O(keys), not O(rows); the
per-batch work is vectorized pandas over Arrow batches.

Cross-batch semantics (documented contract):
- Within a batch the full batch-operator arithmetic runs (arrival order =
  (id, ts), timeline order = (ts, id), exact BIGINT microseconds).
- Across batches the state stitches the boundary: the batch's first
  arrival-ordered timestamp is compared against the previous batch's last
  (one boundary regression check — the immediate-predecessor semantics of
  the batch operator's ``lag``), and the batch's earliest timestamp is
  compared against the running ``max_ts`` for the boundary gap/duplicate.
- This reproduces the batch profile EXACTLY when each key's batches
  arrive non-overlapping in time (each batch's earliest ts >= the
  previous batch's latest — the monotone-feed case a monitor watches;
  pinned by ``test_streaming_sequence.py``). For feeds that interleave
  time ranges ACROSS batches, in-batch metrics stay exact and boundary
  gaps/duplicates are approximated from ``max_ts`` — a bounded-state
  monitor cannot re-sort history it has discarded, and says so here
  rather than silently pretending.

Emit mode "update": one refreshed profile row per key per batch it
appears in.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_null_ts", T.LongType(), False),
        T.StructField("regressions", T.LongType(), False),
        T.StructField("dup_ts", T.LongType(), False),
        T.StructField("max_gap_us", T.LongType(), True),
        T.StructField("span_us", T.LongType(), True),
    ]
)
_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_null_ts", T.LongType(), False),
        T.StructField("regressions", T.LongType(), False),
        T.StructField("dup_ts", T.LongType(), False),
        T.StructField("max_gap_us", T.LongType(), True),
        T.StructField("min_ts_us", T.LongType(), True),
        T.StructField("max_ts_us", T.LongType(), True),
        T.StructField("last_arrival_ts_us", T.LongType(), True),
    ]
)


def _batch_profile(b: pd.DataFrame, prev: tuple | None) -> tuple:
    """Fold one micro-batch (columns i, t_us) into the state tuple."""
    (n, nn, reg, dup, max_gap, min_ts, max_ts, last_arr) = prev or (
        0, 0, 0, 0, None, None, None, None
    )
    n += len(b)
    nn += int(b["t_us"].isna().sum())
    nb = b.dropna(subset=["t_us"])
    if len(nb):
        # arrival order: (id, ts) — regressions vs the immediate predecessor
        arr = nb.sort_values(["i", "t_us"], kind="mergesort")["t_us"].to_numpy()
        if len(arr) > 1:
            reg += int((arr[1:] < arr[:-1]).sum())
        if last_arr is not None and arr[0] < last_arr:
            reg += 1  # boundary: first of this batch vs last of previous
        last_arr = int(arr[-1])
        # timeline order: duplicates + gaps
        tl = nb.sort_values(["t_us", "i"], kind="mergesort")["t_us"].to_numpy()
        if len(tl) > 1:
            diffs = tl[1:] - tl[:-1]
            dup += int((diffs == 0).sum())
            gmax = int(diffs.max())
            if gmax > 0 and (max_gap is None or gmax > max_gap):
                max_gap = gmax
        bmin, bmax = int(tl[0]), int(tl[-1])
        if max_ts is not None:
            if bmin == max_ts:
                dup += 1  # boundary duplicate instant
            elif bmin > max_ts:
                g = bmin - max_ts
                if max_gap is None or g > max_gap:
                    max_gap = g
        min_ts = bmin if min_ts is None else min(min_ts, bmin)
        max_ts = bmax if max_ts is None else max(max_ts, bmax)
    return (n, nn, reg, dup, max_gap, min_ts, max_ts, last_arr)


def sequence_monitor(
    stream: DataFrame, key: str, ts_col: str, id_col: str
) -> DataFrame:
    """Streaming DataFrame of per-key sequence profiles, refreshed per batch.

    Columns match ``sequence_profile`` (key, n_events, n_null_ts,
    regressions, dup_ts, max_gap_us, span_us)."""
    src = stream.where(F.col(key).isNotNull()).select(
        F.col(key).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("i"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t_us"),
    )

    def update(
        k: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        prev = tuple(state.get) if state.exists else None
        for b in batches:
            prev = _batch_profile(b, prev)
        state.update(prev)
        n, nn, reg, dup, max_gap, min_ts, max_ts, _ = prev
        span = (max_ts - min_ts) if (max_ts is not None and min_ts is not None) else None
        yield pd.DataFrame(
            {
                "key": [k[0]],
                "n_events": [n],
                "n_null_ts": [nn],
                "regressions": [reg],
                "dup_ts": [dup],
                "max_gap_us": [max_gap],
                "span_us": [span],
            }
        )

    return src.groupBy("key").applyInPandasWithState(
        update, _OUTPUT, _STATE, "update", GroupStateTimeout.NoTimeout
    )
