"""Streaming sequence monitor (streaming/sequence.py): per-key ordering/gap
profiles accumulate across micro-batches and — for time-ordered feeds —
converge exactly to the batch sequence_profile."""

import datetime as dt

from pyspark.sql import functions as F

from jsonschema_spark.operators.sequence import sequence_profile
from jsonschema_spark.streaming.sequence import sequence_monitor


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


ROWS = [
    # key u: in-batch regression (batch 1), boundary gap (batch 2 starts 100s on)
    ("u", 1, _ts(0)),
    ("u", 2, _ts(10)),
    ("u", 3, _ts(5)),       # regression within batch 1
    ("u", 4, _ts(110)),     # batch 2: 100s boundary gap after t=10
    ("u", 5, _ts(120)),
    # key v: duplicate instant exactly at the batch boundary
    ("v", 1, _ts(0)),
    ("v", 2, _ts(7)),
    ("v", 3, _ts(7)),       # batch 2 first event == prev batch max ts
    ("v", 4, _ts(9)),
    # key w: one NULL ts in batch 2
    ("w", 1, _ts(0)),
    ("w", 2, None),
]
SPLIT = {  # id threshold per key: ids <= threshold land in batch 1
    "u": 3, "v": 2, "w": 1,
}
SCHEMA = "k string, i int, t timestamp"


def _run_stream(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    cond = None
    for k, thr in SPLIT.items():
        c = (F.col("k") == k) & (F.col("i") <= thr)
        cond = c if cond is None else (cond | c)
    first, second = df.filter(cond), df.filter(~cond)

    src = str(tmp_path / "src")
    first.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = sequence_monitor(stream, "k", "t", "i")
    q = (
        out.writeStream.format("memory")
        .queryName("seq_monitor")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    second.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    latest = {}
    for r in spark.sql("SELECT * FROM seq_monitor").collect():
        if r.key not in latest or r.n_events > latest[r.key].n_events:
            latest[r.key] = r
    return df, latest


def test_streaming_matches_batch_on_time_ordered_feed(spark, tmp_path):
    """Non-overlapping batches (each batch's earliest ts >= previous
    latest): the streaming profile equals the batch operator exactly,
    including the boundary gap, boundary duplicate, and NULL counting."""
    df, latest = _run_stream(spark, tmp_path)
    batch = {r.k: r for r in sequence_profile(df, "k", "t", "i").collect()}
    assert set(latest) == set(batch)
    for k, b in batch.items():
        s = latest[k]
        assert (s.n_events, s.n_null_ts, s.regressions, s.dup_ts) == (
            b.n_events, b.n_null_ts, b.regressions, b.dup_ts
        ), k
        assert s.max_gap_us == b.max_gap_us, k
        assert s.span_us == b.span_us, k


def test_streaming_specific_verdicts(spark, tmp_path):
    _df, latest = _run_stream(spark, tmp_path)
    u, v, w = latest["u"], latest["v"], latest["w"]
    assert u.regressions == 1 and u.max_gap_us == 100_000_000
    assert v.dup_ts == 1 and v.regressions == 0
    assert w.n_events == 2 and w.n_null_ts == 1 and w.max_gap_us is None
