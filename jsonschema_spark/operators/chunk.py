"""Context-window operators for LLM training-data pipelines: split long
documents into fixed token windows (chunking) and attribute documents to
packed training sequences (GPT-style concat-and-chunk packing).

Reference parity note: the reference engine (mark-hartmann/jsonschema) has
no corpus operators — this is training-data-pipeline surface layered on the
validation engine, like dedup/sampling/decontaminate.

Scale shape:
  * ``chunk_documents`` is a single projection + generate (explode of a
    chunk-index sequence) — no shuffle at all; output rows ~= input tokens
    / stride, embarrassingly parallel at 10^12 docs.  The token array is
    materialized in its own projection BEFORE the explode so Catalyst's
    project collapsing cannot re-run ``split`` once per chunk row.
  * ``pack_plan`` is one window function per partition group (source,
    shard, ...). Each group sorts independently — the classic "pack within
    bucket" layout — so parallelism = number of groups and no global sort
    ever happens. Use a hash bucket column for corpora without a natural
    grouping.

Everything is pure Column algebra (codegen'd, no Python), with integer
arithmetic chosen so a DuckDB oracle reproduces each value exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from jsonschema_spark.functions.grid import grid_round

from .text import tokens


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed token windows with overlap: (id_col, chunk_idx, n_tokens,
    chunk_text), one row per window.

    Window i covers tokens [i*stride, i*stride + chunk_tokens) of the
    normalized token stream, stride = chunk_tokens - overlap. A document
    with n <= chunk_tokens tokens yields exactly one (possibly short)
    chunk; otherwise 1 + ceil((n - chunk_tokens) / stride) chunks, the
    last one shorter. Concatenating chunks at stride offsets reproduces
    the token stream exactly (overlap regions duplicated by design).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # own projection: the token array must be materialized before the
    # generate below, or project collapsing re-runs split() per chunk row
    t = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t")).withColumn(
        "_n", F.size("_t")
    )
    n_chunks = F.when(F.col("_n") <= chunk_tokens, F.lit(1)).otherwise(
        (F.lit(1) + F.floor((F.col("_n") - chunk_tokens + stride - 1) / F.lit(stride)))
    )
    ch = t.select(
        F.col(id_col),
        "_t",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks.cast("bigint") - 1)).alias(
            "chunk_idx"
        ),
    )
    piece = F.slice(F.col("_t"), (F.col("chunk_idx") * stride + 1).cast("int"), chunk_tokens)
    return ch.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def pack_plan(
    df: DataFrame,
    budget: int,
    weight_col: str,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Concat-and-chunk packing attribution: which training sequences does
    each document land in?

    Documents are laid end-to-end per ``group_col`` in ascending ``id_col``
    order; training sequence w of a group covers weight span
    [w*budget, (w+1)*budget). Returns per document:

      offset      cumulative weight of all earlier docs in the group
      pack_first  floor(offset / budget) — first sequence touched
      pack_last   floor((offset + weight - 1) / budget) — last sequence
      n_packs     pack_last - pack_first + 1 (straddle count)

    This is the standard GPT-style packing (documents may straddle window
    boundaries); n_packs > 1 rows are exactly the boundary-crossing docs.
    Zero-weight docs sit at their offset with n_packs = 1. NULL ids or
    weights are excluded (they have no deterministic position).
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wt = F.col(weight_col).cast("long")
    off = F.coalesce(F.sum(wt).over(w), F.lit(0).cast("long"))
    first = F.floor(off / F.lit(budget))
    last = F.when(wt > 0, F.floor((off + wt - 1) / F.lit(budget))).otherwise(first)
    return (
        df.where(F.col(id_col).isNotNull() & F.col(weight_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(group_col),
            wt.alias("weight"),
            off.alias("offset"),
            first.alias("pack_first"),
            last.alias("pack_last"),
            (last - first + 1).alias("n_packs"),
        )
    )


def duration_buckets(
    df: DataFrame,
    dur_col: str = "dur_ms",
    bucket_ms: int = 250,
) -> DataFrame:
    """ASR batch-formation prep: assign each clip to a fixed-width
    duration bucket and account the padding cost of batching by bucket.

    Dynamic batching pads every clip in a batch to the batch maximum;
    batching by duration bucket bounds that waste by the bucket width.
    One row per bucket: (bucket, lo_ms, hi_ms, n_clips, total_ms, max_ms,
    padded_ms = n_clips * max_ms, waste_ratio = 1 - total/padded).

    Scale shape: ONE narrow groupBy(bucket) — the bucket id is also the
    natural repartition key for the downstream batch writer, so the
    shuffle that computes this report is the same shuffle that forms
    batches. NULL/negative durations are excluded (surface them with the
    schema checks, not here)."""
    if bucket_ms <= 0:
        raise ValueError("bucket_ms must be positive")
    d = F.col(dur_col).cast("long")
    g = (
        df.where(d.isNotNull() & (d >= 0))
        .groupBy(F.floor(d / F.lit(int(bucket_ms))).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum(d).alias("total_ms"),
            F.max(d).alias("max_ms"),
        )
    )
    padded = (F.col("n_clips") * F.col("max_ms")).alias("padded_ms")
    return g.select(
        F.col("bucket").cast("long").alias("bucket"),
        (F.col("bucket") * F.lit(int(bucket_ms))).cast("long").alias("lo_ms"),
        ((F.col("bucket") + 1) * F.lit(int(bucket_ms))).cast("long").alias("hi_ms"),
        "n_clips",
        "total_ms",
        "max_ms",
        padded,
        F.when(
            (F.col("n_clips") * F.col("max_ms")) > 0,
            grid_round(
                F.lit(1.0)
                - F.col("total_ms").cast("double")
                / (F.col("n_clips") * F.col("max_ms")).cast("double"),
                9,
            ),
        ).otherwise(F.lit(0.0)).alias("waste_ratio"),
    )


def padding_waste_report(
    df: DataFrame,
    dur_col: str = "dur_ms",
    bucket_ms: int = 250,
) -> DataFrame:
    """ONE row quantifying why duration bucketing exists: global padding
    waste (every clip padded to the corpus max — the naive shuffle-free
    batcher) vs bucketed waste (each clip padded to its bucket max).
    Derived from the bucket report alone — per-BUCKET rows, never a
    second pass over the clips."""
    b = duration_buckets(df, dur_col, bucket_ms)
    agg = b.agg(
        F.sum("n_clips").alias("n_clips"),
        F.sum("total_ms").alias("total_ms"),
        F.max("max_ms").alias("global_max_ms"),
        F.sum("padded_ms").alias("bucketed_padded_ms"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    gpad = (F.col("n_clips") * F.col("global_max_ms")).cast("double")
    ratio = lambda num: F.when(  # noqa: E731
        num > 0, grid_round(F.lit(1.0) - F.col("total_ms").cast("double") / num, 9)
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n_clips",
        "n_buckets",
        "total_ms",
        "global_max_ms",
        "bucketed_padded_ms",
        ratio(gpad).alias("global_waste_ratio"),
        ratio(F.col("bucketed_padded_ms").cast("double")).alias(
            "bucketed_waste_ratio"
        ),
    )


def batch_assign(
    df: DataFrame,
    id_col: str = "clip_id",
    dur_col: str = "dur_ms",
    batch_size: int = 16,
    bucket_ms: int = 250,
    n_shards: int = 1,
    seed: str = "",
) -> DataFrame:
    """The actual batch plan behind ``duration_buckets``' accounting:
    assign every clip to a concrete training batch — length-bucketed
    so padding per clip is bounded by ``bucket_ms``, deterministic so
    re-runs and resumed jobs rebuild the identical plan.

        bucket = dur // bucket_ms          (the padding bound)
        shard  = md5_60(seed|id) % n_shards  (the parallelism knob)
        within (bucket, shard): order by (dur, id), batch_idx =
        (row_number-1) // batch_size, pos_in_batch = remainder.

    Scale shape: one window per (bucket, shard) partition — each sorts
    independently, no global sort. A hot bucket (most speech is 2-8 s)
    is split across ``n_shards`` deterministic shards; sharding costs
    only one extra partial batch per (bucket, shard), while the
    per-clip padding stays bounded by the bucket width. ``pad_ms``
    (batch max - clip dur) is computed with a second window over the
    SAME partitioning+ordering — Spark reuses the sort.

    NULL/negative durations and NULL ids are excluded (surface them
    with schema checks); output is (id, dur, bucket, shard, batch_idx,
    pos_in_batch, batch_n, batch_max_ms, pad_ms)."""
    from .sampling import sample_hash

    if batch_size <= 0 or bucket_ms <= 0 or n_shards <= 0:
        raise ValueError("batch_size, bucket_ms, n_shards must be positive")
    d = F.col(dur_col).cast("long")
    base = df.where(
        F.col(id_col).isNotNull() & d.isNotNull() & (d >= 0)
    ).select(
        F.col(id_col).alias("id"),
        d.alias("dur"),
        F.floor(d / F.lit(int(bucket_ms))).alias("bucket"),
        F.pmod(
            sample_hash(F.col(id_col), seed), F.lit(int(n_shards))
        ).alias("shard"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy(
        F.col("dur").asc(), F.col("id").asc()
    )
    assigned = base.select(
        "id",
        "dur",
        "bucket",
        "shard",
        ((F.row_number().over(w) - 1) / F.lit(batch_size))
        .cast("long")
        .alias("batch_idx"),
        F.pmod(F.row_number().over(w) - 1, F.lit(batch_size)).alias(
            "pos_in_batch"
        ),
    )
    wb = Window.partitionBy("bucket", "shard", "batch_idx")
    return assigned.select(
        "id",
        "dur",
        "bucket",
        "shard",
        "batch_idx",
        "pos_in_batch",
        F.count(F.lit(1)).over(wb).alias("batch_n"),
        F.max("dur").over(wb).alias("batch_max_ms"),
        (F.max("dur").over(wb) - F.col("dur")).alias("pad_ms"),
    )
