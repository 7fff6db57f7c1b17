"""Sub-document (block-level) deduplication — boilerplate removal.

The CCNet / RefinedWeb pipelines dedup at LINE granularity before any
document-level pass: headers, cookie banners, nav text and license
footers repeat across millions of pages, and removing them improves both
dedup recall downstream (documents differing only in chrome become exact
duplicates) and model quality. This module is that stage adapted to token
blocks: split each document into NON-overlapping fixed-token blocks,
count how many distinct documents each block text occurs in, drop blocks
whose document frequency reaches ``min_doc_freq``, and reassemble the
surviving blocks in order.

Reference parity note: the reference engine (mark-hartmann/jsonschema)
has no corpus operators — this is training-data-pipeline surface layered
on the validation engine, like dedup/chunk/decontaminate.

Scale shape (10^12 docs):
  * blocking reuses ``chunk.chunk_documents`` with overlap=0 — one
    projection + one generate, zero shuffles.
  * document frequency is ONE groupBy on ``md5(block_text)`` (fixed-width
    shuffle key regardless of block bytes, partial aggregation map-side).
  * the common-block set (doc_freq >= threshold) is tiny relative to the
    corpus — boilerplate by definition repeats — so the join back is
    AQE-broadcast in practice; never forced (a pathological corpus where
    half the blocks are common must not OOM the driver).
  * reassembly is one groupBy doc_id over the flagged blocks.
  No windows, no global sort, no Python anywhere.

Known limitation (documented, inherent to block alignment): repeated text
is only caught when it occupies the same token-window-relative span, i.e.
prefix boilerplate and exact-multiple-of-block inserts. Line-keyed
corpora should block on real line boundaries instead (split on newline
rather than fixed windows) — same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .chunk import chunk_documents


def doc_blocks(
    df: DataFrame,
    block_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Non-overlapping ``block_tokens``-token windows of the normalized
    token stream: (id_col, chunk_idx, n_tokens, chunk_text). Concatenating
    blocks in chunk_idx order reproduces the normalized text exactly."""
    return chunk_documents(
        df, chunk_tokens=block_tokens, overlap=0, text_col=text_col, id_col=id_col
    )


def block_doc_freq(
    blocks: DataFrame, id_col: str = "doc_id", text_col: str = "chunk_text"
) -> DataFrame:
    """Distinct-document frequency per block text: (block_md5, doc_freq).

    Grouping on md5 keeps the shuffle key fixed-width (16 bytes) no matter
    how long the block text is; countDistinct is the exact two-phase
    aggregate (boilerplate candidates must not be approximated — a false
    positive deletes real text from every document that contains it)."""
    return (
        blocks.select(F.md5(F.col(text_col)).alias("block_md5"), F.col(id_col))
        .groupBy("block_md5")
        .agg(F.countDistinct(id_col).alias("doc_freq"))
    )


def remove_common_blocks(
    df: DataFrame,
    block_tokens: int = 16,
    min_doc_freq: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate removal: per document — total blocks, removed blocks,
    and the cleaned text (surviving blocks joined in order).

    A block is removed when its text occurs in >= ``min_doc_freq``
    distinct documents. Every document with a token stream yields exactly
    one output row; a document that is 100% boilerplate comes back with
    ``clean_text = ''`` (callers gate on ``n_removed < n_blocks`` or text
    length — dropping rows silently would hide the removal). Documents
    with NULL text or NULL id have no token stream and are excluded —
    surface those with a required/validity check upstream.
    """
    if min_doc_freq < 2:
        raise ValueError("min_doc_freq < 2 would remove every block")
    b = doc_blocks(df, block_tokens, text_col, id_col).withColumn(
        "block_md5", F.md5(F.col("chunk_text"))
    )
    common = (
        block_doc_freq(b, id_col)
        .filter(F.col("doc_freq") >= min_doc_freq)
        .select("block_md5", F.lit(True).alias("_common"))
    )
    flagged = b.join(common, "block_md5", "left").withColumn(
        "_common", F.coalesce(F.col("_common"), F.lit(False))
    )
    # array_sort on struct(chunk_idx, ...) orders by chunk_idx (first field);
    # the HOF filter/transform run interpreted but only over the per-doc
    # reassembly arrays, never the corpus-wide hot path.
    blocks_sorted = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("chunk_idx").alias("i"),
                F.col("_common").alias("c"),
                F.col("chunk_text").alias("t"),
            )
        )
    )
    clean = F.array_join(
        F.transform(
            F.filter(blocks_sorted, lambda s: ~s.getField("c")),
            lambda s: s.getField("t"),
        ),
        " ",
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col("_common").cast("bigint")).alias("n_removed"),
        clean.alias("clean_text"),
    )
