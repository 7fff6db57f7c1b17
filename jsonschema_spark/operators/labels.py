"""CTC label targets: transcript -> integer id sequences.

The label side of the (features, labels) training pair. Every ASR
training run maps transcripts through a fixed character vocabulary to
id sequences with id 0 RESERVED for the CTC blank — so ids are 1-based
positions in the vocabulary string, which makes the whole encoding one
codegen'd expression: ``instr(vocab, char)`` IS the mapping (0 = not in
vocab = OOV). No UDF, no join, no shuffle; a 10^12-row corpus encodes
at scan speed.

Scale/precision design:
  * Normalization (lowercase, collapse whitespace, trim) reuses
    ``text.normalize`` — the same canonical form the text operators
    and their DuckDB oracles already pin.
  * OOV policy is explicit: ``drop`` (default) removes unknown chars
    and counts them; ``keep`` emits id 0 for them (callers that want
    loud failure gate on ``oov_count == 0`` — a suite ``expr`` check).
  * The char walk materializes the normalized string ONCE per row and
    walks positions with ``substr`` inside a transform — O(len) with
    O(1) per element; the HOF re-evaluation trap does not bite because
    every subexpression referenced in the lambda is an attribute or a
    literal.

Reference note: the reference engine (mark-hartmann/jsonschema) has no
corpus operators; this is training-data surface layered on the
validation engine, like dedup/chunk/sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize

#: lowercase letters + space + apostrophe + digits — the classic
#: char-CTC English vocabulary (id = 1-based position; 0 = blank/OOV)
DEFAULT_VOCAB = "abcdefghijklmnopqrstuvwxyz '0123456789"


def encode_labels(
    df: DataFrame,
    transcript_col: str = "transcript",
    vocab: str = DEFAULT_VOCAB,
    oov: str = "drop",
    out_col: str = "label_ids",
) -> DataFrame:
    """Append ``label_ids`` (array<int>, 1-based vocab positions, CTC
    blank = 0 reserved), ``label_len`` and ``oov_count``.

    NULL transcripts get an empty id array with oov_count 0 and
    label_len 0 — the CTC feasibility gate (label_len > 0) rejects
    them downstream; nothing here is silently NULL."""
    if oov not in ("drop", "keep"):
        raise ValueError(f"unknown oov policy {oov!r}")
    if len(set(vocab)) != len(vocab):
        raise ValueError("vocab has duplicate characters")
    norm = normalize(F.col(transcript_col))
    base = df.withColumn("_lab_norm", norm)
    s = F.col("_lab_norm")
    n = F.length(s)
    raw = F.when(
        F.coalesce(n, F.lit(0)) < 1, F.array().cast("array<int>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: F.instr(
                F.lit(vocab), s.substr(i, F.lit(1))
            ).cast("int"),
        )
    )
    base = base.withColumn("_lab_raw", raw)
    r = F.col("_lab_raw")
    ids = (
        F.filter(r, lambda v: v > 0) if oov == "drop" else r
    )
    return (
        base.withColumn(
            "oov_count", F.size(F.filter(r, lambda v: v == 0))
        )
        .withColumn(out_col, ids)
        .withColumn("label_len", F.size(F.col(out_col)))
        .drop("_lab_norm", "_lab_raw")
    )


def decode_labels(
    ids_col: Column | str, vocab: str = DEFAULT_VOCAB
) -> Column:
    """Inverse mapping (audit/debug): id array -> string; id 0 (blank/
    kept OOV) renders as empty."""
    ids = F.col(ids_col) if isinstance(ids_col, str) else ids_col
    return F.concat_ws(
        "",
        F.transform(
            ids,
            lambda v: F.when(
                (v >= 1) & (v <= len(vocab)),
                F.lit(vocab).substr(v, F.lit(1)),
            ).otherwise(F.lit("")),
        ),
    )


def char_counts(
    df: DataFrame, transcript_col: str = "transcript"
) -> DataFrame:
    """(char, n_occurrences) over NORMALIZED transcripts — the
    evidence a vocabulary decision is made from. One projection + one
    explode + one narrow groupBy (shuffle keys are single characters);
    the char array is materialized in its own projection before the
    explode (project-collapsing rule)."""
    norm = normalize(F.col(transcript_col))
    chars = (
        df.select(norm.alias("_n"))
        .where(F.length("_n") > 0)
        .select(F.split(F.col("_n"), "").alias("_cs"))
        .select(F.explode("_cs").alias("char"))
        .where(F.length("char") > 0)
    )
    return chars.groupBy("char").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def learn_char_vocab(
    df: DataFrame,
    transcript_col: str = "transcript",
    min_occurrences: int = 1,
    max_size: int = 256,
) -> str:
    """Derive the character vocabulary FROM the corpus: every
    normalized char with at least ``min_occurrences``, most frequent
    first (ties broken by codepoint for determinism), capped at
    ``max_size``. The result feeds ``encode_labels`` directly —
    rare/garbage codepoints become counted OOV instead of vocabulary
    entries. Driver-side result (vocabularies are tiny); the count
    plan is one scan + one narrow groupBy + TakeOrdered."""
    rows = (
        char_counts(df, transcript_col)
        .where(F.col("n_occurrences") >= min_occurrences)
        .orderBy(F.col("n_occurrences").desc(), F.col("char").asc())
        .limit(max_size)
        .collect()
    )
    return "".join(r["char"] for r in rows)
