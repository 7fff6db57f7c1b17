"""Bloom-filter membership screening — the broadcast-size alternative
to a join for "is this value in the reference set?" at corpus scale.

The decontamination family (operators/decontaminate.py) answers n-gram
overlap with an inverted-index JOIN; that is exact but shuffles the
probe side. At 10^12 rows the cheaper first pass is a Bloom screen: the
reference set reduces to an n_bits bitmap (kilobytes–megabytes), the
bitmap ships as a PLAN LITERAL, and the corpus scan stays completely
shuffle-free — no false negatives, so rows the screen clears need no
exact pass, and only screen hits (true + FPR·n) go to the exact join.

Everything is md5-arithmetic so the DuckDB oracle replays the filter
bit-for-bit:

- position j of value v = md5_60(v || ':bf' || j) % n_bits
  (md5_60 = top 60 bits of md5 as BIGINT — the engine's cross-engine
  hash family, same as MinHash/sampling)
- build: groupBy(word index).agg(bit_or(1 << bit)) — a partial+final
  aggregate whose shuffle carries AT MOST n_bits/64 rows regardless of
  input size;
- probe: the word array becomes one folded array literal; each of the
  k probes is element_at + shift + mask, pure codegen, zero joins.

Reference note: the reference engine (mark-hartmann/jsonschema) has no
corpus operators; this is training-data surface layered on the
validation engine, like dedup/decontaminate/sampling.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 64


def _md5_60(col: Column) -> Column:
    """Top 60 bits of md5 as BIGINT (DuckDB:
    ('0x' || substr(md5(x), 1, 15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _position(col: Column, j: int, n_bits: int) -> Column:
    return _md5_60(F.concat(col.cast("string"), F.lit(f":bf{j}"))) % n_bits


def bloom_params(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """(n_bits, n_hashes) for a target false-positive rate — the
    standard m = -n·ln(p)/ln(2)^2, k = m/n·ln(2) sizing, with n_bits
    rounded up to a whole 64-bit word."""
    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not (0.0 < fpr < 1.0):
        raise ValueError("fpr must be in (0, 1)")
    m = int(math.ceil(-n_items * math.log(fpr) / (math.log(2) ** 2)))
    m = ((m + WORD_BITS - 1) // WORD_BITS) * WORD_BITS
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def bloom_build(
    df: DataFrame,
    col: str,
    n_bits: int,
    n_hashes: int,
) -> DataFrame:
    """(word_idx, word) rows of the Bloom bitmap over ``df[col]``.

    One partial+final aggregate: every row contributes k set bits,
    map-side bit_or combines them, and the shuffle carries at most
    n_bits/64 rows no matter how large the input is. NULL values are
    skipped (membership of NULL is meaningless)."""
    if n_bits % WORD_BITS:
        raise ValueError("n_bits must be a multiple of 64")
    if n_hashes < 1:
        raise ValueError("n_hashes must be >= 1")
    c = F.col(col)
    pos = F.explode(
        F.array(*[_position(c, j, n_bits) for j in range(n_hashes)])
    ).alias("_pos")
    # pyspark's shiftleft wrapper only accepts a Python-int bit count;
    # call_function reaches the SQL builtin, which takes a Column
    setbit = F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        (F.col("_pos") % WORD_BITS).cast("int"),
    )
    return (
        df.where(c.isNotNull())
        .select(pos)
        .groupBy((F.col("_pos") / WORD_BITS).cast("long").alias("word_idx"))
        .agg(F.bit_or(setbit).alias("word"))
    )


def bloom_words(
    df: DataFrame, col: str, n_bits: int, n_hashes: int
) -> list[int]:
    """Driver-side dense word list (len n_bits/64) — the broadcastable
    artifact. The collect is bounded by the BITMAP size, never the
    input size."""
    n_words = n_bits // WORD_BITS
    words = [0] * n_words
    for r in bloom_build(df, col, n_bits, n_hashes).collect():
        words[int(r["word_idx"])] = int(r["word"])
    return words


#: probe-literal ceiling: 2^20 words = 64 Mbit = 8 MB of plan literal
#: (~6.7 M reference items at 1% FPR). Above this the bitmap stops
#: being a sensible plan constant — use a coarser FPR, shard the
#: reference into several screens, or fall back to the exact
#: decontamination join.
MAX_PROBE_WORDS = 1 << 20


def bloom_probe_expr(
    col: Column,
    words: Sequence[int],
    n_hashes: int,
) -> Column:
    """Boolean membership Column: all k positions set in ``words``.

    The bitmap folds into ONE array literal (constant-folded by
    Catalyst — the PQ-codebook pattern); each probe is element_at +
    shiftright + mask. NULL values probe to NULL. Guarded by
    ``MAX_PROBE_WORDS`` so an oversized reference set fails loudly
    instead of shipping a multi-hundred-MB plan."""
    if len(words) > MAX_PROBE_WORDS:
        raise ValueError(
            f"bloom_probe_expr: {len(words)} words exceeds the "
            f"{MAX_PROBE_WORDS}-word plan-literal ceiling (8 MB); use a "
            f"coarser fpr, shard the reference, or the exact join"
        )
    n_bits = len(words) * WORD_BITS
    lit_words = F.array(*[F.lit(int(w)).cast("long") for w in words])
    hit = F.lit(True)
    for j in range(n_hashes):
        pos = _position(col, j, n_bits)
        word = F.element_at(lit_words, (pos / WORD_BITS).cast("int") + 1)
        bit = (pos % WORD_BITS).cast("int")
        hit = hit & (
            F.call_function("shiftright", word, bit)
            .bitwiseAND(F.lit(1).cast("long"))
            == 1
        )
    return hit


def bloom_screen(
    corpus: DataFrame,
    col: str,
    reference: DataFrame,
    ref_col: str,
    n_bits: int | None = None,
    n_hashes: int | None = None,
    fpr: float = 0.01,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Append ``bloom_hit`` to ``corpus``: True when ``col`` MIGHT be in
    ``reference[ref_col]`` (no false negatives, ~``fpr`` false
    positives). When sizing is not given it derives from a distinct
    count of the reference (one narrow aggregate). The corpus side
    stays scan-shaped: zero joins, zero shuffles."""
    if n_bits is None or n_hashes is None:
        n_ref = (
            reference.where(F.col(ref_col).isNotNull())
            .select(ref_col)
            .distinct()
            .count()
        )
        n_bits, n_hashes = bloom_params(max(n_ref, 1), fpr)
    words = bloom_words(reference, ref_col, n_bits, n_hashes)
    return corpus.withColumn(
        out_col, bloom_probe_expr(F.col(col), words, n_hashes)
    )
