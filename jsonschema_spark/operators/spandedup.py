"""Cross-document repeated-SPAN detection and trimming.

The span-level dedup from Lee et al., "Deduplicating Training Data Makes
Language Models Better" (arXiv:2107.06499), approximated at word-n-gram
granularity: a span of text that appears (as the same n-gram run) in many
documents is duplicated *content* even when the documents as wholes are
unique — license headers, share-bars, quoted chain letters, lyrics. Doc-level
dedup (``dedup.exact_duplicates`` / ``minhash_lsh_pairs``) never sees these;
``boilerplate.remove_common_blocks`` catches only block-ALIGNED repeats.
This operator finds repeated runs at EVERY token offset and trims them,
keeping one canonical copy per gram (``keep_first``).

Reference parity note: the reference engine (mark-hartmann/jsonschema) has
no corpus operators; this belongs to the training-data layer built on top.

Spark shape (scale-first):
  * The token array is materialized in its own projection and persist()ed —
    the positional-gram build is referenced by BOTH sides of the frequency
    join, and HOF lambdas re-evaluate non-lambda subexpressions per element
    (the word_shingles_from_tokens lessons).
  * Gram document-frequency is ONE partial-agg shuffle keyed on md5(gram)
    (16-byte keys, not the gram strings). The surviving hot set is small by
    construction (distinct grams repeated across >= min_doc_freq docs), so
    the join back onto the positional table is AQE-broadcast in practice;
    no forced hint (the curate-funnel lesson).
  * Everything per-doc (interval-merge counts, covered-index set, trimmed
    rebuild) is array math over the sorted hot-position list — rows never
    leave the JVM, and every step is replayable in DuckDB list functions
    (the contract query hash-matches per-doc counts AND the md5 of every
    trimmed document).

Span algebra: hot positions p (1-based token index) each cover tokens
[p, p+n). With positions sorted, covered tokens = sum_i min(n, p_{i+1}-p_i)
(last term = n), and two positions belong to the same merged span iff
p_{i+1} - p_i <= n (adjacency merges: contiguous duplicated text is one
span). No explicit interval-merge loop is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["positional_grams", "repeated_span_report", "trim_repeated_spans"]


def positional_grams(toks: Column, n: int) -> Column:
    """array<string>: element i-1 is the n-gram starting at token i (1-based).

    Unlike ``dedup.word_shingles_from_tokens`` this keeps ORDER and
    DUPLICATES — position identity is the point. Guarded against the
    ``sequence(1, 0)`` descending-range trap for docs shorter than n.
    """
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def repeated_span_report(
    df: DataFrame,
    n: int = 8,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_first: bool = True,
    include_clean: bool = True,
) -> DataFrame:
    """Per-document repeated-span report (+ optionally the trimmed text).

    A token position is *hot* when its n-gram occurs in >= ``min_doc_freq``
    distinct documents; with ``keep_first`` the document with the minimum id
    among a gram's holders is the canonical owner and keeps its copy (its
    positions for that gram are not hot). Hot positions are merged into
    maximal spans.

    Returns one row per input document:
      id_col, total_tokens, dup_positions, n_spans, dup_tokens,
      dup_fraction, clean_text (tokens outside every span, space-joined —
      only when ``include_clean``).

    total_tokens counts whitespace tokens of the normalized text (matches
    ``text.tokens``); dup_tokens is the merged covered-token count, so
    dup_fraction is exact, not an n-gram overcount.
    """
    t = (
        df.select(F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_t"))
        .persist()
    )
    pos = t.select(
        "_id", F.posexplode(positional_grams(F.col("_t"), n)).alias("_p0", "_g")
    ).select("_id", (F.col("_p0") + 1).alias("_p"), F.md5("_g").alias("_h"))
    freq = (
        pos.groupBy("_h")
        .agg(F.count_distinct("_id").alias("_df"), F.min("_id").alias("_owner"))
        .filter(F.col("_df") >= min_doc_freq)
    )
    hot = pos.join(freq, "_h")
    if keep_first:
        hot = hot.filter(F.col("_id") != F.col("_owner"))
    ps = hot.groupBy("_id").agg(F.sort_array(F.collect_list("_p")).alias("_ps"))

    base = t.join(ps, "_id", "left").select(
        "_id",
        "_t",
        F.coalesce(F.col("_ps"), F.array().cast("array<int>")).alias("_ps"),
    )

    pcol = F.col("_ps")
    k = F.size(pcol)
    sz = F.size(F.col("_t"))
    nxt_gap = lambda i: F.element_at(pcol, i + 1) - F.element_at(pcol, i)  # noqa: E731
    # covered tokens: sum over sorted positions of min(n, gap to next)
    dup_tokens = F.when(k == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.least(
                    F.lit(n), F.when(i == k, F.lit(n)).otherwise(nxt_gap(i))
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
    )
    # a position ENDS a span iff it is last or the next start is > n away
    n_spans = F.when(k == 0, F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.sequence(F.lit(1), k),
                lambda i: (i == k) | (nxt_gap(i) > n),
            )
        )
    )
    out = base.select(
        F.col("_id").alias(id_col),
        sz.cast("long").alias("total_tokens"),
        k.cast("long").alias("dup_positions"),
        n_spans.cast("long").alias("n_spans"),
        dup_tokens.alias("dup_tokens"),
        (dup_tokens.cast("double") / F.greatest(sz, F.lit(1)).cast("double")).alias(
            "dup_fraction"
        ),
        F.col("_t").alias("_toks"),
        pcol.alias("_hotpos"),
    )
    if include_clean:
        covered = F.when(
            F.size(F.col("_hotpos")) == 0, F.array().cast("array<int>")
        ).otherwise(
            F.array_distinct(
                F.flatten(
                    F.transform(
                        F.col("_hotpos"), lambda p: F.sequence(p, p + n - 1)
                    )
                )
            )
        )
        kept = F.array_except(
            F.sequence(F.lit(1), F.size(F.col("_toks"))), covered
        )
        clean = F.array_join(
            F.transform(kept, lambda j: F.element_at(F.col("_toks"), j)), " "
        )
        out = out.withColumn("clean_text", clean)
    return out.drop("_toks", "_hotpos")


def trim_repeated_spans(
    df: DataFrame,
    n: int = 8,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_first: bool = True,
    max_dup_fraction: float | None = None,
) -> DataFrame:
    """The curation-funnel face: (id, clean_text) for every document, with
    spans repeated across >= min_doc_freq docs removed (canonical owner
    keeps its copy under ``keep_first``). ``max_dup_fraction`` additionally
    DROPS documents that are mostly duplicated material (trimming a 95 %-
    boilerplate doc leaves junk — the Lee et al. disposition is to cut the
    whole doc)."""
    rep = repeated_span_report(
        df,
        n=n,
        min_doc_freq=min_doc_freq,
        text_col=text_col,
        id_col=id_col,
        keep_first=keep_first,
        include_clean=True,
    )
    if max_dup_fraction is not None:
        rep = rep.filter(F.col("dup_fraction") <= max_dup_fraction)
    return rep.select(id_col, F.col("clean_text").alias(text_col), "dup_fraction")
