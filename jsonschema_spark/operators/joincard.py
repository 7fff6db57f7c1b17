"""Pre-flight join-cardinality estimation (the join-explosion guard).

At 100 TB the cheapest join is the one you never run: an inner join's
output size is EXACTLY sum over matching keys of count_left(k) *
count_right(k), and that sum is computable from two per-key count
profiles whose shuffle volume is the DISTINCT KEY count, not the row
count (partial map-side aggregation collapses each side first). A
pipeline should gate `orders JOIN events ON user_id`-shaped steps on
this estimate before committing a multi-hour shuffle that explodes
1000x on a hot key.

Plan shape at 10^12 rows:
  - one narrow groupBy(key) per side        (shuffle <= distinct keys)
  - count-table equi-join on key            (tiny; AQE broadcasts the
    smaller profile — never a row-level join of the inputs)
  - ONE single-row aggregate / top-k window over per-KEY rows only

NULL keys never match in an equi-join (SQL three-valued logic), so both
profiles drop them first and the report carries the dropped counts —
a silent-NULL-key join is itself a data-quality finding.

No analogue in the reference (a single-document validator); this is the
engine-capability layer the north rule adds (SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _profile(df: DataFrame, key: str) -> tuple[DataFrame, Column]:
    """Per-key multiplicity profile of the non-NULL-key rows."""
    return (
        df.filter(F.col(key).isNotNull())
        .groupBy(F.col(key).alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def join_pair_profile(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """Matched per-key contribution table: (k, left_cnt, right_cnt,
    est_rows = left_cnt * right_cnt) for every key present on BOTH sides.
    The building block for the one-row report and the hot-key top-k."""
    lp = _profile(left, left_key).withColumnRenamed("cnt", "left_cnt")
    rp = _profile(right, right_key).withColumnRenamed("cnt", "right_cnt")
    return lp.join(rp, "k").select(
        "k",
        "left_cnt",
        "right_cnt",
        (F.col("left_cnt") * F.col("right_cnt")).alias("est_rows"),
    )


def join_cardinality_report(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str,
    explosion_threshold: float = 4.0,
) -> DataFrame:
    """ONE-row pre-join report.

      left_rows / right_rows      non-NULL-key input rows per side
      left_null_keys / right_null_keys  rows an inner join silently drops
      left_keys / right_keys      distinct key counts
      matching_keys               keys present on both sides
      est_inner_rows              exact inner-join output size
      max_fanout                  the single hottest key's contribution
      explosion_ratio             est_inner_rows / max(left_rows, right_rows)
                                  (1.0 = FK-shaped; >> 1 = m:n blowup)
      explosive                   explosion_ratio > explosion_threshold

    The whole report costs two key profiles + one profile-level outer
    join + ONE aggregate — each input is scanned exactly once (profiles
    keep the NULL-key group so the null counts ride the same pass;
    re-referencing a profile would re-plan its entire input scan —
    CLAUDE.md gotcha)."""
    lp = (
        left.groupBy(F.col(left_key).alias("k"))
        .agg(F.count(F.lit(1)).alias("left_cnt"))
    )
    rp = (
        right.groupBy(F.col(right_key).alias("k"))
        .agg(F.count(F.lit(1)).alias("right_cnt"))
    )
    # full outer on k: NULL keys never equi-match, so each side's NULL
    # group survives as an unmatched row — exactly the rows an inner
    # join of the inputs would silently drop.
    j = lp.join(rp, "k", "full_outer")
    both = F.col("left_cnt").isNotNull() & F.col("right_cnt").isNotNull()
    out = j.agg(
        F.coalesce(
            F.sum(F.when(F.col("k").isNotNull(), F.col("left_cnt"))), F.lit(0)
        ).alias("left_rows"),
        F.coalesce(
            F.sum(F.when(F.col("k").isNull(), F.col("left_cnt"))), F.lit(0)
        ).alias("left_null_keys"),
        F.coalesce(
            F.sum(F.when(F.col("k").isNotNull(), F.col("right_cnt"))), F.lit(0)
        ).alias("right_rows"),
        F.coalesce(
            F.sum(F.when(F.col("k").isNull(), F.col("right_cnt"))), F.lit(0)
        ).alias("right_null_keys"),
        F.count(F.when(F.col("k").isNotNull() & F.col("left_cnt").isNotNull(),
                       F.lit(1))).alias("left_keys"),
        F.count(F.when(F.col("k").isNotNull() & F.col("right_cnt").isNotNull(),
                       F.lit(1))).alias("right_keys"),
        F.count(F.when(F.col("k").isNotNull() & both, F.lit(1))).alias(
            "matching_keys"
        ),
        F.coalesce(
            F.sum(
                F.when(F.col("k").isNotNull(),
                       F.col("left_cnt") * F.col("right_cnt"))
            ),
            F.lit(0),
        ).alias("est_inner_rows"),
        F.coalesce(
            F.max(
                F.when(F.col("k").isNotNull(),
                       F.col("left_cnt") * F.col("right_cnt"))
            ),
            F.lit(0),
        ).alias("max_fanout"),
    )
    ratio = F.col("est_inner_rows").cast("double") / F.greatest(
        F.col("left_rows"), F.col("right_rows"), F.lit(1)
    ).cast("double")
    return out.select(
        "left_rows",
        "left_null_keys",
        "right_rows",
        "right_null_keys",
        "left_keys",
        "right_keys",
        "matching_keys",
        "est_inner_rows",
        "max_fanout",
        ratio.alias("explosion_ratio"),
        (ratio > F.lit(float(explosion_threshold))).alias("explosive"),
    )


def key_overlap_sketch(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str,
    lg_k: int = 12,
) -> DataFrame:
    """Distinct-key overlap between two corpora WITHOUT any join: one
    HLL sketch pass per side (Datasketches ``hll_sketch_agg`` — mergeable
    O(2^lg_k) state, so partial aggregation does all the work), then
    inclusion-exclusion on the driver-sized 1-row frames:

      overlap_est = |A|_est + |B|_est - |A u B|_est
      jaccard_est = overlap_est / |A u B|_est

    The 100 TB train/test-contamination and coverage probe: the exact
    answer (join_cardinality_report.matching_keys) costs a shuffle of
    every distinct key; this costs two scans and kilobytes of state.
    Standard error ~1.04/sqrt(2^lg_k) (~1.6% at the default lg_k=12) on
    each cardinality; the overlap difference inherits their sum, so use
    exact counting when the expected overlap is tiny relative to the
    union. Deterministic (hash-based, no RNG)."""
    ls = left.agg(
        F.hll_sketch_agg(F.col(left_key), F.lit(int(lg_k))).alias("sk_a")
    )
    rs = right.agg(
        F.hll_sketch_agg(F.col(right_key), F.lit(int(lg_k))).alias("sk_b")
    )
    both = ls.crossJoin(rs)  # two 1-row frames
    est_a = F.hll_sketch_estimate(F.col("sk_a"))
    est_b = F.hll_sketch_estimate(F.col("sk_b"))
    est_u = F.hll_sketch_estimate(F.hll_union(F.col("sk_a"), F.col("sk_b")))
    return both.select(
        est_a.alias("left_distinct_est"),
        est_b.alias("right_distinct_est"),
        est_u.alias("union_est"),
        F.greatest(est_a + est_b - est_u, F.lit(0)).alias("overlap_est"),
        (
            F.greatest(est_a + est_b - est_u, F.lit(0)).cast("double")
            / F.greatest(est_u, F.lit(1)).cast("double")
        ).alias("jaccard_est"),
    )


def join_hot_keys(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str,
    k: int = 10,
) -> DataFrame:
    """Top-k join keys by output contribution (the salting / skew-split
    shortlist): (key, left_cnt, right_cnt, est_rows, rank). Deterministic
    tie-break on the key value so the set is engine-invariant. The window
    runs over per-KEY rows (already aggregated), never input rows."""
    pair = join_pair_profile(left, right, left_key, right_key)
    # orderBy().limit(k) compiles to TakeOrderedAndProject: each partition
    # keeps its own top-k and the driver merges k-sized heaps — NO global
    # sort shuffle even with billions of distinct keys. The row_number
    # window then runs over the <=k survivors only.
    top = pair.orderBy(F.col("est_rows").desc(), F.col("k").asc()).limit(int(k))
    w = Window.orderBy(F.col("est_rows").desc(), F.col("k").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col("k").alias("key"),
        "left_cnt",
        "right_cnt",
        "est_rows",
        "rank",
    )
