"""Distribution-drift checks vs a baseline snapshot (north rule):
chi-square over categorical histograms (codec, sr_hz), two-sample
Kolmogorov-Smirnov over numeric columns (dur_ms).

Scale design:
- Histograms are plain ``groupBy().count()`` — partial+final aggregate,
  shuffle carries one row per category.
- Exact KS sorts the pooled sample once (window cume over value order);
  correct and oracle-comparable, O(n log n) — use for audits. For the
  10^12-row path, ``ks_statistic_approx`` compares ECDFs on a
  ``percentile_approx`` quantile sketch: one aggregate, no global sort,
  error bounded by the sketch accuracy.
- Test statistics (a few doubles) reduce to the driver; p-values are
  computed there in closed form (no scipy dependency).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from jsonschema_spark.functions.grid import grid_round


# ---------------------------------------------------------------------------
# chi-square
# ---------------------------------------------------------------------------


def category_histogram(df: DataFrame, column: str) -> DataFrame:
    return df.groupBy(F.col(column).alias("category")).agg(F.count(F.lit(1)).alias("cnt"))


def chi_square_table(current: DataFrame, baseline: DataFrame, column: str) -> DataFrame:
    """Per-category observed/expected contributions.

    Expected counts scale the baseline proportions to the current total.
    Categories absent on one side get count 0 (full outer join).
    """
    cur = category_histogram(current, column).withColumnRenamed("cnt", "observed")
    base = category_histogram(baseline, column).withColumnRenamed("cnt", "base_cnt")
    joined = cur.join(base, "category", "full_outer").fillna(
        0, subset=["observed", "base_cnt"]
    )
    totals = joined.agg(
        F.sum("observed").alias("n_cur"), F.sum("base_cnt").alias("n_base")
    )
    j = joined.crossJoin(F.broadcast(totals))
    expected = F.col("base_cnt") / F.col("n_base") * F.col("n_cur")
    return j.select(
        "category",
        "observed",
        grid_round(expected, 6).alias("expected"),
        grid_round(
            F.when(expected > 0, F.pow(F.col("observed") - expected, 2) / expected).otherwise(
                F.when(F.col("observed") > 0, F.lit(float("inf"))).otherwise(F.lit(0.0))
            ),
            6,
        ).alias("contribution"),
    )


@dataclass
class ChiSquareResult:
    statistic: float
    dof: int
    p_value: float
    drifted: bool


def chi_square_test(
    current: DataFrame, baseline: DataFrame, column: str, alpha: float = 0.001
) -> ChiSquareResult:
    tbl = chi_square_table(current, baseline, column)
    rows = tbl.collect()
    stat = sum(r.contribution for r in rows)
    dof = max(len(rows) - 1, 1)
    p = _chi2_sf(stat, dof)
    return ChiSquareResult(statistic=stat, dof=dof, p_value=p, drifted=p < alpha)


def _chi2_sf(x: float, k: int) -> float:
    """Survival function of chi-square: regularized upper incomplete gamma
    Q(k/2, x/2), via the standard series / continued-fraction split."""
    if math.isinf(x):
        return 0.0
    if x <= 0:
        return 1.0
    a, xx = k / 2.0, x / 2.0
    if xx < a + 1.0:
        return 1.0 - _gamma_p_series(a, xx)
    return _gamma_q_contfrac(a, xx)


def _gamma_p_series(a: float, x: float) -> float:
    ap, summ, delta = a, 1.0 / a, 1.0 / a
    for _ in range(500):
        ap += 1.0
        delta *= x / ap
        summ += delta
        if abs(delta) < abs(summ) * 1e-14:
            break
    return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gamma_q_contfrac(a: float, x: float) -> float:
    tiny = 1e-300
    b, c, d = x + 1.0 - a, 1.0 / tiny, 1.0 / (x + 1.0 - a)
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        d = tiny if abs(d) < tiny else d
        c = b + an / c
        c = tiny if abs(c) < tiny else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-14:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


# ---------------------------------------------------------------------------
# Population Stability Index
# ---------------------------------------------------------------------------


def psi_table_from_histograms(
    cur: DataFrame, base: DataFrame, eps: float = 1e-6
) -> DataFrame:
    """PSI contributions from two pre-aggregated (category, cnt) histograms —
    reusable from batch (psi_table) and streaming (windowed histograms in
    foreachBatch, where the stream side is already aggregated)."""
    cur = cur.withColumnRenamed("cnt", "cur_cnt")
    base = base.withColumnRenamed("cnt", "base_cnt")
    joined = cur.join(base, "category", "full_outer").fillna(
        0, subset=["cur_cnt", "base_cnt"]
    )
    totals = joined.agg(
        F.sum("cur_cnt").alias("n_cur"), F.sum("base_cnt").alias("n_base")
    )
    j = joined.crossJoin(F.broadcast(totals))
    p_cur = F.greatest(F.col("cur_cnt") / F.col("n_cur"), F.lit(eps))
    p_base = F.greatest(F.col("base_cnt") / F.col("n_base"), F.lit(eps))
    return j.select(
        "category",
        grid_round(p_cur, 6).alias("p_cur"),
        grid_round(p_base, 6).alias("p_base"),
        grid_round((p_cur - p_base) * F.log(p_cur / p_base), 6).alias("contribution"),
    )


def psi_table(
    current: DataFrame, baseline: DataFrame, column: str, eps: float = 1e-6
) -> DataFrame:
    """Per-category PSI contributions: (category, p_cur, p_base, contribution)
    with contribution = (p_cur - p_base) * ln(p_cur / p_base).

    Zero-count proportions are floored at ``eps`` (standard smoothing) so
    one-sided categories contribute a large-but-finite term. Same shuffle
    shape as the chi-square path: one groupBy per side, tiny join.
    PSI < 0.1 stable / 0.1-0.25 moderate / > 0.25 major shift (industry rule
    of thumb).
    """
    return psi_table_from_histograms(
        category_histogram(current, column),
        category_histogram(baseline, column),
        eps,
    )


def psi_table_numeric(
    current: DataFrame,
    baseline: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_bins: int = 32,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI over a NUMERIC column: uniform [lo, hi] binning (the same
    engine-independent bin arithmetic as ``ks_statistic_binned``) turns the
    column into categories, then the categorical PSI machinery applies.
    Plan: one narrow groupBy(bin) per side, shuffle <= n_bins+2 rows.
    Output (category = bin id as int, p_cur, p_base, contribution)."""

    def hist(df: DataFrame) -> DataFrame:
        c = F.col(column).cast("double")
        return (
            df.filter(c.isNotNull())
            .groupBy(binned_ecdf_bin(c, lo, hi, n_bins).alias("category"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    return psi_table_from_histograms(hist(current), hist(baseline), eps)


def psi(current: DataFrame, baseline: DataFrame, column: str, eps: float = 1e-6) -> float:
    """Scalar PSI (sum of contributions) — a few doubles to the driver."""
    rows = psi_table(current, baseline, column, eps).collect()
    return float(sum(r.contribution for r in rows))


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov
# ---------------------------------------------------------------------------


EXACT_AUDIT_MAX_ROWS = 10_000_000


class ExactAuditScaleError(RuntimeError):
    """Raised when an exact audit path (global no-partition window) is asked
    to run over more rows than its documented ceiling. The exact paths are
    single-reducer by construction; at corpus scale use the registered
    binned defaults (``ks_statistic_binned`` / ``roc_auc_binned``)."""


def _guard_exact_audit(n_rows: int, op: str, max_rows: int) -> None:
    if n_rows > max_rows:
        raise ExactAuditScaleError(
            f"{op}: {n_rows} rows exceeds the exact-audit ceiling of "
            f"{max_rows}. This path uses a global no-partition window (a "
            f"single reducer) and must not run at corpus scale; use the "
            f"binned variant, or pass max_rows explicitly for a deliberate "
            f"larger audit."
        )


def ks_statistic_exact(
    current: DataFrame,
    baseline: DataFrame,
    column: str,
    max_rows: int = EXACT_AUDIT_MAX_ROWS,
) -> DataFrame:
    """One-row DataFrame (ks_stat, n_cur, n_base): exact two-sample KS.

    Pools both samples, computes running ECDFs with a single ordered window
    over value, takes max |F_cur - F_base|.

    AUDIT path: the window is a global no-partition sort. Guarded by a
    row-count ceiling (``max_rows``, default 10^7) so it can never silently
    run single-reducer at corpus scale — ``ks_statistic_binned`` is the
    registered large-scale default. The guard costs one narrow count
    aggregate, negligible beside the global sort it protects.
    """
    cur = current.select(F.col(column).cast("double").alias("v")).na.drop()
    base = baseline.select(F.col(column).cast("double").alias("v")).na.drop()
    _guard_exact_audit(cur.count() + base.count(), "ks_statistic_exact", max_rows)
    u = cur.withColumn("is_cur", F.lit(1)).unionByName(base.withColumn("is_cur", F.lit(0)))

    counts = u.agg(
        F.sum("is_cur").alias("n_cur"),
        F.sum(1 - F.col("is_cur")).alias("n_base"),
    )
    # RANGE frame: at each distinct value the ECDF includes ALL tied rows,
    # which is the correct two-sample KS treatment of ties.
    w = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, Window.currentRow)
    ecdf = u.select(
        (F.sum("is_cur").over(w)).alias("c_cur"),
        (F.sum(1 - F.col("is_cur")).over(w)).alias("c_base"),
    )
    return (
        ecdf.crossJoin(F.broadcast(counts))
        .agg(
            grid_round(
                F.max(F.abs(F.col("c_cur") / F.col("n_cur") - F.col("c_base") / F.col("n_base"))),
                6,
            ).alias("ks_stat"),
            F.first("n_cur").alias("n_cur"),
            F.first("n_base").alias("n_base"),
        )
    )


def binned_ecdf_bin(col: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Bin id for the uniform ECDF grid over [lo, hi]: 0 = (v <= lo),
    b in 1..n_bins means cut_{b-1} < v <= cut_b (cut_b = lo + b*step),
    n_bins+1 = overflow (v > hi). Pure double arithmetic (ceil of one
    division) so any engine reproduces the identical binning bit-for-bit —
    the property the DuckDB oracle relies on."""
    step = (hi - lo) / n_bins
    return (
        F.when(col <= F.lit(float(lo)), F.lit(0))
        .when(col > F.lit(float(hi)), F.lit(n_bins + 1))
        .otherwise(F.ceil((col - F.lit(float(lo))) / F.lit(step)).cast("int"))
    )


def binned_histogram(
    df: DataFrame, column: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """(bin, cnt) histogram on the uniform ECDF grid — the shared reduction
    for binned KS/PSI and their streaming variants. One narrow partial+final
    aggregate; shuffle <= n_bins+2 rows."""
    c = F.col(column).cast("double")
    return (
        df.filter(c.isNotNull())
        .groupBy(binned_ecdf_bin(c, lo, hi, n_bins).alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ks_statistic_binned(
    current: DataFrame,
    baseline: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Scale-default KS: ECDFs on a uniform n_bins grid over [lo, hi].

    One-row result (ks_stat, n_cur, n_base). Plan shape: each side maps
    rows to an int bin (whole-stage codegen) and aggregates ONE narrow
    groupBy(bin).count() — partial+final, shuffle carries <= n_bins+2 rows
    per side. The cumulative/max step runs over that tiny histogram (a
    window over <= n_bins+2 rows, single trivial partition). No global
    sort, no per-row window, no wide aggregate that would fall out of
    codegen (a sum-per-cutpoint formulation exceeds Spark's
    wholeStage maxFields=100 and ran ~6x slower — measured). This is the
    registered contract/bench default; ``ks_statistic_exact`` stays as the
    bounded-sample audit path.

    The statistic is exact *at the grid resolution*: it understates true
    KS by at most the largest probability mass inside one bin. Rows above
    ``hi`` count toward the totals but contribute only the (zero)
    tail difference — both tails agree at +inf by construction.
    """

    cur = binned_histogram(current, column, lo, hi, n_bins).withColumnRenamed(
        "cnt", "cur_cnt"
    )
    base = binned_histogram(baseline, column, lo, hi, n_bins).withColumnRenamed(
        "cnt", "base_cnt"
    )
    j = cur.join(base, "bin", "full_outer").fillna(0, subset=["cur_cnt", "base_cnt"])
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = j.select(
        F.sum("cur_cnt").over(w).alias("c_cur"),
        F.sum("base_cnt").over(w).alias("c_base"),
    )
    totals = e.agg(F.max("c_cur").alias("n_cur"), F.max("c_base").alias("n_base"))
    return (
        e.crossJoin(F.broadcast(totals))
        .agg(
            grid_round(
                F.max(
                    F.abs(
                        F.col("c_cur") / F.col("n_cur")
                        - F.col("c_base") / F.col("n_base")
                    )
                ),
                6,
            ).alias("ks_stat"),
            F.first("n_cur").alias("n_cur"),
            F.first("n_base").alias("n_base"),
        )
    )


def wasserstein_binned(
    current: DataFrame,
    baseline: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Wasserstein-1 (earth-mover) distance on the shared uniform bin grid.

    W1 complements the drift family: KS reports the WORST ECDF gap, PSI a
    log-ratio divergence — W1 integrates |F_cur - F_base| over the value
    axis, so it is the only one that says "the distribution moved ~12 ms
    to the right" in the column's own units. One-row result
    (w1_dist, n_cur, n_base).

    Plan shape (identical to the binned KS scale default): one narrow
    ``groupBy(bin)`` per side (shuffle <= n_bins+2 rows), full-outer join
    of two tiny histograms, then ONE window pass over <= n_bins+2 rows
    computing cumulative and total counts together (single tiny
    partition; no second reference to the frame, so the upstream
    aggregates are planned exactly once — a ``crossJoin(totals)``
    formulation plans them twice).

    Cross-engine determinism: each bin's |Fc - Fb| * step contribution is
    floored onto an integer 1e-9 grid (floor(x*1e9 + 0.5), half-up — all
    inputs are correctly-rounded IEEE doubles) and summed as BIGINTs, so
    the result is aggregation-order independent and DuckDB replays it
    bit-for-bit. Mass above ``hi`` counts toward the totals but the
    integral is truncated at the grid edge (both ECDFs reach 1 at +inf);
    like binned KS, the statistic is exact at the grid resolution.
    """
    step = (hi - lo) / n_bins
    cur = binned_histogram(current, column, lo, hi, n_bins).withColumnRenamed(
        "cnt", "cur_cnt"
    )
    base = binned_histogram(baseline, column, lo, hi, n_bins).withColumnRenamed(
        "cnt", "base_cnt"
    )
    j = cur.join(base, "bin", "full_outer").fillna(0, subset=["cur_cnt", "base_cnt"])
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_ord = Window.orderBy("bin")
    # Bins with zero mass on BOTH sides are absent from the join, but the
    # ECDF difference is constant across them — weight each present bin by
    # the number of grid cut points it covers (gap to the next present bin,
    # truncated at the grid edge). KS needs no such weight (max of a
    # constant run is the run's value); an integral does.
    e = j.select(
        "bin",
        F.sum("cur_cnt").over(w_cum).alias("c_cur"),
        F.sum("base_cnt").over(w_cum).alias("c_base"),
        F.sum("cur_cnt").over(w_all).alias("n_cur"),
        F.sum("base_cnt").over(w_all).alias("n_base"),
        (
            F.least(
                F.coalesce(F.lead("bin").over(w_ord), F.lit(n_bins + 1)),
                F.lit(n_bins + 1),
            )
            - F.col("bin")
        ).alias("weight"),
    )
    contrib = F.abs(
        F.col("c_cur") / F.col("n_cur") - F.col("c_base") / F.col("n_base")
    ) * F.lit(step)
    scaled = F.floor(contrib * F.lit(1e9) + F.lit(0.5)).cast("bigint") * F.col(
        "weight"
    )
    return e.agg(
        grid_round(
            F.sum(F.when(F.col("bin") <= n_bins, scaled).otherwise(F.lit(0)))
            / F.lit(1e9),
            6,
        ).alias("w1_dist"),
        F.max("n_cur").alias("n_cur"),
        F.max("n_base").alias("n_base"),
    )


def ks_statistic_approx(
    current: DataFrame, baseline: DataFrame, column: str, n_quantiles: int = 256
) -> DataFrame:
    """Scale path: KS on a quantile sketch — one aggregate per side, no sort.

    Evaluates |F_cur - F_base| at the baseline's sketch quantiles (and vice
    versa is symmetric up to sketch error).
    """
    qs = [i / n_quantiles for i in range(1, n_quantiles)]
    cur_q = current.agg(
        F.percentile_approx(F.col(column).cast("double"), qs, 10000).alias("q")
    )
    base_q = baseline.agg(
        F.percentile_approx(F.col(column).cast("double"), qs, 10000).alias("q")
    )
    # At baseline quantile value q_i (ECDF_base = i/n), ECDF_cur is the
    # fraction of cur sketch points <= q_i: estimated by rank lookup.
    joined = cur_q.crossJoin(base_q.withColumnRenamed("q", "qb"))
    diff = joined.select(
        F.aggregate(
            F.transform(
                F.col("qb"),
                lambda x, i: F.abs(
                    (F.size(F.filter(F.col("q"), lambda y: y <= x)) + F.lit(1.0))
                    / F.lit(float(n_quantiles))
                    - (i.cast("double") + 1.0) / F.lit(float(n_quantiles))
                ),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("ks_stat")
    )
    return diff


@dataclass
class KSResult:
    statistic: float
    n_cur: int
    n_base: int
    p_value: float
    drifted: bool


def ks_test(
    current: DataFrame,
    baseline: DataFrame,
    column: str,
    alpha: float = 0.001,
    exact: bool = True,
) -> KSResult:
    if exact:
        row = ks_statistic_exact(current, baseline, column).collect()[0]
        stat, n1, n2 = row.ks_stat, row.n_cur, row.n_base
    else:
        stat = ks_statistic_approx(current, baseline, column).collect()[0].ks_stat
        n1 = current.count()
        n2 = baseline.count()
    ne = n1 * n2 / (n1 + n2)
    lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * stat
    p = _kolmogorov_sf(lam)
    return KSResult(statistic=stat, n_cur=n1, n_base=n2, p_value=p, drifted=p < alpha)


def _kolmogorov_sf(lam: float) -> float:
    if lam <= 0:
        return 1.0
    total = 0.0
    for j in range(1, 101):
        term = ((-1) ** (j - 1)) * math.exp(-2.0 * j * j * lam * lam)
        total += term
        if abs(term) < 1e-16:
            break
    return max(0.0, min(1.0, 2.0 * total))


# ---------------------------------------------------------------------------
# Per-group drift matrix: "which slice drifted", one grouped plan
# ---------------------------------------------------------------------------


def drift_matrix_from_histograms(
    cur: DataFrame,
    base: DataFrame,
    group_cols: list[str],
    eps: float = 1e-6,
    psi_moderate: float = 0.1,
    psi_major: float = 0.25,
) -> DataFrame:
    """Per-group PSI + chi-square from two (group..., category, cnt)
    histograms — the grouped generalization of ``psi_table_from_histograms``
    / ``chi_square_table`` with NO driver loop over slices: one join on
    (group, category), per-group totals via a window PARTITIONED on the
    group over the tiny post-aggregate histogram (single reference — a
    groupBy+rejoin formulation references the joined subtree twice, and
    Catalyst plans the whole upstream scan once per reference: measured 8
    parquet scans vs this shape's 2), one final narrow aggregate.

    Determinism: per-category contributions are rounded to 6 dp and summed
    as INTEGER-scaled values (floor(x*1e6 + 0.5), exact BIGINT addition), so
    the per-group sums are independent of aggregation order — the property
    the cross-engine oracle needs, and a stability guarantee for reruns.

    Chi-square is computed over categories with expected > 0; categories
    new in the current slice (baseline count 0) are reported in
    ``new_categories`` instead of forcing an infinite statistic. PSI's eps
    floor already accounts for them.
    """
    cur = cur.withColumnRenamed("cnt", "cur_cnt")
    base = base.withColumnRenamed("cnt", "base_cnt")
    keys = [*group_cols, "category"]
    joined = cur.join(base, keys, "full_outer").fillna(
        0, subset=["cur_cnt", "base_cnt"]
    )
    w = Window.partitionBy(*group_cols)
    j = joined.withColumn("n_cur", F.sum("cur_cnt").over(w)).withColumn(
        "n_base", F.sum("base_cnt").over(w)
    )

    p_cur = F.greatest(F.col("cur_cnt") / F.col("n_cur"), F.lit(eps))
    p_base = F.greatest(F.col("base_cnt") / F.col("n_base"), F.lit(eps))
    psi_c = (p_cur - p_base) * F.log(p_cur / p_base)
    expected = F.col("base_cnt") / F.col("n_base") * F.col("n_cur")
    chi2_c = F.when(expected > 0, F.pow(F.col("cur_cnt") - expected, 2) / expected)

    scaled = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("long")  # noqa: E731
    per_group = (
        j.groupBy(*group_cols)
        .agg(
            F.max("n_cur").alias("n_cur"),
            F.max("n_base").alias("n_base"),
            F.count(F.lit(1)).alias("n_categories"),
            F.sum(
                ((F.col("base_cnt") == 0) & (F.col("cur_cnt") > 0)).cast("long")
            ).alias("new_categories"),
            F.sum(scaled(psi_c)).alias("_psi_s"),
            F.sum(F.coalesce(scaled(chi2_c), F.lit(0))).alias("_chi2_s"),
        )
    )
    psi = F.col("_psi_s") / 1e6
    return per_group.select(
        *group_cols,
        "n_cur",
        "n_base",
        "n_categories",
        "new_categories",
        psi.alias("psi"),
        (F.col("_chi2_s") / 1e6).alias("chi2"),
        F.when(F.col("_psi_s") >= F.lit(int(psi_major * 1e6)), F.lit("major"))
        .when(F.col("_psi_s") >= F.lit(int(psi_moderate * 1e6)), F.lit("moderate"))
        .otherwise(F.lit("stable"))
        .alias("verdict"),
    ).orderBy(*group_cols)


def _grouped_category_histogram(
    df: DataFrame, group_cols: list[str], column: str
) -> DataFrame:
    return df.groupBy(
        *[F.col(g) for g in group_cols], F.col(column).alias("category")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def drift_matrix(
    current: DataFrame,
    baseline: DataFrame,
    group_cols,
    column: str,
    eps: float = 1e-6,
) -> DataFrame:
    """Categorical per-slice drift: (group..., n_cur, n_base, n_categories,
    new_categories, psi, chi2, verdict), one grouped plan. NULL group keys
    never join across sides (standard join semantics) — filter or fill
    them upstream if NULL is a meaningful slice."""
    gs = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return drift_matrix_from_histograms(
        _grouped_category_histogram(current, gs, column),
        _grouped_category_histogram(baseline, gs, column),
        gs,
        eps,
    )


def drift_matrix_numeric(
    current: DataFrame,
    baseline: DataFrame,
    group_cols,
    column: str,
    lo: float,
    hi: float,
    n_bins: int = 32,
    eps: float = 1e-6,
) -> DataFrame:
    """Numeric per-slice drift on the shared uniform bin grid (same
    engine-exact bin arithmetic as the binned KS/PSI)."""
    gs = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def hist(df: DataFrame) -> DataFrame:
        c = F.col(column).cast("double")
        return (
            df.filter(c.isNotNull())
            .groupBy(
                *[F.col(g) for g in gs],
                binned_ecdf_bin(c, lo, hi, n_bins).alias("category"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    return drift_matrix_from_histograms(hist(current), hist(baseline), gs, eps)


# ---------------------------------------------------------------------------
# Whole-table drift report: every column in ONE pass per side
# ---------------------------------------------------------------------------


def drift_report(
    current: DataFrame,
    baseline: DataFrame,
    numeric_cols: dict | None = None,
    categorical_cols=None,
    eps: float = 1e-6,
    psi_moderate: float = 0.1,
    psi_major: float = 0.25,
) -> DataFrame:
    """Drift verdict for EVERY requested column in one scan per side.

    ``numeric_cols`` maps column -> (lo, hi, n_bins) on the shared uniform
    ECDF grid; ``categorical_cols`` lists string/low-cardinality columns
    histogrammed by raw value. Each row explodes into one (column, category)
    entry per requested column (codegen'd generator — no Python, no
    per-column scans), then ONE groupBy(column, category) aggregate per side
    feeds ``drift_matrix_from_histograms`` with the column name as the
    group. Plan cost: one scan + one narrow shuffle per side whose row count
    is the SUM of the columns' category cardinalities — independent of table
    width scanned (column pruning keeps the scan to the requested columns)
    and of row count.

    NULL values are excluded from every histogram (numeric bins of NULL are
    NULL, categorical NULLs are filtered): drift here means "the
    distribution of present values moved"; null-fraction drift is a
    column_stats comparison, not a shape change. Bin ids are rendered as
    strings so numeric and categorical columns share one category domain —
    per-column, so the mixed domain never collides.

    Output: (column, n_cur, n_base, n_categories, new_categories, psi,
    chi2, verdict) — one row per column, ordered by column.
    """
    numeric_cols = numeric_cols or {}
    categorical_cols = list(categorical_cols or [])
    if not numeric_cols and not categorical_cols:
        raise ValueError("drift_report: no columns requested")

    def hist(df: DataFrame) -> DataFrame:
        entries = []
        for c, (lo, hi, n_bins) in numeric_cols.items():
            entries.append(
                F.struct(
                    F.lit(c).alias("column"),
                    binned_ecdf_bin(F.col(c).cast("double"), lo, hi, n_bins)
                    .cast("string")
                    .alias("category"),
                )
            )
        for c in categorical_cols:
            entries.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast("string").alias("category"),
                )
            )
        return (
            df.select(F.explode(F.array(*entries)).alias("e"))
            .select("e.column", "e.category")
            .filter(F.col("category").isNotNull())
            .groupBy("column", "category")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    return drift_matrix_from_histograms(
        hist(current), hist(baseline), ["column"], eps, psi_moderate, psi_major
    )
