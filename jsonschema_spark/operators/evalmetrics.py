"""Filter-model evaluation metrics — the measurement half of model-based
curation.

``text.model_quality_profile`` scores documents with a linear filter model
(the fastText/CCNet shape) and ``jobs/curate_documents_job --model-threshold``
gates on it. This module answers the question that gate raises at 100 TB:
*is the threshold right, and is the model any good against a trusted label?*
The same operators evaluate any (score, label) pair — a dedup classifier, a
language-ID gate, an audio quality gate — so they are the generic
eval harness for every filter in the pipeline.

Operators (all single-pass aggregates or narrow-histogram reductions —
no per-row windows, no Python):

- ``confusion_report``   — tp/fp/tn/fn + precision/recall/F1/accuracy at a
                           driver-literal threshold sweep; ONE wide aggregate
                           (2·k+2 fields — keep k under ~40 to stay inside the
                           whole-stage-codegen maxFields=100 cliff).
- ``roc_auc_binned``     — scale-default AUC: scores binned to a uniform grid
                           (ties at grid resolution), Mann-Whitney rank sums
                           over the <= n_bins+2 histogram rows. One narrow
                           groupBy(bin) shuffle; the cumulative window runs
                           over the tiny histogram only.
- ``roc_auc_exact``      — audit path: exact tie-corrected AUC via average
                           ranks over per-DISTINCT-SCORE groups. The window
                           is a global order over distinct scores — correct
                           always, single-reducer when scores are continuous;
                           keep it for audits/bounded slices (same disposition
                           as ``drift.ks_statistic_exact``).
- ``pr_curve``           — precision/recall at every grid edge from one
                           histogram + descending cumulative over bins.
- ``calibration_report`` / ``expected_calibration_error`` — reliability
                           table and ECE for a [0,1]-score. ECE's numerator is
                           SUM_b |sum_score_q_b - n_pos_b·2^30| over exact
                           binary-grid INTEGER score sums (fixed_q;
                           n_b·|avg_b - rate_b| = that·2^-30), so the statistic
                           is partition-order independent and engine/build-
                           replayable (the F.avg trap in CLAUDE.md).
- ``agreement_report``   — Cohen's kappa between two boolean gate columns
                           (heuristic vs model keep, two annotators, old vs
                           new model) from one 4-cell aggregate.

Determinism contract (shared with stats.moments/correlation_pairs): every
cross-row float accumulation goes through exact fixed-point INTEGER sums
(functions/grid.fixed_q — never a double→scaled-DECIMAL cast, whose tie
rounding is engine/build-dependent); everything after the aggregate is a
fixed sequence of correctly-rounded double ops, so the DuckDB oracles
reproduce results bit-for-bit on any build. Rank arithmetic keeps
2·ranksum as an exact integer (DECIMAL(38,0) — long overflows past ~3e9
rows) via the tie-group identity  sum_ranks = n_pos_g·(2·cum_less + n_g + 1)/2.

Scale notes (10^12 rows): binned AUC / PR / calibration shuffle <= n_bins+2
rows per aggregate — the same shape as drift.ks_statistic_binned. The
confusion sweep is one partial+final aggregate (shuffle = one row per task).
Nothing here references the input twice, so no persist barrier is needed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from jsonschema_spark.functions.grid import (
    FIXED_BIN_INV,
    fixed_q,
    grid_round,
)

from jsonschema_spark.operators.drift import binned_ecdf_bin

_DEC0 = "decimal(38,0)"
# Score sums quantize per row on the exact binary grid floor(s·2^30 + 0.5)
# (functions/grid.fixed_q) and sum INTEGERS — order-independent AND
# engine/build-portable; a per-row double→DECIMAL(38,12) cast is the
# build-dependent trap of the rounds-2/3 driver failures.
_FIXED_SCALE_LONG = 1 << 30


def _scored(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """(s double, y boolean) with NULL score/label rows dropped — a metric
    over rows that carry no score or label is undefined; surface those with
    a not_null check instead of silently counting them."""
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("boolean")
    return df.select(s.alias("s"), y.alias("y")).where(
        s.isNotNull() & y.isNotNull()
    )


def confusion_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: Sequence[float],
) -> DataFrame:
    """One row per threshold t (predict positive when score >= t):
    (threshold, tp, fp, tn, fn, precision, recall, f1, accuracy).

    ONE aggregate pass: per threshold two conditional sums (predicted
    positive, true positive); fp/fn/tn derive from the shared totals. F1 is
    computed directly as 2·tp/(2·tp+fp+fn) — one rounding, not three.
    """
    if not thresholds:
        raise ValueError("confusion_report: need at least one threshold")
    d = _scored(df, score_col, label_col)
    yl = F.col("y").cast("long")
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum(yl).alias("_np"),
    ]
    for i, t in enumerate(thresholds):
        pred = F.col("s") >= F.lit(float(t))
        aggs.append(F.sum(pred.cast("long")).alias(f"_pp_{i}"))
        aggs.append(F.sum((pred & F.col("y")).cast("long")).alias(f"_tp_{i}"))
    wide = d.agg(*aggs)

    entries = [
        F.struct(
            F.lit(float(t)).alias("threshold"),
            F.col(f"_pp_{i}").alias("pp"),
            F.col(f"_tp_{i}").alias("tp"),
        )
        for i, t in enumerate(thresholds)
    ]
    e = wide.select(
        F.col("_n").alias("n"), F.col("_np").alias("np"),
        F.explode(F.array(*entries)).alias("c"),
    ).select("n", "np", "c.*")
    tp = F.col("tp")
    fp = F.col("pp") - tp
    fn = F.col("np") - tp
    tn = F.col("n") - F.col("np") - fp
    return e.select(
        "threshold",
        tp.alias("tp"),
        fp.alias("fp"),
        tn.alias("tn"),
        fn.alias("fn"),
        F.when(F.col("pp") > 0, grid_round(tp / F.col("pp"), 9)).alias("precision"),
        F.when(F.col("np") > 0, grid_round(tp / F.col("np"), 9)).alias("recall"),
        F.when(
            (2 * tp + fp + fn) > 0, grid_round(2 * tp / (2 * tp + fp + fn), 9)
        ).alias("f1"),
        F.when(F.col("n") > 0, grid_round((tp + tn) / F.col("n"), 9)).alias(
            "accuracy"
        ),
    ).orderBy("threshold")


def _auc_from_groups(g: DataFrame, order_col: str) -> DataFrame:
    """Shared Mann-Whitney reduction over (order_col, n, np) tie groups:
    ranks ascend with order_col; a tie group's summed positive ranks are
    np·(2·cum_less + n + 1)/2 — kept ×2 in exact DECIMAL(38,0)."""
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("n").over(w)
    contrib = (
        F.col("np").cast(_DEC0)
        * (2 * (cum - F.col("n")) + F.col("n") + 1).cast(_DEC0)
    )
    agg = g.select(F.col("n"), F.col("np"), contrib.alias("r2")).agg(
        F.sum("r2").alias("r2"),
        F.sum("np").alias("n_pos"),
        F.sum("n").alias("n_all"),
    )
    n_pos = F.col("n_pos").cast(_DEC0)
    n_neg = (F.col("n_all") - F.col("n_pos")).cast(_DEC0)
    num = (F.col("r2") - n_pos * (n_pos + 1)).cast("double")
    den = (2 * n_pos * n_neg).cast("double")
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        (F.col("n_all") - F.col("n_pos")).cast("long").alias("n_neg"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_all") > F.col("n_pos")),
            grid_round(num / den, 9),
        ).alias("auc"),
    )


def roc_auc_exact(
    df: DataFrame,
    score_col: str,
    label_col: str,
    max_rows: int = None,
) -> DataFrame:
    """Exact tie-corrected ROC-AUC (one row: n_pos, n_neg, auc). AUDIT
    path: the rank window is a global order over DISTINCT scores — a single
    reducer when the score is continuous. Use ``roc_auc_binned`` as the
    registered/large-scale default (same disposition as exact vs binned KS).

    Guarded by a row-count ceiling (default ``drift.EXACT_AUDIT_MAX_ROWS``,
    10^7) so the single-reducer window can never silently run at corpus
    scale; raises ``drift.ExactAuditScaleError`` above it.
    """
    from jsonschema_spark.operators.drift import (
        EXACT_AUDIT_MAX_ROWS,
        _guard_exact_audit,
    )

    if max_rows is None:
        max_rows = EXACT_AUDIT_MAX_ROWS
    d = _scored(df, score_col, label_col)
    _guard_exact_audit(d.count(), "roc_auc_exact", max_rows)
    g = d.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("long")).alias("np"),
    )
    return _auc_from_groups(g, "s")


def _binned_groups(d: DataFrame, lo: float, hi: float, n_bins: int) -> DataFrame:
    return d.groupBy(
        binned_ecdf_bin(F.col("s"), lo, hi, n_bins).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("long")).alias("np"),
    )


def roc_auc_binned(
    df: DataFrame,
    score_col: str,
    label_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Scale-default AUC: scores tie at grid resolution (bins the shared
    ``binned_ecdf_bin`` arithmetic, so DuckDB bins bit-identically). Error
    vs exact AUC is bounded by the probability mass that CROSSES a bin edge
    between the classes — shrink it with n_bins, not with a sort. Shuffle
    <= n_bins+2 rows; the rank window runs over the histogram only."""
    d = _scored(df, score_col, label_col)
    return _auc_from_groups(_binned_groups(d, lo, hi, n_bins), "bin")


def roc_auc_binned_by(
    df: DataFrame,
    score_col: str,
    label_col: str,
    slice_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Per-slice binned AUC: one row per slice value (slice, n_pos,
    n_neg, auc) — the filter-model fairness/QA view (does the quality
    gate rank as well on every language/source as it does overall?).

    Same grid arithmetic as ``roc_auc_binned``; the rank window is
    PARTITIONED by slice so each partition holds <= n_bins+2 histogram
    rows — thousands of slices stay one narrow shuffle, never a global
    sort. NULL slices are kept as their own row (a silently-unsliceable
    subpopulation is a finding, not a drop)."""
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("boolean")
    d = df.select(
        F.col(slice_col).cast("string").alias("slice"),
        s.alias("s"),
        y.alias("y"),
    ).where(s.isNotNull() & y.isNotNull())
    g = d.groupBy(
        "slice", binned_ecdf_bin(F.col("s"), lo, hi, n_bins).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("long")).alias("np"),
    )
    w = Window.partitionBy("slice").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("n").over(w)
    contrib = (
        F.col("np").cast(_DEC0)
        * (2 * (cum - F.col("n")) + F.col("n") + 1).cast(_DEC0)
    )
    agg = g.select("slice", "n", "np", contrib.alias("r2")).groupBy(
        "slice"
    ).agg(
        F.sum("r2").alias("r2"),
        F.sum("np").alias("n_pos"),
        F.sum("n").alias("n_all"),
    )
    n_pos = F.col("n_pos").cast(_DEC0)
    n_neg = (F.col("n_all") - F.col("n_pos")).cast(_DEC0)
    num = (F.col("r2") - n_pos * (n_pos + 1)).cast("double")
    den = (2 * n_pos * n_neg).cast("double")
    return agg.select(
        "slice",
        F.col("n_pos").cast("long").alias("n_pos"),
        (F.col("n_all") - F.col("n_pos")).cast("long").alias("n_neg"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_all") > F.col("n_pos")),
            grid_round(num / den, 9),
        ).alias("auc"),
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Precision/recall at every occupied grid edge: one row per present
    bin b — (bin, threshold, n_pred, tp, fp, precision, recall) for the rule
    "predict positive when score falls in bin >= b" (threshold is b's lower
    edge; NULL for the underflow bin — that rule predicts everything).
    One narrow histogram + a descending cumulative over <= n_bins+2 rows."""
    step = (hi - lo) / n_bins
    d = _scored(df, score_col, label_col)
    g = _binned_groups(d, lo, hi, n_bins)
    w = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tp = F.sum("np").over(w)
    pp = F.sum("n").over(w)
    n_pos = F.sum("np").over(wall)
    thr = (
        F.when(F.col("bin") == 0, F.lit(None).cast("double"))
        .when(F.col("bin") == n_bins + 1, F.lit(float(hi)))
        .otherwise(F.lit(float(lo)) + (F.col("bin") - 1) * F.lit(float(step)))
    )
    return g.select(
        "bin",
        thr.alias("threshold"),
        pp.alias("n_pred"),
        tp.alias("tp"),
        (pp - tp).alias("fp"),
        F.when(pp > 0, grid_round(tp / pp, 9)).alias("precision"),
        F.when(n_pos > 0, grid_round(tp / n_pos, 9)).alias("recall"),
    ).orderBy("bin")


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability table for a [lo,hi] score: per occupied bin —
    (bin, n, n_pos, avg_score, pos_rate, gap). ``gap`` = |avg_score −
    pos_rate| computed as |sum_score_q − n_pos·2^30|·2^-30/n from the
    exact binary-grid integer score sum (fixed_q — integer subtract, one
    exact power-of-two scale, one division: engine/build-stable)."""
    d = _scored(df, score_col, label_col)
    g = d.groupBy(
        binned_ecdf_bin(F.col("s"), lo, hi, n_bins).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("long")).alias("n_pos"),
        F.sum(fixed_q(F.col("s"))).alias("ssum_q"),
    )
    nd = F.col("n").cast("double")
    ssum = F.col("ssum_q").cast("long").cast("double") * F.lit(FIXED_BIN_INV)
    dev_q = F.abs(
        F.col("ssum_q").cast("long") - F.col("n_pos") * F.lit(_FIXED_SCALE_LONG)
    )
    dev = dev_q.cast("double") * F.lit(FIXED_BIN_INV)
    return g.select(
        "bin",
        "n",
        "n_pos",
        grid_round(ssum / nd, 9).alias("avg_score"),
        grid_round(F.col("n_pos") / nd, 9).alias("pos_rate"),
        grid_round(dev / nd, 9).alias("gap"),
    ).orderBy("bin")


def expected_calibration_error(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """One row (n, n_bins_present, ece). ECE = SUM_b (n_b/N)·|avg_b −
    rate_b| = SUM_b |sum_score_q_b − n_pos_b·2^30|·2^-30 / N with every
    cross-row accumulation an exact INTEGER sum (fixed_q binary grid) —
    partition-order independent, no per-bin double adds, no double→DECIMAL
    cast."""
    d = _scored(df, score_col, label_col)
    g = d.groupBy(
        binned_ecdf_bin(F.col("s"), lo, hi, n_bins).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("long")).alias("n_pos"),
        F.sum(fixed_q(F.col("s"))).alias("ssum_q"),
    )
    num_q = F.abs(
        F.col("ssum_q").cast("long") - F.col("n_pos") * F.lit(_FIXED_SCALE_LONG)
    )
    agg = g.agg(
        F.sum("n").alias("n"),
        F.count(F.lit(1)).alias("n_bins_present"),
        F.sum(num_q.cast(_DEC0)).alias("dev_q"),
    )
    return agg.select(
        "n",
        "n_bins_present",
        F.when(
            F.col("n") > 0,
            grid_round(
                F.col("dev_q").cast("long").cast("double")
                * F.lit(FIXED_BIN_INV)
                / F.col("n").cast("double"),
                9,
            ),
        ).alias("ece"),
    )


def agreement_report(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa between two boolean gates (one row: n, n_a, n_b,
    n_both, observed_agreement, expected_agreement, kappa). One 4-cell
    aggregate; kappa NULL when chance agreement is 1 (a constant gate)."""
    a = F.col(col_a).cast("boolean")
    b = F.col(col_b).cast("boolean")
    d = df.select(a.alias("a"), b.alias("b")).where(
        a.isNotNull() & b.isNotNull()
    )
    agg = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a").cast("long")).alias("n_a"),
        F.sum(F.col("b").cast("long")).alias("n_b"),
        F.sum((F.col("a") & F.col("b")).cast("long")).alias("n_both"),
    )
    n = F.col("n").cast("double")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    both = F.col("n_both").cast("double")
    po = (n - na - nb + 2 * both) / n
    pe = (na / n) * (nb / n) + ((n - na) / n) * ((n - nb) / n)
    return agg.select(
        "n",
        "n_a",
        "n_b",
        "n_both",
        F.when(F.col("n") > 0, grid_round(po, 9)).alias("observed_agreement"),
        F.when(F.col("n") > 0, grid_round(pe, 9)).alias("expected_agreement"),
        F.when((F.col("n") > 0) & (pe < 1.0), grid_round((po - pe) / (1 - pe), 9)).alias(
            "kappa"
        ),
    )
