"""Filter-model evaluation metrics: confusion sweep, ROC-AUC (exact +
binned), PR curve, calibration/ECE, Cohen's kappa — each pinned against an
independent pure-Python computation on hand-checkable frames."""

import math
import random

import pytest

from jsonschema_spark.operators import evalmetrics as em


def _mk(spark, rows):
    return spark.createDataFrame(rows, "score double, label boolean")


# ---------------------------------------------------------------------------
# Pure-Python references (independent of the Spark implementations)
# ---------------------------------------------------------------------------


def _auc_ref(pairs):
    """Exact tie-corrected Mann-Whitney AUC over (score, label) pairs."""
    pos = sorted(s for s, y in pairs if y)
    neg = sorted(s for s, y in pairs if not y)
    if not pos or not neg:
        return None
    wins = ties = 0
    for p in pos:
        for q in neg:
            if p > q:
                wins += 1
            elif p == q:
                ties += 1
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def _confusion_ref(pairs, t):
    tp = sum(1 for s, y in pairs if s >= t and y)
    fp = sum(1 for s, y in pairs if s >= t and not y)
    fn = sum(1 for s, y in pairs if s < t and y)
    tn = sum(1 for s, y in pairs if s < t and not y)
    return tp, fp, tn, fn


PAIRS = [
    (0.9, True), (0.8, True), (0.7, False), (0.6, True), (0.6, False),
    (0.5, True), (0.4, False), (0.3, False), (0.2, True), (0.1, False),
]


def test_confusion_report_counts(spark):
    df = _mk(spark, PAIRS)
    rows = {
        r["threshold"]: r
        for r in em.confusion_report(df, "score", "label", [0.35, 0.6]).collect()
    }
    for t in (0.35, 0.6):
        tp, fp, tn, fn = _confusion_ref(PAIRS, t)
        r = rows[t]
        assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (tp, fp, tn, fn)
        assert r["precision"] == pytest.approx(tp / (tp + fp))
        assert r["recall"] == pytest.approx(tp / (tp + fn))
        assert r["f1"] == pytest.approx(2 * tp / (2 * tp + fp + fn))
        assert r["accuracy"] == pytest.approx((tp + tn) / len(PAIRS))


def test_confusion_degenerate_threshold(spark):
    df = _mk(spark, PAIRS)
    r = em.confusion_report(df, "score", "label", [2.0]).collect()[0]
    assert r["tp"] == 0 and r["fp"] == 0
    assert r["precision"] is None  # no predicted positives
    assert r["recall"] == 0.0


def test_auc_exact_matches_reference(spark):
    df = _mk(spark, PAIRS)
    r = em.roc_auc_exact(df, "score", "label").collect()[0]
    assert r["n_pos"] == 5 and r["n_neg"] == 5
    assert r["auc"] == pytest.approx(_auc_ref(PAIRS), abs=1e-9)


def test_auc_exact_random_with_ties(spark):
    rng = random.Random(7)
    pairs = [
        (round(rng.choice([0.1, 0.2, 0.3, 0.5, 0.8]) + rng.choice([0, 0.05]), 2),
         rng.random() < 0.4)
        for _ in range(200)
    ]
    df = _mk(spark, pairs)
    r = em.roc_auc_exact(df, "score", "label").collect()[0]
    assert r["auc"] == pytest.approx(_auc_ref(pairs), abs=1e-9)


def test_auc_perfect_and_inverted(spark):
    perfect = [(float(i), i >= 5) for i in range(10)]
    df = _mk(spark, perfect)
    assert em.roc_auc_exact(df, "score", "label").collect()[0]["auc"] == 1.0
    inverted = [(float(i), i < 5) for i in range(10)]
    df = _mk(spark, inverted)
    assert em.roc_auc_exact(df, "score", "label").collect()[0]["auc"] == 0.0


def test_auc_single_class_null(spark):
    df = _mk(spark, [(0.5, True), (0.7, True)])
    assert em.roc_auc_exact(df, "score", "label").collect()[0]["auc"] is None


def test_auc_binned_converges_to_exact(spark):
    rng = random.Random(11)
    pairs = [(rng.random(), rng.random() < 0.5) for _ in range(500)]
    # separable-ish signal so AUC is away from 0.5
    pairs = [(s + (0.3 if y else 0.0), y) for s, y in pairs]
    df = _mk(spark, pairs)
    exact = em.roc_auc_exact(df, "score", "label").collect()[0]["auc"]
    coarse = em.roc_auc_binned(df, "score", "label", 0.0, 1.3, 16).collect()[0]
    fine = em.roc_auc_binned(df, "score", "label", 0.0, 1.3, 2048).collect()[0]
    assert abs(fine["auc"] - exact) < abs(coarse["auc"] - exact) + 1e-9
    assert fine["auc"] == pytest.approx(exact, abs=0.01)


def test_pr_curve_monotone_recall(spark):
    df = _mk(spark, PAIRS)
    rows = em.pr_curve(df, "score", "label", 0.0, 1.0, 10).collect()
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)  # recall falls as bin rises
    # lowest threshold row predicts everything it has seen cumulatively
    top = rows[-1]
    assert top["n_pred"] == top["tp"] + top["fp"]
    # full-recall row: the lowest occupied bin's cumulative tp == n_pos
    assert rows[0]["recall"] == 1.0


def test_calibration_and_ece_exact(spark):
    pairs = [
        (0.05, False), (0.15, False), (0.15, True),
        (0.55, True), (0.55, False), (0.95, True), (0.95, True),
    ]
    df = _mk(spark, pairs)
    rows = {r["bin"]: r for r in
            em.calibration_report(df, "score", "label", n_bins=10).collect()}
    # bin for 0.55 with lo=0, hi=1, 10 bins: ceil(0.55/0.1)=6
    b6 = rows[6]
    assert b6["n"] == 2 and b6["n_pos"] == 1
    assert b6["avg_score"] == pytest.approx(0.55)
    assert b6["pos_rate"] == pytest.approx(0.5)
    assert b6["gap"] == pytest.approx(0.05)
    ece = em.expected_calibration_error(df, "score", "label", n_bins=10).collect()[0]
    ref = sum(
        abs(sum(s for s, _ in grp) - sum(1 for _, y in grp if y))
        for grp in [
            [p for p in pairs if math.ceil(p[0] * 10) == b]
            for b in range(1, 11)
        ]
        if grp
    ) / len(pairs)
    assert ece["ece"] == pytest.approx(ref, abs=1e-9)
    assert ece["n"] == len(pairs)


def test_agreement_kappa(spark):
    rows = [(True, True)] * 40 + [(False, False)] * 40 + \
           [(True, False)] * 10 + [(False, True)] * 10
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = em.agreement_report(df, "a", "b").collect()[0]
    po = 0.8
    pe = 0.5 * 0.5 + 0.5 * 0.5
    assert r["observed_agreement"] == pytest.approx(po)
    assert r["expected_agreement"] == pytest.approx(pe)
    assert r["kappa"] == pytest.approx((po - pe) / (1 - pe))


def test_agreement_constant_gate_null_kappa(spark):
    df = spark.createDataFrame([(True, True)] * 5, "a boolean, b boolean")
    r = em.agreement_report(df, "a", "b").collect()[0]
    assert r["kappa"] is None  # pe == 1, chance-corrected agreement undefined


def test_null_rows_dropped(spark):
    df = spark.createDataFrame(
        [(0.9, True), (None, True), (0.1, None)],
        "score double, label boolean",
    )
    r = em.confusion_report(df, "score", "label", [0.5]).collect()[0]
    assert r["tp"] + r["fp"] + r["tn"] + r["fn"] == 1


def test_roc_auc_binned_by_matches_per_slice(spark):
    rng = random.Random(23)
    rows = []
    for i in range(400):
        sl = ("en", "de", "fr")[i % 3]
        label = rng.random() < 0.4
        score = rng.random() * 0.8 + (0.2 if label else 0.0)
        rows.append((sl, score, label))
    rows.append((None, 0.5, True))  # NULL slice survives as its own row
    rows.append((None, 0.4, False))
    df = spark.createDataFrame(rows, "lang string, score double, label boolean")
    got = {
        r["slice"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in em.roc_auc_binned_by(
            df, "score", "label", "lang", -0.5, 1.5, 64
        ).collect()
    }
    assert set(got) == {"en", "de", "fr", None}
    for sl in ("en", "de", "fr"):
        solo = em.roc_auc_binned(
            df.filter(f"lang = '{sl}'"), "score", "label", -0.5, 1.5, 64
        ).collect()[0]
        assert got[sl] == (solo["n_pos"], solo["n_neg"], solo["auc"])
    assert got[None] == (1, 1, 1.0)  # the lone positive outranks the negative


def test_auc_exact_guard_trips_above_ceiling(spark):
    """roc_auc_exact must refuse its single-reducer rank window above the
    documented ceiling (VERDICT r2 item 3)."""
    from jsonschema_spark.operators.drift import ExactAuditScaleError

    pairs = [(float(i), i % 2 == 0) for i in range(40)]
    df = _mk(spark, pairs)
    with pytest.raises(ExactAuditScaleError, match="roc_auc_exact"):
        em.roc_auc_exact(df, "score", "label", max_rows=10)
    r = em.roc_auc_exact(df, "score", "label", max_rows=40).collect()[0]
    assert r["n_pos"] == 20
