"""Linear quality model (text.model_quality_profile)."""

from pyspark.sql import functions as F

from jsonschema_spark.operators.text import (
    QUALITY_WEIGHTS_DEFAULT,
    model_quality_profile,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and keeps on "
                "running through the quiet field of tall grass toward it"),
            (2, "buy buy buy buy buy buy buy buy buy buy"),        # repetitive
            (3, "1029 3847 5561 9902 1234 5678 9012 3456"),        # digit dump
            (4, ""),                                               # empty
        ],
        "doc_id int, text string",
    )


def test_model_scores_separate_prose_from_junk(spark):
    rows = {r["doc_id"]: r for r in model_quality_profile(_docs(spark)).collect()}
    assert rows[1]["keep"] is True
    assert rows[3]["keep"] is False          # digit penalty dominates
    assert rows[4]["keep"] is False          # empty: only the bias
    assert rows[2]["unique_ratio"] == 0.1    # 1 distinct / 10 tokens
    assert rows[4]["score"] == QUALITY_WEIGHTS_DEFAULT["bias"]


def test_custom_weights_and_threshold(spark):
    w = dict(QUALITY_WEIGHTS_DEFAULT, bias=100.0)
    out = model_quality_profile(_docs(spark), weights=w, threshold=50.0)
    assert all(r["keep"] for r in out.collect())


def test_score_is_deterministic_margin(spark):
    r = {x["doc_id"]: x for x in model_quality_profile(_docs(spark)).collect()}[1]
    w = QUALITY_WEIGHTS_DEFAULT
    expected = round(
        w["bias"]
        + w["len_sat"] * r["len_sat"]
        + w["stopword_ratio"] * r["stopword_ratio"]
        + w["unique_ratio"] * r["unique_ratio"]
        + w["punct_ratio"] * r["punct_ratio"]
        + w["digit_ratio"] * r["digit_ratio"],
        9,
    )
    assert abs(r["score"] - expected) < 1e-9


def test_plan_single_scan_no_shuffle_no_python(spark):
    plan = (
        model_quality_profile(_docs(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the O(tokens) feature expressions must not be re-expanded into the
    # margin: each interpreted HOF (filter/aggregate over tokens) appears
    # exactly once in the physical projection
    assert plan.count("array_distinct") == 1
