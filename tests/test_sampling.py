"""Deterministic sampling operators (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.sampling import (
    hash_sample,
    sample_report,
    stratified_sample,
    token_budget_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, "en" if i % 3 else "de", f"src{i % 4}", 100 + (i % 7) * 10)
        for i in range(400)
    ]
    rows.append((None, "en", "src0", 100))  # null key: never sampled
    return spark.createDataFrame(rows, "doc_id long, lang string, source string, n_chars long")


def test_hash_sample_deterministic_and_seeded(docs):
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, seed="x").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, seed="x").collect()}
    c = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, seed="y").collect()}
    assert a == b                      # re-runs identical
    assert a != c                      # seed changes the sample
    assert None not in a
    assert 0.2 < len(a) / 400 < 0.4    # binomial around 0.3


def test_hash_sample_rate_monotone(docs):
    """A row kept at rate r is kept at every r' > r (nested samples — the
    property that lets a pipeline tighten budgets without resampling)."""
    small = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1, seed="x").collect()}
    big = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5, seed="x").collect()}
    assert small <= big


def test_stratified_rates(docs):
    s = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.0, "de": 1.0}, default_rate=0.0, seed="x"
    )
    out = s.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in out}
    assert "en" not in by
    assert by["de"] == 134  # every non-null de row (i % 3 == 0, i in 0..399)


def test_stratified_default_rate(docs):
    s = stratified_sample(docs, "doc_id", "lang", {}, default_rate=1.0, seed="x")
    assert s.count() == 400  # all non-null keys kept


def test_token_budget_respected_per_stratum(docs):
    s = token_budget_sample(docs, "doc_id", "n_chars", 900, strata_col="source")
    sums = {
        r["source"]: r["s"]
        for r in s.groupBy("source").agg(F.sum("n_chars").alias("s")).collect()
    }
    assert sums and all(v <= 900 for v in sums.values())


def test_token_budget_is_greedy_prefix(docs):
    """Kept set = longest hash-ordered prefix within budget: adding the
    first excluded row must break the budget."""
    budget = 900
    s = token_budget_sample(docs, "doc_id", "n_chars", budget, strata_col="source")
    kept = {r["doc_id"] for r in s.collect()}
    from jsonschema_spark.operators.sampling import sample_hash

    ordered = (
        docs.where(F.col("doc_id").isNotNull())
        .withColumn("_h", sample_hash(F.col("doc_id")))
        .orderBy("_h", "doc_id")
        .collect()
    )
    by_src: dict = {}
    for r in ordered:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        run = 0
        for r in rows:
            run += r["n_chars"]
            assert (r["doc_id"] in kept) == (run <= budget)


def test_token_budget_append_stable(spark, docs):
    """Appending rows never evicts a kept row whose hash precedes theirs...
    verified the practical way: the sample of a subset is a superset filter
    of the full sample restricted to that subset's prefix condition — here
    we just pin that removing NON-sampled rows leaves the sample unchanged."""
    s1 = token_budget_sample(docs, "doc_id", "n_chars", 900, strata_col="source")
    kept = {r["doc_id"] for r in s1.collect()}
    shrunk = docs.where(F.col("doc_id").isNull() | F.col("doc_id").isin(*kept))
    s2 = token_budget_sample(shrunk, "doc_id", "n_chars", 900, strata_col="source")
    assert {r["doc_id"] for r in s2.collect()} == kept


def test_sample_report(docs):
    s = stratified_sample(docs, "doc_id", "lang", {"de": 1.0}, seed="x")
    rep = {r["stratum"]: r for r in sample_report(docs, s, "lang", "n_chars").collect()}
    assert rep["de"]["rows_kept"] == rep["de"]["rows_in"]  # rate 1.0, no null keys in de
    assert rep["en"]["rows_kept"] == 0 and rep["en"]["weight_kept"] == 0
    assert rep["en"]["rows_in"] == 267  # 266 en rows + 1 null-key en row


def test_weighted_sample_topk_per_stratum(docs):
    from jsonschema_spark.operators.sampling import weighted_sample

    s = weighted_sample(docs, "doc_id", "n_chars", 3, strata_col="source")
    counts = {r["source"]: r["c"] for r in
              s.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(counts) == {"src0", "src1", "src2", "src3"}
    assert all(v == 3 for v in counts.values())
    # deterministic across re-runs
    a = sorted(r["doc_id"] for r in s.collect())
    b = sorted(r["doc_id"] for r in
               weighted_sample(docs, "doc_id", "n_chars", 3, strata_col="source").collect())
    assert a == b


def test_weighted_sample_prefers_heavy_rows(spark):
    """Inclusion probability scales with weight: with one huge-weight row,
    u^(1/w) -> 1 and it must always be selected."""
    from jsonschema_spark.operators.sampling import weighted_sample

    rows = [(i, 1) for i in range(50)] + [(99, 10_000_000)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = {r["id"] for r in weighted_sample(df, "id", "w", 5).collect()}
    assert 99 in out and len(out) == 5


def test_weighted_sample_excludes_bad_weights(spark):
    from jsonschema_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, None), (None, 10)], "id long, w long"
    )
    assert [r["id"] for r in weighted_sample(df, "id", "w", 10).collect()] == [1]


# ---------------------------------------------------------------- mixture


def test_mixture_plan_alpha_half_upweights_small(docs):
    from jsonschema_spark.operators.sampling import mixture_plan

    plan = {r["stratum"]: r for r in mixture_plan(docs, "lang", budget=100).collect()}
    # en has ~2x the rows of de; sqrt temperature gives de a mixture share
    # ABOVE its mass share and en below
    n_en, n_de = plan["en"]["n"], plan["de"]["n"]
    assert n_en > n_de
    assert plan["de"]["mix_p"] > n_de / (n_en + n_de)
    assert plan["en"]["mix_p"] < n_en / (n_en + n_de)
    assert abs(plan["en"]["mix_p"] + plan["de"]["mix_p"] - 1.0) < 1e-9


def test_mixture_plan_alpha_one_is_proportional(docs):
    from jsonschema_spark.operators.sampling import mixture_plan

    plan = {r["stratum"]: r for r in mixture_plan(docs, "lang", 100, alpha=1.0).collect()}
    n_en, n_de = plan["en"]["n"], plan["de"]["n"]
    assert abs(plan["en"]["mix_p"] - n_en / (n_en + n_de)) < 1e-12
    # expected kept mass = budget * p; rate = budget * p / n
    assert abs(plan["en"]["rate"] - 100 * plan["en"]["mix_p"] / n_en) < 1e-12


def test_mixture_plan_rate_caps_at_one(docs):
    from jsonschema_spark.operators.sampling import mixture_plan

    plan = mixture_plan(docs, "lang", budget=10**9).collect()
    assert all(r["rate"] == 1.0 for r in plan)


def test_mixture_sample_hits_budget_and_is_deterministic(docs):
    from jsonschema_spark.operators.sampling import mixture_sample

    a = {r["doc_id"] for r in mixture_sample(docs, "doc_id", "lang", 200, seed="m").collect()}
    b = {r["doc_id"] for r in mixture_sample(docs, "doc_id", "lang", 200, seed="m").collect()}
    assert a == b
    assert None not in a
    assert 140 < len(a) < 260  # binomial around 200 total


def test_mixture_sample_weighted_mass(docs):
    """Weighted mixture: budget counts n_chars mass, not rows."""
    from jsonschema_spark.operators.sampling import mixture_sample

    s = mixture_sample(docs, "doc_id", "lang", 20000, weight_col="n_chars", seed="m")
    kept_mass = s.agg(F.sum("n_chars")).collect()[0][0]
    assert 12000 < kept_mass < 28000


def test_assign_splits_total_and_deterministic(docs):
    from jsonschema_spark.operators.sampling import assign_splits

    fr = {"train": 0.8, "valid": 0.1, "test": 0.1}
    a = assign_splits(docs, "doc_id", fr, seed="s")
    b = assign_splits(docs, "doc_id", fr, seed="s")
    rows_a = {r["doc_id"]: r["split"] for r in a.collect()}
    rows_b = {r["doc_id"]: r["split"] for r in b.collect()}
    assert rows_a == rows_b  # rerun-stable
    assert len(rows_a) == docs.count()  # total assignment, no drops
    counts = {}
    for s in rows_a.values():
        counts[s] = counts.get(s, 0) + 1
    n = len(rows_a)
    assert counts.get("train", 0) > 0.6 * n  # binomial around 0.8
    assert set(counts) <= {"train", "valid", "test"}


def test_assign_splits_group_cohesion(spark):
    """THE leakage property: every member of a group lands in the same
    split, whatever the group sizes."""
    from jsonschema_spark.operators.sampling import assign_splits

    rows = [(i, i % 37) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, cluster long")
    out = assign_splits(
        df, "doc_id", {"train": 0.5, "valid": 0.25, "test": 0.25},
        group_col="cluster", seed="g",
    )
    per_group = (
        out.groupBy("cluster")
        .agg(F.count_distinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_group)
    # and the groups themselves spread over more than one split
    assert out.select("split").distinct().count() > 1


def test_assign_splits_rejects_bad_fractions(docs):
    import pytest

    from jsonschema_spark.operators.sampling import assign_splits

    with pytest.raises(ValueError):
        assign_splits(docs, "doc_id", {"train": 0.5, "test": 0.4})
    with pytest.raises(ValueError):
        assign_splits(docs, "doc_id", {"all": 1.0})
