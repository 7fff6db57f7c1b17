"""Benchmark decontamination: planted-overlap semantics."""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators import decontaminate

pytestmark = pytest.mark.usefixtures("spark")


CORPUS = [
    # doc 1 contains the benchmark question verbatim (contaminated)
    (1, "intro words then what is the capital of france here and a tail"),
    # doc 2 shares only a 4-gram suffix of it (NOT contaminated at n=5)
    (2, "nothing here but the capital of france appears short"),
    # doc 3 clean
    (3, "completely unrelated text about spark shuffles and join plans"),
    # doc 4 empty
    (4, ""),
    # doc 5 contains the second benchmark line with different casing/space
    (5, "she said  Name The Largest Planet In the solar system today"),
]

BENCH = [
    ("what is the capital of france",),
    ("name the largest planet in our solar system",),
]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["text"])
    return docs, bench


def test_contamination_report_flags_planted(frames):
    docs, bench = frames
    rep = decontaminate.contamination_report(docs, bench, n=5)
    rows = {r["doc_id"]: r for r in rep.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}

    # doc 1: "what is the capital of france" = 6 tokens -> two 5-grams hit
    assert rows[1]["contaminated_ngrams"] == 2
    assert rows[1]["total_ngrams"] == 9  # 13 tokens -> 9 distinct 5-grams

    # doc 2: only a 4-token overlap -> no shared 5-gram
    assert rows[2]["contaminated_ngrams"] == 0
    # doc 3 clean, doc 4 gram-less (explode_outer keeps it, zero counts)
    assert rows[3]["contaminated_ngrams"] == 0
    assert rows[4]["total_ngrams"] == 0
    assert rows[4]["contamination"] == 0.0

    # doc 5: "name the largest planet in the solar system" — differs from
    # the benchmark's "in OUR solar system", so only the prefix 5-gram
    # "name the largest planet in" matches; normalization handled casing.
    assert rows[5]["contaminated_ngrams"] == 1


def test_contamination_fraction(frames):
    docs, bench = frames
    rep = decontaminate.contamination_report(docs, bench, n=5)
    r1 = rep.filter(F.col("doc_id") == 1).collect()[0]
    assert r1["contamination"] == round(2 / 9, 6)


def test_decontaminate_drops_flagged(frames):
    docs, bench = frames
    kept = decontaminate.decontaminate(docs, bench, n=5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 4]


def test_min_hits_threshold(frames):
    docs, bench = frames
    # min_hits=2: only doc 1 (2 shared grams) is dropped; doc 5 (1) survives
    kept = decontaminate.decontaminate(docs, bench, n=5, min_hits=2)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 4, 5]


def test_empty_benchmark_keeps_everything(spark, frames):
    docs, _ = frames
    bench = spark.createDataFrame([("",)], ["text"])
    kept = decontaminate.decontaminate(docs, bench, n=5)
    assert kept.count() == docs.count()
