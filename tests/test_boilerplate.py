"""Block-level dedup (boilerplate removal): alignment, thresholding,
reassembly invariant, full-boilerplate documents."""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators import boilerplate
from jsonschema_spark.operators.text import normalize

# 4-token boilerplate header shared across docs (block_tokens=4 aligns it
# to block 0 exactly)
HEADER = "all rights reserved worldwide"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_common_prefix_block_removed(spark):
    rows = [(i, f"{HEADER} unique{i} words{i} for{i} document{i} here{i}") for i in range(5)]
    rows.append((99, "no boilerplate in this one at all"))
    out = boilerplate.remove_common_blocks(
        _docs(spark, rows), block_tokens=4, min_doc_freq=3
    )
    by_id = {r["doc_id"]: r for r in out.collect()}
    assert len(by_id) == 6
    for i in range(5):
        assert by_id[i]["n_removed"] == 1
        assert by_id[i]["clean_text"] == f"unique{i} words{i} for{i} document{i} here{i}"
    assert by_id[99]["n_removed"] == 0
    assert by_id[99]["clean_text"] == "no boilerplate in this one at all"


def test_threshold_not_reached_keeps_blocks(spark):
    rows = [(i, f"{HEADER} doc {i}") for i in range(2)]  # doc_freq 2 < 3
    out = boilerplate.remove_common_blocks(
        _docs(spark, rows), block_tokens=4, min_doc_freq=3
    )
    assert all(r["n_removed"] == 0 for r in out.collect())


def test_within_doc_repeat_counts_one_document(spark):
    # the same block twice in ONE doc: doc_freq must be 1 (countDistinct)
    rows = [(1, f"{HEADER} {HEADER}"), (2, "totally different words here now")]
    out = boilerplate.remove_common_blocks(
        _docs(spark, rows), block_tokens=4, min_doc_freq=2
    )
    assert {r["doc_id"]: r["n_removed"] for r in out.collect()} == {1: 0, 2: 0}


def test_full_boilerplate_doc_empties_not_drops(spark):
    rows = [(i, HEADER) for i in range(4)]
    out = boilerplate.remove_common_blocks(
        _docs(spark, rows), block_tokens=4, min_doc_freq=3
    )
    got = out.collect()
    assert len(got) == 4
    assert all(r["clean_text"] == "" and r["n_removed"] == r["n_blocks"] == 1 for r in got)


def test_reassembly_identity_when_nothing_common(spark):
    # unique texts, high threshold: clean_text == normalized original
    rows = [(i, f"Doc {i}  has   MIXED case and {i * 7} spacing") for i in range(6)]
    df = _docs(spark, rows)
    out = boilerplate.remove_common_blocks(df, block_tokens=3, min_doc_freq=99)
    joined = out.join(df.select("doc_id", normalize(F.col("text")).alias("norm")), "doc_id")
    assert joined.filter(F.col("clean_text") != F.col("norm")).count() == 0


def test_null_text_excluded(spark):
    rows = [(1, "some real text right here"), (2, None)]
    out = boilerplate.remove_common_blocks(_docs(spark, rows), block_tokens=4)
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_min_doc_freq_guard():
    with pytest.raises(ValueError):
        boilerplate.remove_common_blocks(None, min_doc_freq=1)
