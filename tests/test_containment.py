"""Segment-level audio containment (operators/dedup.audio_containment_pairs).

The composition flagship: segment_clips (Column algebra) -> per-segment
spectral fingerprint + LSH (one Arrow hop) -> cross-clip bucket join ->
cosine verify -> pair rollup.
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import audio_containment_pairs
from jsonschema_spark.sources.clips import synth_containment_clips


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_containment_clips(spark, 80, period=4, partitions=4)


def test_containment_finds_exactly_planted_pairs(corpus):
    pairs = audio_containment_pairs(corpus.drop("_row_idx"))
    found = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    expected = sorted(
        (f"clip-{i-1:012d}", f"clip-{i:012d}")
        for i in range(80)
        if i % 4 == 3 and i > 0
    )
    assert found == expected


def test_containment_matches_both_base_windows(corpus):
    """The 2s base recording is stationary, so BOTH its 1s windows match
    the excerpt — the rollup reports them as one pair, 2 windows."""
    pairs = audio_containment_pairs(corpus.drop("_row_idx")).collect()
    assert pairs
    for r in pairs:
        assert r["n_matched_segments"] == 2
        assert r["max_cos"] >= 0.999


def test_planted_pair_count(corpus):
    seg_pairs = audio_containment_pairs(corpus.drop("_row_idx")).count()
    assert seg_pairs == 20  # i in {3,7,...,79}: 20 planted excerpts


def test_fingerprints_cached_once(corpus):
    """Fingerprints are computed once behind the persist barrier; both
    bucket-join sides must read the cache (InMemoryTableScan), never
    re-run the decode UDF. The plan STRING prints the cached subtree
    (containing the ArrowEvalPython) under each side — the assertion that
    matters is that every UDF occurrence sits beneath an InMemoryRelation
    and both sides scan it."""
    plan = (
        audio_containment_pairs(corpus.drop("_row_idx"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("InMemoryTableScan") >= 2
    # no un-cached UDF: every ArrowEvalPython line belongs to the cached
    # relation's stored plan, which always prints below InMemoryRelation
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "ArrowEvalPython" in ln:
            assert any("InMemoryRelation" in p for p in lines[max(0, i - 3): i])
