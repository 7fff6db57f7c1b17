"""Chunking + packing: reassembly and straddle invariants."""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators import chunk

pytestmark = pytest.mark.usefixtures("spark")


def _doc(n_tokens: int) -> str:
    return " ".join(f"w{i}" for i in range(n_tokens))


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, _doc(100)),   # many chunks
        (2, _doc(32)),    # exactly one full chunk
        (3, _doc(33)),    # one full + one short chunk
        (4, _doc(5)),     # single short chunk
        (5, ""),          # empty text
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_counts_and_sizes(docs):
    ch = chunk.chunk_documents(docs, chunk_tokens=32, overlap=4)
    rows = ch.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # n=100, stride=28: 1 + ceil(68/28) = 4 chunks
    assert len(by_doc[1]) == 4
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 32
    assert len(by_doc[3]) == 2
    assert sorted(r["n_tokens"] for r in by_doc[3]) == [5, 32]
    assert len(by_doc[4]) == 1 and by_doc[4][0]["n_tokens"] == 5
    # empty text normalizes to one empty token (split semantics)
    assert len(by_doc[5]) == 1


def test_chunk_reassembly_exact(docs):
    """Dropping each chunk's overlap prefix (except chunk 0) and
    concatenating over chunk_idx reproduces the token stream exactly."""
    ch = chunk.chunk_documents(docs, chunk_tokens=32, overlap=4).collect()
    per_doc = {}
    for r in sorted(ch, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        toks = r["chunk_text"].split(" ") if r["chunk_text"] else []
        if r["chunk_idx"] > 0:
            toks = toks[4:]
        per_doc.setdefault(r["doc_id"], []).extend(toks)
    assert per_doc[1] == _doc(100).split(" ")
    assert per_doc[3] == _doc(33).split(" ")


def test_chunk_bad_overlap_rejected(docs):
    with pytest.raises(ValueError):
        chunk.chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_pack_plan_straddle(spark):
    rows = [
        (1, "a", 600),
        (2, "a", 600),   # offset 600, ends 1199 -> pack 0..1 straddle
        (3, "a", 400),   # offset 1200 -> pack 1
        (4, "a", 0),     # zero weight at offset 1600 -> pack 1, n_packs 1
        (5, "a", 2500),  # offset 1600, ends 4099 -> packs 1..4
        (6, "b", 100),   # other group starts at offset 0
        (7, "b", None),  # NULL weight excluded
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    plan = {
        r["doc_id"]: r
        for r in chunk.pack_plan(df, budget=1000, weight_col="n_chars").collect()
    }
    assert set(plan) == {1, 2, 3, 4, 5, 6}
    assert (plan[1]["offset"], plan[1]["pack_first"], plan[1]["pack_last"]) == (0, 0, 0)
    assert (plan[2]["pack_first"], plan[2]["pack_last"], plan[2]["n_packs"]) == (0, 1, 2)
    assert (plan[3]["pack_first"], plan[3]["pack_last"]) == (1, 1)
    assert (plan[4]["offset"], plan[4]["n_packs"]) == (1600, 1)
    assert (plan[5]["pack_first"], plan[5]["pack_last"], plan[5]["n_packs"]) == (1, 4, 4)
    assert (plan[6]["offset"], plan[6]["pack_first"]) == (0, 0)


def test_pack_plan_offsets_are_prefix_sums(spark):
    rows = [(i, "s", 100 + i) for i in range(1, 20)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    plan = sorted(
        chunk.pack_plan(df, budget=500, weight_col="n_chars").collect(),
        key=lambda r: r["doc_id"],
    )
    run = 0
    for r in plan:
        assert r["offset"] == run
        run += r["weight"]
