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


BOILER = (
    "subscribe to our newsletter follow us on social media"
    " all rights reserved terms of service apply"
)  # exactly 16 tokens -> one whole block at block_tokens=16


def test_curate_boilerplate_stage_unmasks_exact_dups(spark):
    """Two docs identical except for a shared boilerplate header are NOT
    exact dups raw; with the block-dedup stage on, the header is stripped
    (it occurs in >= 3 docs) and the exact fingerprint stage catches them."""
    rows = [
        _doc(1, BOILER + " " + BASE + " alpha"),
        _doc(2, BASE + " alpha"),                   # same body, no header
        _doc(3, BOILER + " completely different tiny text about ships and"
                " harbors sailing beyond the far horizon every morning"),
        _doc(4, BOILER + " another unique body of words describing careful"
                " meticulous gardening on sunny spring afternoons outside"),
    ]
    docs = spark.createDataFrame(rows)
    # without the stage: no exact dups (header differs), near-dup catches it
    _c0, s0 = curate(docs, quality_min=0.0, min_tokens=1, jaccard_threshold=0.9)
    assert s0["exact_dups_removed"] == 0
    # with the stage: header stripped from 1/3/4 -> doc 1 == doc 2 exactly
    c1, s1 = curate(docs, quality_min=0.0, min_tokens=1, jaccard_threshold=0.9,
                    boilerplate_min_doc_freq=3)
    assert s1["boilerplate_blocks_removed"] == 3
    assert s1["exact_dups_removed"] == 1
    ids = sorted(r.doc_id for r in c1.select("doc_id").collect())
    assert ids == [1, 3, 4]
    # the surviving text is the CLEANED text
    kept1 = c1.filter("doc_id = 1").select("text").collect()[0][0]
    assert not kept1.startswith("subscribe")


def test_curate_boilerplate_regates_emptied_docs(spark):
    """A doc that is 100% boilerplate empties after cleaning and falls to
    the min_tokens re-gate (counted, not silently dropped)."""
    rows = [
        _doc(1, BOILER),
        _doc(2, BOILER),
        _doc(3, BOILER),
        _doc(4, BASE + " alpha"),
    ]
    docs = spark.createDataFrame(rows)
    _c, s = curate(docs, quality_min=0.0, min_tokens=1, jaccard_threshold=0.9,
                   boilerplate_min_doc_freq=3)
    assert s["boilerplate_regated"] == 3
    assert s["output_rows"] == 1


CHAIN = (
    "every copy of this viral chain letter must be shared with ten"
    " friends immediately"
)  # 14 tokens >= span width 8; internal 8-grams are offset-independent


def test_curate_span_stage_unmasks_exact_dups(spark):
    """Two docs identical except for a shared chain-letter span at
    DIFFERENT offsets are not exact dups raw (and not block-aligned, so
    the boilerplate stage can't see them either); the span stage trims the
    repeated run wherever it sits, the min-id owner keeps its copy, and
    the exact fingerprint stage catches the now-equal survivors."""
    body2 = ("an unrelated essay concerning lighthouse keepers and their"
             " long quiet winters beside cold northern seas")
    rows = [
        _doc(1, CHAIN + " " + BASE + " alpha"),  # owner: keeps the chain
        _doc(2, body2 + " " + CHAIN),            # trimmed -> body2
        _doc(3, CHAIN + " " + body2),            # trimmed -> body2 == doc 2
    ]
    docs = spark.createDataFrame(rows)
    _c0, s0 = curate(docs, quality_min=0.0, min_tokens=1,
                     jaccard_threshold=0.9)
    assert s0["exact_dups_removed"] == 0
    c1, s1 = curate(docs, quality_min=0.0, min_tokens=1,
                    jaccard_threshold=0.9, span_dedup_min_doc_freq=3)
    assert s1["span_tokens_trimmed"] == 28  # 14 chain tokens x docs 2 and 3
    assert s1["exact_dups_removed"] == 1    # doc 3 == doc 2 after trimming
    ids = sorted(r.doc_id for r in c1.select("doc_id").collect())
    assert ids == [1, 2]
    kept = {r.doc_id: r.text for r in c1.select("doc_id", "text").collect()}
    assert CHAIN in kept[1]       # owner copy survives
    assert kept[2] == body2       # trimmed at the non-zero offset too


def test_curate_span_stage_drops_mostly_duplicated_docs(spark):
    """With --span-max-dup-fraction, docs that are mostly duplicated
    material are dropped whole (trimming would leave junk) and counted in
    span_regated; a doc trimmed to nothing falls to the min_tokens re-gate
    the same way."""
    rows = [
        _doc(1, CHAIN),                 # owner: fraction 0 -> kept
        _doc(2, CHAIN + " x"),          # 14/15 duplicated -> dropped whole
        _doc(3, CHAIN + " y z"),        # 14/16 duplicated -> dropped whole
        _doc(4, BASE + " alpha"),
    ]
    docs = spark.createDataFrame(rows)
    _c, s = curate(docs, quality_min=0.0, min_tokens=1,
                   jaccard_threshold=0.9, span_dedup_min_doc_freq=3,
                   span_max_dup_fraction=0.5)
    assert s["span_regated"] == 2
    assert s["output_rows"] == 2
    ids = sorted(r.doc_id for r in _c.select("doc_id").collect())
    assert ids == [1, 4]


def test_curate_mixture_stage(spark):
    """Temperature mixing as the final stage: a large budget keeps all
    strata (rates cap at 1); stats row present and consistent."""
    rows = [
        _doc(i, BASE + f" word{i} tail{i}", source=f"src{i % 2}")
        for i in range(1, 9)
    ]
    docs = spark.createDataFrame(rows)
    c, s = curate(docs, quality_min=0.0, min_tokens=1, jaccard_threshold=0.95,
                  mix_budget=10**9)
    assert s["mixture_removed"] == 0
    assert s["output_rows"] == c.count()
    # small budget removes some rows deterministically
    c2, s2 = curate(docs, quality_min=0.0, min_tokens=1, jaccard_threshold=0.95,
                    mix_budget=60)
    assert s2["mixture_removed"] > 0
    assert s2["output_rows"] == c2.count() == 8 - s2["mixture_removed"]


def test_curate_webtext_stages(spark):
    from jobs.curate_documents_job import curate

    rows = []
    for i in range(40):
        body = f"document number {i} with plenty of useful words to pass " \
               f"the quality gate easily here {i}"
        if i % 4 == 1:
            body = f"<html><body><p>{body}</p><script>x=1;</script></body></html>"
        if i % 10 == 3:
            body = body + " bad � byte"
        rows.append((i, body, "en", f"src{i % 3}", len(body)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    curated, stats = curate(
        docs, extract_html=True, encoding_gate=True, quality_min=0.0,
        min_tokens=3,
    )
    # the � rows (i % 10 == 3 -> 4 rows) are encoding-rejected
    assert stats["encoding_rejected"] == 4
    assert stats["schema_invalid"] == 0
    out = {r["doc_id"]: r["text"] for r in curated.collect()}
    # html rows were extracted: tags and script gone, text preserved
    assert out[1].startswith("document number 1 ")
    assert "<" not in out[1] and "script" not in out[1]
    # without the gates the damaged/markup rows sail through
    _, stats_off = curate(docs, quality_min=0.0, min_tokens=3)
    assert stats_off["encoding_rejected"] == 0
