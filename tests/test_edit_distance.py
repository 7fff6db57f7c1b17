"""PassJoin edit-distance pairs (dedup.edit_distance_pairs)."""

import random

from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, k):
    out = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            if ia == ib:
                continue
            if abs(len(ta) - len(tb)) <= k and _lev(ta, tb) <= k:
                out.add((min(ia, ib), max(ia, ib)))
    return out


def _spark_pairs(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = edit_distance_pairs(df, k=k, id_col="doc_id").collect()
    dists = {(r["id_a"], r["id_b"]): r["edit_distance"] for r in got}
    return set(dists), dists


def test_planted_variants(spark):
    rows = [
        ("a1", "the quick brown fox"),
        ("a2", "the quick brown fax"),      # 1 substitution
        ("a3", "the quick brown foxx"),     # 1 insertion
        ("a4", "he quick brown fox"),       # 1 deletion
        ("b1", "completely different words here"),
        ("c1", "the quick crown fax"),      # 2 edits from a1 (b->c, o->a)
    ]
    got, dists = _spark_pairs(spark, rows, k=1)
    assert got == _brute(rows, 1)
    assert {("a1", "a2"), ("a1", "a3"), ("a1", "a4")} <= got
    assert ("a1", "b1") not in got and ("a1", "c1") not in got
    assert dists[("a1", "a2")] == 1

    got2, dists2 = _spark_pairs(spark, rows, k=2)
    assert got2 == _brute(rows, 2)
    assert dists2[("a1", "c1")] == 2


def test_random_corpus_matches_bruteforce(spark):
    rng = random.Random(7)
    alpha = "abc"
    rows = []
    for i in range(120):
        n = rng.randint(0, 8)
        rows.append((f"r{i:03d}", "".join(rng.choice(alpha) for _ in range(n))))
    for k in (1, 2):
        got, dists = _spark_pairs(spark, rows, k)
        want = _brute(rows, k)
        assert got == want
        # distances themselves exact
        texts = dict(rows)
        for (a, b), d in dists.items():
            assert d == _lev(texts[a], texts[b])


def test_short_strings_and_nulls(spark):
    rows = [("s1", ""), ("s2", "a"), ("s3", "b"), ("s4", None), ("s5", "xyzw")]
    got, dists = _spark_pairs(spark, rows, k=1)
    # empty/1-char rows pairwise within ed<=1; null dropped; xyzw isolated
    assert got == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert dists[("s2", "s3")] == 1


def test_duplicate_ids_no_self_pairs(spark):
    rows = [("d1", "same text"), ("d1", "same text"), ("d2", "same texts")]
    got, _ = _spark_pairs(spark, rows, k=1)
    assert got == {("d1", "d2")}


def test_plan_no_python_no_window(spark):
    df = spark.createDataFrame([("a", "hello world")], "doc_id string, text string")
    plan = (
        edit_distance_pairs(df, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    assert "Window" not in plan


def test_max_key_freq_is_lower_bound(spark):
    # hot segment capped out: the pair relying on it disappears, none appear
    rows = [(f"h{i}", "aaaa bbbb") for i in range(5)] + [("x1", "zzzz qqqq")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    capped = edit_distance_pairs(df, k=1, max_key_freq=2).collect()
    full = edit_distance_pairs(df, k=1).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} <= {
        (r["id_a"], r["id_b"]) for r in full
    }
    assert len(full) == 10  # C(5,2) identical-text pairs at ed 0
