"""Cross-document repeated-span dedup (operators/spandedup.py).

Differential strategy: every Spark result is checked against an
independent pure-Python replay of the same semantics (tokenize, positional
n-grams, doc-freq threshold, keep-first ownership, interval-merge span
algebra, trimmed rebuild) — the Lee-et-al-style operator has no reference
implementation in /root/reference (the reference has no corpus operators).
"""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from jsonschema_spark.operators.spandedup import (
    repeated_span_report,
    trim_repeated_spans,
)

N = 4  # small n keeps hand corpora readable


def _replay(docs: dict[int, str], n: int, mdf: int, keep_first: bool):
    toks = {
        i: re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        for i, t in docs.items()
    }
    holders: dict[str, set[int]] = {}
    for i, ts in toks.items():
        for p in range(1, len(ts) - n + 2):
            holders.setdefault(" ".join(ts[p - 1 : p - 1 + n]), set()).add(i)
    hot = {g for g, s in holders.items() if len(s) >= mdf}
    owner = {g: min(holders[g]) for g in hot}
    out = {}
    for i, ts in toks.items():
        ps = []
        for p in range(1, len(ts) - n + 2):
            g = " ".join(ts[p - 1 : p - 1 + n])
            if g in hot and (not keep_first or owner[g] != i):
                ps.append(p)
        covered = {j for p in ps for j in range(p, p + n)}
        spans, prev = 0, None
        for p in ps:
            if prev is None or p - prev > n:
                spans += 1
            prev = p
        dup = sum(
            n if nxt is None else min(n, nxt - p)
            for p, nxt in zip(ps, ps[1:] + [None])
        )
        assert dup == len(covered)  # span algebra identity
        clean = " ".join(ts[j - 1] for j in range(1, len(ts) + 1) if j not in covered)
        out[i] = {
            "total_tokens": len(ts),
            "dup_positions": len(ps),
            "n_spans": spans,
            "dup_tokens": dup,
            "clean_text": clean,
        }
    return out


def _check(spark, docs: dict[int, str], n=N, mdf=2, keep_first=False):
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in repeated_span_report(
            df, n=n, min_doc_freq=mdf, keep_first=keep_first
        ).collect()
    }
    want = _replay(docs, n, mdf, keep_first)
    assert set(got) == set(want)
    for i, w in want.items():
        g = got[i]
        for key, val in w.items():
            assert g[key] == val, (i, key, g[key], val)
        assert abs(g["dup_fraction"] - w["dup_tokens"] / max(w["total_tokens"], 1)) < 1e-12
    return got


CHORUS = "never gonna give you up never gonna let you down"


def test_shared_chorus_at_different_offsets(spark):
    docs = {
        1: f"{CHORUS} unique tail one alpha beta",
        2: f"left padding words here {CHORUS} and more two",
        3: f"an entirely different document with no repeats at all gamma",
    }
    got = _check(spark, docs, mdf=2)
    assert got[1]["n_spans"] == 1 and got[1]["dup_tokens"] == 10
    assert got[2]["n_spans"] == 1 and got[2]["dup_tokens"] == 10
    assert got[3]["n_spans"] == 0 and got[3]["clean_text"] == docs[3]
    # trimmed docs no longer contain the chorus
    assert CHORUS not in got[1]["clean_text"]
    assert got[2]["clean_text"] == "left padding words here and more two"


def test_keep_first_owner_retains_copy(spark):
    docs = {
        5: f"{CHORUS} owner doc keeps it",
        9: f"{CHORUS} second doc loses it",
        11: f"prefix {CHORUS} third doc loses it",
    }
    got = _check(spark, docs, mdf=2, keep_first=True)
    assert got[5]["dup_tokens"] == 0
    assert CHORUS in got[5]["clean_text"]
    assert got[9]["dup_tokens"] == 10 and CHORUS not in got[9]["clean_text"]
    assert got[11]["dup_tokens"] == 10


def test_adjacent_repeats_merge_into_one_span(spark):
    # the chorus twice back-to-back: hot positions chain across the seam
    # (the seam grams are unique to doc 1, but gaps of exactly n merge)
    docs = {
        1: f"{CHORUS} {CHORUS} coda",
        2: f"{CHORUS} elsewhere",
        3: f"{CHORUS} third holder",
    }
    got = _check(spark, docs, mdf=3)
    # both chorus copies in doc 1 are covered: the hot runs [1..7] and
    # [11..17] meet exactly (gap 11-7 == n) so they merge into ONE span
    # covering [1,20] — all 20 tokens duplicated, zero seam survivors
    assert got[1]["n_spans"] == 1
    assert got[1]["dup_tokens"] == 20
    assert got[1]["clean_text"] == "coda"


def test_short_and_empty_docs(spark):
    docs = {1: "one two three", 2: "one two three", 3: "", 4: "   "}
    got = _check(spark, docs, n=4, mdf=2)
    for i in (1, 2, 3, 4):
        assert got[i]["dup_tokens"] == 0  # all shorter than n


def test_trim_wrapper_drops_mostly_duplicated_docs(spark):
    docs = {
        1: f"{CHORUS}",
        2: f"{CHORUS} x",
        3: f"{CHORUS} plus a long genuinely novel tail " + " ".join(
            f"w{i}" for i in range(30)
        ),
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    out = trim_repeated_spans(df, n=N, min_doc_freq=3, keep_first=False,
                              max_dup_fraction=0.5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {3}  # docs 1-2 are >50% duplicated -> dropped
    assert CHORUS not in rows[3]["text"]


def test_differential_fuzz_random_corpora(spark):
    rng = random.Random(20260819)
    vocab = [f"t{i}" for i in range(12)]
    for trial in range(4):
        docs = {}
        shared = " ".join(rng.choices(vocab, k=rng.randint(N, 8)))
        for i in range(rng.randint(4, 9)):
            words = rng.choices(vocab, k=rng.randint(0, 14))
            if rng.random() < 0.6:
                at = rng.randint(0, len(words))
                words = words[:at] + shared.split() + words[at:]
            docs[i] = " ".join(words)
        _check(spark, docs, n=N, mdf=2, keep_first=bool(trial % 2))
