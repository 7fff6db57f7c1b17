"""Differential fuzz for the session-N operators: random inputs, every
report field re-derived by an independent pure-Python replay.

Covers join_cardinality_report / join_hot_keys (exact sizing arithmetic,
NULL-key accounting, top-k tie-breaks), duration_buckets /
padding_waste_report (bucket arithmetic and waste ratios), and
column_suggestions (every rule decision). The webtext regex layer has
its own differential tests in test_webtext.py.
"""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.chunk import (
    duration_buckets,
    padding_waste_report,
)
from jsonschema_spark.operators.joincard import (
    join_cardinality_report,
    join_hot_keys,
)
from jsonschema_spark.operators.suggest import (
    PATTERN_LIBRARY,
    column_suggestions,
)


@pytest.mark.parametrize("seed", [3, 17, 41])
def test_join_cardinality_report_fuzz(spark, seed):
    rng = random.Random(seed)
    lk = [rng.choice([None, *range(rng.randint(3, 25))])
          for _ in range(rng.randint(0, 300))]
    rk = [rng.choice([None, *range(rng.randint(3, 25))])
          for _ in range(rng.randint(0, 300))]
    left = spark.createDataFrame([(k,) for k in lk] or [(None,)], "a int")
    right = spark.createDataFrame([(k,) for k in rk] or [(None,)], "b int")
    if not lk:
        left = left.where("a is not null")
    if not rk:
        right = right.where("b is not null")
    r = join_cardinality_report(left, right, "a", "b").collect()[0]
    lc = Counter(k for k in lk if k is not None)
    rc = Counter(k for k in rk if k is not None)
    match = set(lc) & set(rc)
    est = sum(lc[k] * rc[k] for k in match)
    assert r["left_rows"] == sum(lc.values())
    assert r["left_null_keys"] == sum(1 for k in lk if k is None)
    assert r["right_rows"] == sum(rc.values())
    assert r["right_null_keys"] == sum(1 for k in rk if k is None)
    assert r["left_keys"] == len(lc) and r["right_keys"] == len(rc)
    assert r["matching_keys"] == len(match)
    assert r["est_inner_rows"] == est
    assert r["max_fanout"] == (max((lc[k] * rc[k] for k in match), default=0))
    denom = max(sum(lc.values()), sum(rc.values()), 1)
    assert r["explosion_ratio"] == pytest.approx(est / denom)


@pytest.mark.parametrize("seed", [5, 29])
def test_join_hot_keys_fuzz(spark, seed):
    rng = random.Random(seed)
    lk = [rng.randint(0, 12) for _ in range(200)]
    rk = [rng.randint(0, 12) for _ in range(200)]
    left = spark.createDataFrame([(k,) for k in lk], "a int")
    right = spark.createDataFrame([(k,) for k in rk], "b int")
    k = 5
    got = [(r["key"], r["left_cnt"], r["right_cnt"], r["est_rows"], r["rank"])
           for r in join_hot_keys(left, right, "a", "b", k=k).collect()]
    lc, rc = Counter(lk), Counter(rk)
    pairs = [(key, lc[key], rc[key], lc[key] * rc[key])
             for key in set(lc) & set(rc)]
    pairs.sort(key=lambda p: (-p[3], p[0]))
    want = [(key, l, r_, e, i + 1)
            for i, (key, l, r_, e) in enumerate(pairs[:k])]
    assert got == want


@pytest.mark.parametrize("seed", [7, 23])
def test_duration_buckets_fuzz(spark, seed):
    rng = random.Random(seed)
    durs = [rng.choice([None, -3, *[rng.randint(0, 3000) for _ in range(5)]])
            for _ in range(400)]
    df = spark.createDataFrame([(d,) for d in durs], "dur_ms int")
    bucket_ms = rng.choice([100, 250, 777])
    got = {r["bucket"]: r for r in
           duration_buckets(df, "dur_ms", bucket_ms).collect()}
    byb = {}
    for d in durs:
        if d is None or d < 0:
            continue
        byb.setdefault(d // bucket_ms, []).append(d)
    assert set(got) == set(byb)
    for b, vals in byb.items():
        r = got[b]
        assert r["n_clips"] == len(vals)
        assert r["total_ms"] == sum(vals)
        assert r["max_ms"] == max(vals)
        assert r["padded_ms"] == len(vals) * max(vals)
    rep = padding_waste_report(df, "dur_ms", bucket_ms).collect()[0]
    all_vals = [d for d in durs if d is not None and d >= 0]
    if all_vals:
        assert rep["global_waste_ratio"] == round(
            1.0 - sum(all_vals) / (len(all_vals) * max(all_vals)), 9
        )
        bucketed = sum(len(v) * max(v) for v in byb.values())
        assert rep["bucketed_padded_ms"] == bucketed
        assert rep["bucketed_waste_ratio"] <= rep["global_waste_ratio"]


@pytest.mark.parametrize("seed", [11, 37])
def test_column_suggestions_fuzz(spark, seed):
    import re

    rng = random.Random(seed)
    n = rng.randint(5, 120)
    # the wide-positive arm drives n_distinct past the enum bound and
    # spans >= 2 decades, so the mean_between AND benford rules both fire
    a = [rng.choice([None, rng.randint(0, 8), rng.randint(1, 50000)])
         for _ in range(n)]
    pool = ["a", "b", "c", "D4", "ee_ff", "2026-01-02", "42"]
    b = [rng.choice([None, rng.choice(pool)]) for _ in range(n)]
    df = spark.createDataFrame(list(zip(a, b)), "a int, b string")
    got = {
        (r["column"], r["check_type"]): (r["param_lo"], r["param_hi"],
                                         r["param_str"])
        for r in column_suggestions(df, ["a", "b"]).collect()
    }

    def replay(col, vals, numeric):
        out = {}
        nn = [v for v in vals if v is not None]
        if vals and len(nn) == len(vals):
            out[(col, "not_null")] = (None, None, None)
        if nn and len(set(nn)) == len(nn):
            out[(col, "unique")] = (None, None, None)
        nd = len(set(nn))
        if 2 <= nd <= 12:
            out[(col, "completeness_categories")] = (float(nd), None, None)
            out[(col, "values_in_set")] = (float(nd), None, None)
        if numeric and nd > 12:
            out[(col, "mean_between")] = (float(min(nn)), float(max(nn)), None)
            if min(nn) > 0 and max(nn) >= 100 * min(nn):
                out[(col, "benford")] = (None, None, None)
        if not numeric and nn:
            for _, pat in PATTERN_LIBRARY:
                if all(re.search(pat, str(v)) for v in nn):
                    out[(col, "matches_regex")] = (None, None, pat)
                    break
        return out

    want = {("*", "row_count"): (float(n // 2), None, None)} if n else {}
    want.update(replay("a", a, True))
    want.update(replay("b", b, False))
    assert got == want
