"""Differential fuzz for session-I operators: random small frames vs
independent pure-Python replays (the same strategy test_fuzz_eval.py uses
for the keyword algebra). Deterministic seeds — no flaky randomness."""

import math
import random
from collections import Counter, defaultdict

import pytest

from jsonschema_spark.operators import drift, stats
from jsonschema_spark.operators.fd import fd_report
from jsonschema_spark.operators.sequence import sequence_profile


def _rnd(seed):
    return random.Random(seed)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fd_report_vs_bruteforce(spark, seed):
    rnd = _rnd(seed)
    rows = [
        (rnd.choice([None, *range(6)]), rnd.choice(["p", "q", "r", None]))
        for _ in range(rnd.randint(30, 80))
    ]
    df = spark.createDataFrame(rows, "a int, c string")
    got = fd_report(df, {"f": ("a", "c")}).collect()[0]

    groups = defaultdict(list)
    for a, c in rows:
        if a is not None:
            groups[a].append(c)
    n_groups = len(groups)
    viol = {a for a, deps in groups.items() if len(set(deps)) > 1}
    viol_rows = sum(len(groups[a]) for a in viol)
    max_distinct = max(len(set(d)) for d in groups.values())
    assert got["n_groups"] == n_groups
    assert got["violating_groups"] == len(viol)
    assert got["violating_rows"] == viol_rows
    assert got["max_distinct"] == max_distinct
    assert got["fd_holds"] == (len(viol) == 0)


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_sequence_profile_vs_replay(spark, seed):
    import datetime as dt

    rnd = _rnd(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for k in ["a", "b", "c"]:
        for i in range(rnd.randint(2, 12)):
            t = (
                None
                if rnd.random() < 0.1
                else base + dt.timedelta(seconds=rnd.randint(0, 1000))
            )
            rows.append((k, i, t))
    df = spark.createDataFrame(rows, "k string, i int, t timestamp")
    got = {r.k: r for r in sequence_profile(df, "k", "t", "i").collect()}

    per_key = defaultdict(list)
    for k, i, t in rows:
        us = None if t is None else int((t - base).total_seconds() * 1e6)
        per_key[k].append((i, us))
    for k, evs in per_key.items():
        g = got[k]
        assert g.n_events == len(evs)
        assert g.n_null_ts == sum(1 for _, us in evs if us is None)
        # arrival order (i, t nulls-first): regressions vs immediate pred
        arrival = sorted(evs, key=lambda e: (e[0], -1 if e[1] is None else 0, e[1] or 0))
        reg = sum(
            1
            for p, c in zip(arrival, arrival[1:])
            if p[1] is not None and c[1] is not None and c[1] < p[1]
        )
        assert g.regressions == reg, k
        nn = sorted(us for _, us in evs if us is not None)
        dup = sum(1 for p, c in zip(nn, nn[1:]) if p == c)
        assert g.dup_ts == dup, k
        gaps = [c - p for p, c in zip(nn, nn[1:]) if c > p]
        assert g.max_gap_us == (max(gaps) if gaps else None), k
        assert g.span_us == ((nn[-1] - nn[0]) if nn else None), k


@pytest.mark.parametrize("seed", [7, 8])
def test_wasserstein_vs_exact_on_grid(spark, seed):
    """On integer-valued data with a bin per integer, binned W1 equals the
    exact earth-mover distance computed from sorted samples of equal size."""
    rnd = _rnd(seed)
    n = 500
    cur_v = [float(rnd.randint(0, 49)) for _ in range(n)]
    base_v = [float(min(49, max(0, rnd.randint(0, 49) + 3))) for _ in range(n)]
    cur = spark.createDataFrame([(v,) for v in cur_v], "v double")
    base = spark.createDataFrame([(v,) for v in base_v], "v double")
    got = drift.wasserstein_binned(cur, base, "v", 0.0, 50.0, 50).collect()[0]
    exact = sum(abs(a - b) for a, b in zip(sorted(cur_v), sorted(base_v))) / n
    assert abs(got["w1_dist"] - exact) < 1e-4


@pytest.mark.parametrize("seed", [9, 10])
def test_heavy_hitters_vs_counter(spark, seed):
    rnd = _rnd(seed)
    rows = [(rnd.choice("abcdefgh"),) for _ in range(300)]
    df = spark.createDataFrame(rows, "k string")
    got = [(r.value, r.cnt) for r in stats.heavy_hitters(df, "k", k=4).collect()]
    cnt = Counter(r[0] for r in rows)
    expected = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert got == expected


@pytest.mark.parametrize("seed", [11, 12])
def test_moments_and_corr_vs_python(spark, seed):
    rnd = _rnd(seed)
    xs = [rnd.uniform(-10, 10) for _ in range(200)]
    ys = [2.5 * x + rnd.uniform(-1, 1) for x in xs]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    m = {r.column: r for r in stats.moments(df, ["x", "y"]).collect()}
    mean_x = sum(xs) / len(xs)
    var_x = sum((v - mean_x) ** 2 for v in xs) / len(xs)
    assert abs(m["x"].mean - mean_x) < 1e-6
    assert abs(m["x"].stddev - math.sqrt(var_x)) < 1e-5
    c = stats.correlation_pairs(df, ["x", "y"]).collect()[0]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    r = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(c.corr - r) < 1e-5


@pytest.mark.parametrize("seed", [13, 14])
def test_entropy_and_mi_vs_python(spark, seed):
    rnd = _rnd(seed)
    rows = [
        (rnd.choice("abc"), rnd.choice("xy"))
        for _ in range(rnd.randint(50, 150))
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    prof = {r.column: r for r in
            stats.distinctness_profile(df, ["a", "b"]).collect()}
    n = len(rows)
    ca = Counter(r[0] for r in rows)
    h = math.log(n) - sum(c * math.log(c) for c in ca.values()) / n
    assert abs(prof["a"].entropy - h) < 1e-4

    mi_row = stats.mutual_information(df, "a", "b").collect()[0]
    cj = Counter(rows)
    cb = Counter(r[1] for r in rows)
    mi = sum(
        cxy / n * math.log(cxy * n / (ca[a] * cb[b]))
        for (a, b), cxy in cj.items()
    )
    assert abs(mi_row.mi - mi) < 1e-4
