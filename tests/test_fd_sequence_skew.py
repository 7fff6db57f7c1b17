"""Unit tests for session-I operators: functional dependencies, per-key
sequence checks, Wasserstein-1 binned drift, and skew/heavy-hitter
profiling."""

import datetime as dt

import pytest

from jsonschema_spark.operators import drift, stats
from jsonschema_spark.operators.fd import (
    fd_group_profile,
    fd_report,
    fd_violating_groups,
)
from jsonschema_spark.operators.sequence import sequence_profile, sequence_report


# ---------------------------------------------------------------------------
# functional dependencies
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fd_df(spark):
    rows = [
        # a -> b holds; a -> c violated for a=1 (c in {x,y}) and a=3 (NULL+z)
        (1, 10, "x"),
        (1, 10, "y"),
        (1, 10, "x"),
        (2, 20, "z"),
        (3, 30, None),
        (3, 30, "z"),
        (None, 99, "q"),  # NULL determinant: excluded
    ]
    return spark.createDataFrame(rows, "a int, b int, c string")


def test_fd_holds_and_violations(fd_df):
    rep = {r["fd"]: r for r in fd_report(
        fd_df, {"a_b": ("a", "b"), "a_c": ("a", "c")}
    ).collect()}
    assert rep["a_b"]["fd_holds"] is True
    assert rep["a_b"]["n_groups"] == 3
    assert rep["a_b"]["violating_groups"] == 0
    assert rep["a_b"]["max_distinct"] == 1
    assert rep["a_c"]["fd_holds"] is False
    assert rep["a_c"]["violating_groups"] == 2  # a=1 and a=3
    assert rep["a_c"]["violating_rows"] == 5  # 3 rows of a=1 + 2 of a=3
    assert rep["a_c"]["max_distinct"] == 2


def test_fd_null_dependent_is_a_value(fd_df):
    # a=3 has dependents {NULL, 'z'} -> 2 distinct values
    prof = {r["det"]: r for r in fd_group_profile(fd_df, {"f": ("a", "c")}).collect()}
    assert prof["3"]["n_distinct"] == 2


def test_fd_composite_determinant(spark):
    rows = [(1, "u", 5), (1, "u", 5), (1, "v", 6), (2, "u", 7), (2, "u", 8)]
    df = spark.createDataFrame(rows, "a int, b string, d int")
    rep = fd_report(df, {"ab_d": (("a", "b"), "d")}).collect()[0]
    assert rep["n_groups"] == 3
    assert rep["violating_groups"] == 1  # (2,u) -> {7,8}
    assert rep["violating_rows"] == 2


def test_fd_violating_groups_ordering(fd_df):
    top = fd_violating_groups(fd_df, {"a_c": ("a", "c")}, k=10).collect()
    assert [r["det"] for r in top] == ["1", "3"]  # both 2-distinct; n_rows 3 > 2
    assert [r["rank"] for r in top] == [1, 2]


def test_fd_one_scan_for_all_fds(fd_df):
    plan = fd_group_profile(
        fd_df, {"x": ("a", "b"), "y": ("a", "c"), "z": (("a", "b"), "c")}
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


# ---------------------------------------------------------------------------
# sequence checks
# ---------------------------------------------------------------------------


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def seq_df(spark):
    rows = [
        # key u: ids 1..4 arrive with a regression at id=3 (t goes back)
        ("u", 1, _ts(0)),
        ("u", 2, _ts(10)),
        ("u", 3, _ts(5)),  # regression in arrival order
        ("u", 4, _ts(100)),  # gap 90s after t=10 in time order
        # key v: clean, but duplicate timestamp
        ("v", 1, _ts(0)),
        ("v", 2, _ts(0)),  # dup ts
        ("v", 3, _ts(1)),
        # key w: single event + one NULL ts
        ("w", 1, _ts(0)),
        ("w", 2, None),
        # NULL key excluded
        (None, 1, _ts(0)),
    ]
    return spark.createDataFrame(rows, "k string, i int, t timestamp")


def test_sequence_profile(seq_df):
    prof = {r["k"]: r for r in sequence_profile(seq_df, "k", "t", "i").collect()}
    assert set(prof) == {"u", "v", "w"}
    u = prof["u"]
    assert u["n_events"] == 4 and u["regressions"] == 1 and u["dup_ts"] == 0
    assert u["max_gap_us"] == 90_000_000  # 10s -> 100s in time order
    assert u["span_us"] == 100_000_000
    v = prof["v"]
    assert v["regressions"] == 0 and v["dup_ts"] == 1
    assert v["max_gap_us"] == 1_000_000
    w = prof["w"]
    assert w["n_events"] == 2 and w["n_null_ts"] == 1
    assert w["max_gap_us"] is None and w["regressions"] == 0 and w["dup_ts"] == 0


def test_sequence_report_sla(seq_df):
    rep = sequence_report(seq_df, "k", "t", "i", max_gap_s=60.0).collect()[0]
    assert rep["n_keys"] == 3
    assert rep["keys_with_regressions"] == 1 and rep["total_regressions"] == 1
    assert rep["keys_with_dup_ts"] == 1 and rep["total_dup_ts"] == 1
    assert rep["keys_over_gap_sla"] == 1  # u's 90s gap
    assert rep["max_gap_us"] == 90_000_000
    assert rep["ok"] is False


def test_sequence_clean_stream_ok(spark):
    rows = [("a", i, _ts(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, i int, t timestamp")
    rep = sequence_report(df, "k", "t", "i", max_gap_s=10.0).collect()[0]
    assert rep["ok"] is True and rep["total_regressions"] == 0


def test_sequence_single_exchange(seq_df):
    """Both orderings share one hash partitioning on the key: the plan
    must contain exactly ONE exchange below the final rollup aggregate's."""
    plan = (
        sequence_profile(seq_df, "k", "t", "i")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange for the window partitioning + one for the final groupBy
    assert plan.count("Exchange hashpartitioning") <= 2


# ---------------------------------------------------------------------------
# wasserstein-1 binned
# ---------------------------------------------------------------------------


def test_wasserstein_identical_is_zero(spark):
    df = spark.range(1000).select((F_col_id() % 100).cast("double").alias("v"))
    row = drift.wasserstein_binned(df, df, "v", 0.0, 100.0, 100).collect()[0]
    assert row["w1_dist"] == 0.0
    assert row["n_cur"] == row["n_base"] == 1000


def F_col_id():
    from pyspark.sql import functions as F

    return F.col("id")


def test_wasserstein_known_shift(spark):
    from pyspark.sql import functions as F

    # uniform on [0,100) vs the same shifted +10: W1 = 10 exactly
    base = spark.range(10000).select((F.col("id") % 100).cast("double").alias("v"))
    cur = base.select((F.col("v") + 10.0).alias("v"))
    row = drift.wasserstein_binned(cur, base, "v", 0.0, 120.0, 120).collect()[0]
    assert abs(row["w1_dist"] - 10.0) < 0.2  # grid resolution 1.0


def test_wasserstein_units_scale_with_step(spark):
    from pyspark.sql import functions as F

    base = spark.range(2000).select((F.col("id") % 50).cast("double").alias("v"))
    cur = base.select((F.col("v") + 5.0).alias("v"))
    a = drift.wasserstein_binned(cur, base, "v", 0.0, 60.0, 60).collect()[0]["w1_dist"]
    b = drift.wasserstein_binned(cur, base, "v", 0.0, 60.0, 120).collect()[0]["w1_dist"]
    assert abs(a - 5.0) < 0.5 and abs(b - 5.0) < 0.5


# ---------------------------------------------------------------------------
# skew / heavy hitters
# ---------------------------------------------------------------------------


def test_skew_report(spark):
    rows = [("hot",)] * 80 + [("a",)] * 10 + [("b",)] * 10 + [(None,)] * 5
    df = spark.createDataFrame(rows, "k string")
    rep = stats.skew_report(df, "k", salt_threshold_ppm=500_000).collect()[0]
    assert rep["total_rows"] == 100  # NULLs excluded
    assert rep["n_distinct"] == 3
    assert rep["max_cnt"] == 80
    assert rep["max_share_ppm"] == 800_000
    assert rep["salt_recommended"] is True
    rep2 = stats.skew_report(df, "k", salt_threshold_ppm=900_000).collect()[0]
    assert rep2["salt_recommended"] is False


def test_heavy_hitters_topk_and_ties(spark):
    rows = [("x",)] * 5 + [("y",)] * 3 + [("z",)] * 3 + [("w",)] * 1
    df = spark.createDataFrame(rows, "k string")
    hh = stats.heavy_hitters(df, "k", k=3).collect()
    assert [(r["value"], r["cnt"], r["rank"]) for r in hh] == [
        ("x", 5, 1),
        ("y", 3, 2),  # tie with z broken by value asc
        ("z", 3, 3),
    ]
    assert hh[0]["share_ppm"] == 5 * 1_000_000 // 12


# ---------------------------------------------------------------------------
# referential chain
# ---------------------------------------------------------------------------


def test_check_chain_isolates_broken_edge(spark):
    from jsonschema_spark.operators.referential import check_chain

    fact = spark.createDataFrame([(1,), (2,), (3,)], "fk int")
    dim_ok = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    dim_broken = spark.createDataFrame([(1,), (2,)], "k int")
    rep = {r["edge"]: r for r in check_chain([
        ("good", fact, "fk", dim_ok, "k"),
        ("broken", fact, "fk", dim_broken, "k"),
    ]).collect()}
    assert rep["good"]["ok"] is True and rep["good"]["orphan_count"] == 0
    assert rep["broken"]["ok"] is False and rep["broken"]["orphan_count"] == 1


# ---------------------------------------------------------------------------
# correlation pairs
# ---------------------------------------------------------------------------


def test_correlation_pairs(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0, -1.0), (2.0, 4.0, 5.0, -2.0),
         (3.0, 6.0, 5.0, -3.0), (4.0, None, 5.0, -4.0)],
        "x double, y double, c double, z double",
    )
    out = {(r.col_x, r.col_y): r for r in
           stats.correlation_pairs(df, ["x", "y", "c", "z"]).collect()}
    assert out[("x", "y")].corr == 1.0 and out[("x", "y")].n == 3  # NULL pair excluded
    assert out[("x", "z")].corr == -1.0 and out[("x", "z")].n == 4
    assert out[("x", "c")].corr is None  # constant column declines
    assert out[("y", "z")].corr == -1.0
    assert len(out) == 6


def test_correlation_partition_invariance(spark):
    """The decimal-sum design makes the result identical under any
    partitioning (the property F.corr lacks)."""
    import random

    rnd = random.Random(7)
    rows = [(rnd.uniform(0, 100), rnd.uniform(0, 100)) for _ in range(500)]
    df1 = spark.createDataFrame(rows, "x double, y double").coalesce(1)
    df2 = spark.createDataFrame(rows, "x double, y double").repartition(16)
    r1 = stats.correlation_pairs(df1, ["x", "y"]).collect()[0].corr
    r2 = stats.correlation_pairs(df2, ["x", "y"]).collect()[0].corr
    assert r1 == r2


# ---------------------------------------------------------------------------
# distinctness / entropy / moments
# ---------------------------------------------------------------------------


def test_distinctness_profile(spark):
    import math

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("c", None)], "s string, v int"
    )
    out = {r.column: r for r in
           stats.distinctness_profile(df, ["s", "v"]).collect()}
    s = out["s"]
    assert s.n_rows == 4 and s.n_distinct == 3
    assert s.distinctness == 0.75
    assert s.unique_value_ratio == round(2 / 3, 6)
    # H = ln(4) - (2 ln 2 + 1 ln 1 + 1 ln 1)/4
    expected = math.log(4) - (2 * math.log(2)) / 4
    assert abs(s.entropy - expected) < 1e-5
    v = out["v"]
    assert v.n_rows == 3 and v.n_distinct == 2  # NULL excluded


def test_entropy_extremes(spark):
    import math

    const = spark.createDataFrame([("k",)] * 10, "s string")
    assert stats.distinctness_profile(const, ["s"]).collect()[0].entropy == 0.0
    uniq = spark.createDataFrame([(str(i),) for i in range(8)], "s string")
    r = stats.distinctness_profile(uniq, ["s"]).collect()[0]
    assert abs(r.entropy - math.log(8)) < 1e-5
    assert r.unique_value_ratio == 1.0


def test_moments_exact(spark):
    df = spark.createDataFrame(
        [(2.0, 10.0), (4.0, 10.0), (6.0, None), (8.0, 10.0)], "x double, y double"
    )
    out = {r.column: r for r in stats.moments(df, ["x", "y"]).collect()}
    assert out["x"].mean == 5.0 and out["x"].n == 4
    assert abs(out["x"].stddev - 2.236068) < 1e-6  # sqrt(5)
    assert out["y"].mean == 10.0 and out["y"].stddev == 0.0 and out["y"].n == 3


def test_moments_partition_invariance(spark):
    import random

    rnd = random.Random(11)
    rows = [(rnd.uniform(-50, 50),) for _ in range(400)]
    a = spark.createDataFrame(rows, "x double").coalesce(1)
    b = spark.createDataFrame(rows, "x double").repartition(16)
    ra = stats.moments(a, ["x"]).collect()[0]
    rb = stats.moments(b, ["x"]).collect()[0]
    assert (ra.mean, ra.stddev) == (rb.mean, rb.stddev)


def test_mutual_information(spark):
    import math

    # y = f(x): deterministic -> MI = H(X)
    det = spark.createDataFrame(
        [("a", "1")] * 2 + [("b", "2")] * 2, "x string, y string"
    )
    r = stats.mutual_information(det, "x", "y").collect()[0]
    assert abs(r.mi - math.log(2)) < 1e-5
    assert (r.col_x, r.col_y, r.n) == ("x", "y", 4)

    # independent -> MI = 0 (uniform product corpus)
    rows = [(a, b) for a in "ab" for b in "cd" for _ in range(5)]
    ind = spark.createDataFrame(rows, "x string, y string")
    assert stats.mutual_information(ind, "x", "y").collect()[0].mi == 0.0

    # NULL on either side excluded
    n = spark.createDataFrame(
        [("a", "1"), ("a", None), (None, "2")], "x string, y string"
    )
    assert stats.mutual_information(n, "x", "y").collect()[0].n == 1


def test_fd_g3_error(fd_df):
    """g3 = minimum fraction of rows to delete for the FD to hold: a_c has
    groups {1: x,x,y (keep 2), 2: z (keep 1), 3: NULL,z (keep 1)} ->
    (6-4)/6."""
    rep = {r["fd"]: r for r in fd_report(
        fd_df, {"a_b": ("a", "b"), "a_c": ("a", "c")}
    ).collect()}
    assert rep["a_b"]["g3_error"] == 0.0
    assert rep["a_c"]["g3_error"] == 0.333333
