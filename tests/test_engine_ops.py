"""Engine capability operators (SURVEY §2C): stats, uniqueness, referential,
drift — verified against DuckDB on the driver-provided sf0.001 tables.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators import drift, referential, stats, uniqueness
from jsonschema_spark.sources.tables import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "nation", "region", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def test_column_stats_match_duckdb(spark, duck):
    df = load_table(spark, SF_DIR, "orders")
    got = {
        r.column: r
        for r in stats.column_stats(df, ["o_custkey", "o_totalprice"], exact_distinct=True).collect()
    }
    want = duck.execute(
        """
        SELECT count(*) AS rows,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nulls_ck,
               min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
               count(DISTINCT o_custkey) AS dist_ck,
               min(o_totalprice) AS min_tp, max(o_totalprice) AS max_tp,
               count(DISTINCT o_totalprice) AS dist_tp
        FROM orders
        """
    ).fetchone()
    ck = got["o_custkey"]
    assert ck.row_count == want[0]
    assert ck.null_count == want[1]
    assert int(ck.min) == want[2] and int(ck.max) == want[3]
    assert ck.distinct_count == want[4]
    tp = got["o_totalprice"]
    assert float(tp.min) == pytest.approx(want[5])
    assert float(tp.max) == pytest.approx(want[6])
    assert tp.distinct_count == want[7]


def test_uniqueness_matches_duckdb(spark, duck):
    df = load_table(spark, SF_DIR, "lineitem")
    got = uniqueness.uniqueness_summary(df, ["l_orderkey", "l_linenumber"]).collect()[0]
    want = duck.execute(
        """
        SELECT sum(cnt), count(*), sum(CASE WHEN cnt>1 THEN 1 ELSE 0 END)
        FROM (SELECT count(*) cnt FROM lineitem GROUP BY l_orderkey, l_linenumber)
        """
    ).fetchone()
    assert got.total_rows == want[0]
    assert got.distinct_keys == want[1]
    assert got.duplicate_keys == want[2]

    # salted and plain paths must agree
    plain = uniqueness.duplicate_keys(df, "l_orderkey").orderBy("l_orderkey").collect()
    salted = uniqueness.duplicate_keys(df, "l_orderkey", salted=True).orderBy("l_orderkey").collect()
    assert plain == salted


def test_referential_broadcast_and_shuffle_agree(spark, duck):
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    b = referential.check(li, orders, "l_orderkey", "o_orderkey", strategy="broadcast").collect()[0]
    s = referential.check(li, orders, "l_orderkey", "o_orderkey", strategy="shuffle").collect()[0]
    want = duck.execute(
        """
        SELECT count(*) FROM lineitem l
        WHERE l.l_orderkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        """
    ).fetchone()[0]
    assert b.orphan_count == want == s.orphan_count


def test_referential_detects_orphans(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    # remove some orders to create orphans
    orders = load_table(spark, SF_DIR, "orders").filter(F.col("o_orderkey") % 10 != 0)
    got = referential.check(li, orders, "l_orderkey", "o_orderkey").collect()[0]
    assert got.orphan_count > 0 and not got.ok


def test_chi_square_no_drift_on_identical(spark):
    ev = load_table(spark, SF_DIR, "events")
    res = drift.chi_square_test(ev, ev, "event_type")
    assert res.statistic == pytest.approx(0.0)
    assert not res.drifted


def test_chi_square_detects_shift(spark):
    ev = load_table(spark, SF_DIR, "events")
    skewed = ev.filter((F.col("event_type") != "click") | (F.xxhash64("event_id") % 4 == 0))
    res = drift.chi_square_test(skewed, ev, "event_type")
    assert res.drifted and res.statistic > 0


def test_chi2_sf_reference_values():
    # classic table values: P(chi2_1 > 3.841) ~ 0.05, P(chi2_4 > 9.488) ~ 0.05
    assert drift._chi2_sf(3.841, 1) == pytest.approx(0.05, abs=1e-3)
    assert drift._chi2_sf(9.488, 4) == pytest.approx(0.05, abs=1e-3)
    assert drift._chi2_sf(0.0, 3) == 1.0


def test_ks_no_drift_on_identical(spark):
    ev = load_table(spark, SF_DIR, "events")
    res = drift.ks_test(ev, ev, "value")
    assert res.statistic == pytest.approx(0.0)
    assert not res.drifted


def test_ks_detects_shift(spark):
    ev = load_table(spark, SF_DIR, "events")
    shifted = ev.withColumn("value", F.col("value") * 1.35 + 2.0)
    res = drift.ks_test(shifted, ev, "value")
    assert res.drifted and res.statistic > 0.05


def test_ks_exact_matches_duckdb(spark, duck):
    ev = load_table(spark, SF_DIR, "events")
    shifted = ev.withColumn("value", F.col("value") * 1.2)
    got = drift.ks_statistic_exact(shifted, ev, "value").collect()[0]
    want = duck.execute(
        """
        WITH pooled AS (
          SELECT value * 1.2 AS v, 1 AS is_cur FROM events
          UNION ALL
          SELECT value AS v, 0 AS is_cur FROM events
        ), e AS (
          SELECT sum(is_cur) OVER w AS c_cur,
                 sum(1 - is_cur) OVER w AS c_base
          FROM pooled
          WINDOW w AS (ORDER BY v RANGE UNBOUNDED PRECEDING)
        )
        SELECT round(max(abs(c_cur / (SELECT sum(is_cur) FROM pooled)
                     - c_base / (SELECT sum(1 - is_cur) FROM pooled))), 6) FROM e
        """
    ).fetchone()[0]
    assert got.ks_stat == pytest.approx(want, abs=1e-9)


def test_ks_approx_close_to_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    shifted = ev.withColumn("value", F.col("value") * 1.35 + 2.0)
    exact = drift.ks_statistic_exact(shifted, ev, "value").collect()[0].ks_stat
    approx = drift.ks_statistic_approx(shifted, ev, "value").collect()[0].ks_stat
    assert abs(exact - approx) < 0.08


def test_ks_binned_close_to_exact_and_bounded(spark):
    """The scale-default binned KS understates exact KS by at most the
    largest inter-cut probability mass; at 5-unit resolution over [0, 900]
    that bound is tight on this data."""
    ev = load_table(spark, SF_DIR, "events")
    shifted = ev.withColumn("value", F.col("value") * 1.35 + 2.0)
    exact = drift.ks_statistic_exact(shifted, ev, "value").collect()[0].ks_stat
    row = drift.ks_statistic_binned(shifted, ev, "value", 0.0, 900.0, 180).collect()[0]
    assert row.ks_stat <= exact + 1e-9  # grid evaluation can only understate
    assert abs(exact - row.ks_stat) < 0.03
    assert row.n_cur > 0 and row.n_base == row.n_cur


def test_ks_binned_plan_aggregates_before_any_window(spark):
    """The registered drift default must never funnel ROWS through one
    reducer: each side reduces to a <= n_bins histogram via a narrow
    partial+final aggregate; the one window/sort in the plan runs over
    that tiny histogram only (i.e. strictly above the aggregates — the
    scan subtree below the last aggregate must be window/sort-free)."""
    ev = load_table(spark, SF_DIR, "events")
    cur = ev.filter(F.col("event_id") % 2 == 1)
    base = ev.filter(F.col("event_id") % 2 == 0)
    plan = (
        drift.ks_statistic_binned(cur, base, "value", 0.0, 600.0, 120)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" in plan and "FileScan" in plan
    # executed plans print root-first: everything after the LAST (deepest)
    # aggregate is the scan side — no Window/Sort may appear there
    scan_side = plan[plan.rindex("HashAggregate"):]
    assert "FileScan" in scan_side
    assert "Window" not in scan_side and "Sort " not in scan_side


def test_psi_numeric_binned(spark):
    """Numeric PSI: ~zero on identical distributions, large under a shift;
    one narrow groupBy(bin) per side (same plan shape as binned KS)."""
    ev = load_table(spark, SF_DIR, "events")
    same = drift.psi_table_numeric(ev, ev, "value", 0.0, 600.0, 60).collect()
    assert abs(sum(r.contribution for r in same)) < 1e-9
    shifted = ev.withColumn("value", F.col("value") * 1.5 + 40.0)
    moved = drift.psi_table_numeric(shifted, ev, "value", 0.0, 600.0, 60).collect()
    assert sum(r.contribution for r in moved) > 0.1


def test_drift_matrix_identical_is_stable(spark):
    """Per-slice drift matrix: identical distributions → every slice stable,
    psi == chi2 == 0, no new categories."""
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "segment", (F.col("user_id") % 4).cast("long")
    )
    rows = drift.drift_matrix(ev, ev, ["segment"], "event_type").collect()
    assert len(rows) == 4
    for r in rows:
        assert r.verdict == "stable"
        assert r.psi == pytest.approx(0.0, abs=1e-5)
        assert r.chi2 == pytest.approx(0.0, abs=1e-5)
        assert r.new_categories == 0
        assert r.n_cur == r.n_base > 0


def test_drift_matrix_flags_only_the_shifted_slice(spark):
    """Plant drift in ONE slice (drop most 'click' events in segment 0);
    the matrix must flag that slice and leave the others stable."""
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "segment", (F.col("user_id") % 4).cast("long")
    )
    cur = ev.filter(
        (F.col("segment") != 0)
        | (F.col("event_type") != "click")
        | (F.xxhash64("event_id") % 8 == 0)
    )
    by_seg = {
        r.segment: r for r in drift.drift_matrix(cur, ev, ["segment"], "event_type").collect()
    }
    assert by_seg[0].psi > 0.05 and by_seg[0].chi2 > 0
    for s in (1, 2, 3):
        assert by_seg[s].verdict == "stable"
        assert by_seg[s].psi == pytest.approx(0.0, abs=1e-5)


def test_drift_matrix_single_group_matches_psi_table(spark):
    """A one-slice matrix reduces to the ungrouped PSI (the per-category
    contributions are rounded to the same 1e-6 grid before summation)."""
    ev = load_table(spark, SF_DIR, "events")
    skewed = ev.filter(
        (F.col("event_type") != "click") | (F.xxhash64("event_id") % 4 == 0)
    )
    m = drift.drift_matrix(
        skewed.withColumn("g", F.lit(1)), ev.withColumn("g", F.lit(1)), ["g"], "event_type"
    ).collect()
    assert len(m) == 1
    flat = drift.psi_table(skewed, ev, "event_type").collect()
    want = sum(r.contribution for r in flat)
    assert m[0].psi == pytest.approx(want, abs=len(flat) * 2e-6)
    assert m[0].n_categories == len(flat)


def test_drift_matrix_counts_new_categories(spark):
    """A category present only in the current slice is reported in
    new_categories (and PSI'd via the eps floor), never an infinite chi2."""
    ev = load_table(spark, SF_DIR, "events")
    cur = ev.withColumn(
        "event_type",
        F.when(F.xxhash64("event_id") % 50 == 0, F.lit("brand_new")).otherwise(
            F.col("event_type")
        ),
    ).withColumn("g", F.lit("all"))
    base = ev.withColumn("g", F.lit("all"))
    row = drift.drift_matrix(cur, base, ["g"], "event_type").collect()[0]
    assert row.new_categories == 1
    assert row.chi2 < float("inf") and row.psi > 0


def test_drift_matrix_numeric_detects_per_slice_shift(spark):
    """Numeric (binned) matrix: scale one slice's values, only it drifts."""
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "segment", (F.col("user_id") % 2).cast("long")
    )
    cur = ev.withColumn(
        "value",
        F.when(F.col("segment") == 1, F.col("value") * 1.5 + 40.0).otherwise(
            F.col("value")
        ),
    )
    by_seg = {
        r.segment: r
        for r in drift.drift_matrix_numeric(
            cur, ev, ["segment"], "value", 0.0, 600.0, 60
        ).collect()
    }
    assert by_seg[0].psi == pytest.approx(0.0, abs=1e-5)
    assert by_seg[1].psi > 0.1
    assert by_seg[1].verdict in ("moderate", "major")


def test_drift_report_flags_only_the_shifted_column(spark):
    """Whole-table report: shift `value`, leave event_type alone → exactly
    the value row drifts."""
    ev = load_table(spark, SF_DIR, "events")
    cur = ev.withColumn("value", F.col("value") * 1.5 + 40.0)
    rows = {
        r["column"]: r
        for r in drift.drift_report(
            cur, ev, {"value": (0.0, 600.0, 60)}, ["event_type"]
        ).collect()
    }
    assert set(rows) == {"value", "event_type"}
    assert rows["value"].psi > 0.1
    assert rows["event_type"].verdict == "stable"
    assert rows["event_type"].psi == pytest.approx(0.0, abs=1e-5)


def test_drift_report_scans_each_side_once(spark):
    """The stacked-histogram report reads each input ONCE regardless of how
    many columns are requested (a per-column loop would scan k times), keeps
    the scan pruned to the requested columns, and stays JVM-side."""
    ev = load_table(spark, SF_DIR, "events")
    cur = ev.filter(F.col("event_id") % 2 == 1)
    base = ev.filter(F.col("event_id") % 2 == 0)
    df = drift.drift_report(
        cur, base, {"value": (0.0, 600.0, 60)}, ["event_type"]
    )
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert p.count("FileScan parquet") == 2
    assert "BatchEvalPython" not in p
    assert "props" not in p and "user_id" not in p  # column pruning held


def test_psi_zero_on_identical(spark):
    ev = load_table(spark, SF_DIR, "events")
    assert drift.psi(ev, ev, "event_type") == pytest.approx(0.0, abs=1e-9)


def test_psi_detects_shift(spark):
    ev = load_table(spark, SF_DIR, "events")
    skewed = ev.filter((F.col("event_type") != "click") | (F.xxhash64("event_id") % 4 == 0))
    v = drift.psi(skewed, ev, "event_type")
    assert v > 0.01  # dropping 3/4 of one category is a visible shift


def test_psi_one_sided_category_finite(spark):
    ev = load_table(spark, SF_DIR, "events")
    no_click = ev.filter(F.col("event_type") != "click")
    v = drift.psi(no_click, ev, "event_type")
    assert 0 < v < 100  # eps smoothing keeps the vanished category finite


def test_repair_defaults_and_projection(spark):
    """Schema-driven repair: scalar `default`s fill NULLs (through $ref),
    composite defaults are skipped, closed-world projection drops
    undeclared columns, DataFrame schema/types unchanged."""
    from jsonschema_spark.operators.repair import apply_defaults, repair

    doc = {
        "$defs": {"d": {"type": "string", "default": "filled"}},
        "properties": {
            "a": {"$ref": "#/$defs/d"},
            "b": {"type": "integer", "default": 7},
            "c": {"type": "array", "default": [1, 2]},  # composite: skipped
        },
    }
    df = spark.createDataFrame(
        [(None, None, None), ("x", 1, [9])],
        "a string, b int, c array<int>",
    )
    fixed = apply_defaults(df, doc)
    # names and types unchanged (coalesce-with-literal may tighten nullability)
    assert [(f.name, f.dataType) for f in fixed.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    rows = sorted(fixed.collect(), key=lambda r: (r.b is None, r.b or 0))
    assert (rows[0].a, rows[0].b, rows[0].c) == ("x", 1, [9])     # untouched
    assert (rows[1].a, rows[1].b, rows[1].c) == ("filled", 7, None)

    out = repair(df.withColumn("extra", F.lit(1)), doc, drop_undeclared=True)
    assert out.columns == ["a", "b", "c"]


# ---------------------------------------------------------------------------
# partition_health — MAD-outlier verdict over per-group violation rates
# ---------------------------------------------------------------------------

_PH_SCHEMA = {"type": "object", "properties": {"v": {"maximum": 10}}}


def _ph_frame(spark, sick_group_rate: float):
    from jsonschema_spark.operators.validate import validate

    rows = []
    for g in range(10):
        for i in range(100):
            # group g9 violates at sick_group_rate; others at 2-5% with
            # group-to-group variation (identical rates would make MAD 0)
            bad_every = int(1 / sick_group_rate) if g == 9 else 20 + 7 * g
            rows.append((f"g{g}", 99 if i % bad_every == 0 else 1))
    df = spark.createDataFrame(rows, "grp string, v int")
    return validate(df, _PH_SCHEMA)


def test_partition_health_flags_sick_group(spark):
    out = _ph_frame(spark, 0.5).partition_health(["grp"], exact=True).collect()
    flags = {r["grp"]: r["anomalous"] for r in out}
    assert flags["g9"] is True
    assert sum(flags.values()) == 1          # only the planted group
    r9 = next(r for r in out if r["grp"] == "g9")
    assert r9["fail_rate"] == 0.5 and r9["modified_z"] > 3.5


def test_partition_health_mad_zero_declines(spark):
    from jsonschema_spark.operators.validate import validate

    # every group identical -> MAD 0 -> no flags, z NULL
    rows = [(f"g{g}", 1) for g in range(6) for _ in range(10)]
    df = spark.createDataFrame(rows, "grp string, v int")
    out = validate(df, _PH_SCHEMA).partition_health(["grp"], exact=True).collect()
    assert all(r["anomalous"] is False for r in out)
    assert all(r["modified_z"] is None for r in out)


def test_partition_health_salted_parity(spark):
    res = _ph_frame(spark, 0.25)
    plain = sorted(map(tuple, res.partition_health(["grp"], exact=True).collect()))
    salted = sorted(
        map(tuple, res.partition_health(["grp"], salted=True, exact=True).collect())
    )
    assert plain == salted


def test_repair_coerce_types(spark):
    """Schema-driven string coercion: try_cast to the schema-implied type,
    uncastable-but-present values accounted in _coerce_failed (never
    silently nulled); non-string columns and multi-type schemas untouched."""
    from jsonschema_spark.operators.repair import coerce_types

    df = spark.createDataFrame(
        [
            (1, "42", "1.5", "true", "keep"),
            (2, "3.0", "oops", "false", "keep"),   # 3.0 is not an integer lexeme
            (3, None, "2e3", "maybe", "keep"),
            (4, " 7 ", "8", "1", "keep"),
        ],
        "pk long, a string, b string, c string, d string",
    )
    schema = {
        "type": "object",
        "properties": {
            "pk": {"type": "integer"},           # already bigint: untouched
            "a": {"type": "integer"},
            "b": {"type": "number"},
            "c": {"type": "boolean"},
            "d": {"type": ["string", "null"]},   # multi-type: untouched
        },
    }
    out = {r.pk: r for r in coerce_types(df, schema).collect()}
    assert out[1].a == 42 and out[1].b == 1.5 and out[1].c is True
    assert out[1]._coerce_failed == []
    # strict integer lexeme: "3.0" fails loudly, matching the validator's
    # integer semantics; "oops" fails number
    assert out[2].a is None and out[2]._coerce_failed == ["a", "b"]
    assert out[2].c is False
    # NULL source is not a failure (absent-property semantics)
    assert out[3].a is None and "a" not in out[3]._coerce_failed
    assert out[3].b == 2000.0
    assert out[3]._coerce_failed == ["c"]
    assert out[4].a == 7 and out[4].c is True and out[4]._coerce_failed == []
    # dtypes actually changed; untouched columns keep theirs
    dt = dict(coerce_types(df, schema).dtypes)
    assert dt["a"] == "bigint" and dt["b"] == "double" and dt["c"] == "boolean"
    assert dt["d"] == "string" and dt["pk"] == "bigint"


def test_summary_rollup_levels_and_plan(spark):
    from jsonschema_spark.operators.validate import validate
    from __spark_entry__ import ORDERS_JSON_SCHEMA

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    r = validate(orders, ORDERS_JSON_SCHEMA)
    roll = r.summary_rollup(["o_orderstatus", "o_orderpriority"])
    rows = roll.collect()
    by_depth = {}
    for row in rows:
        by_depth.setdefault(row["depth"], []).append(row)
    assert set(by_depth) == {0, 1, 2}
    total = by_depth[0][0]
    assert total["o_orderstatus"] is None and total["o_orderpriority"] is None
    # every level must sum to the same totals
    for d in (1, 2):
        assert sum(x["rows"] for x in by_depth[d]) == total["rows"]
        assert sum(x["failed"] for x in by_depth[d]) == total["failed"]
    # depth-1 rows have a concrete status and a rolled-up priority
    assert all(x["o_orderstatus"] is not None and x["o_orderpriority"] is None
               for x in by_depth[1])
    # ONE aggregate pass: the rollup compiles to an Expand feeding one
    # aggregate, never one job per granularity (AQE prints the plan twice
    # — final + initial — so assert presence, not count)
    plan = roll._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_ks_exact_guard_trips_above_ceiling(spark):
    """The exact-KS audit path must refuse to run its global no-partition
    window above the documented row-count ceiling (VERDICT r2 item 3)."""
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(drift.ExactAuditScaleError, match="ks_statistic_exact"):
        drift.ks_statistic_exact(ev, ev, "value", max_rows=10)
    # at/below the ceiling it runs normally
    small = ev.limit(5)
    row = drift.ks_statistic_exact(small, small, "value", max_rows=10).collect()[0]
    assert row.ks_stat == 0.0
