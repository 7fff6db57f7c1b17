"""Benford first-significant-digit screen (operators/stats.benford_report
+ the `benford` suite check).

The digit comes from the value's STRING form — sign, leading zeros and
the decimal point are skipped — so the extraction is identical in Spark
and DuckDB regardless of how each engine formats doubles (the first
significant digit is invariant across plain/scientific rendering of the
same IEEE value). Zero and NULL carry no significant digit and are
excluded.
"""

import math

from jsonschema_spark.operators.stats import benford_report
from jsonschema_spark.operators.suite import run_suite


def test_benford_digit_extraction_and_terms(spark):
    # digits: 1, 1, 2, 3, (0 excluded), (NULL excluded), 4, 1, 4
    t = spark.createDataFrame(
        [(1.0,), (19.5,), (0.21,), (-30.0,), (0.0,), (None,), (4e3,),
         (123.0,), (0.0041,)],
        "v double",
    )
    rows = {r["digit"]: r for r in benford_report(t, "v").collect()}
    assert sorted(rows) == list(range(1, 10))  # all 9 digits present
    counts = {d: rows[d]["n"] for d in rows}
    assert counts == {1: 3, 2: 1, 3: 1, 4: 2, 5: 0, 6: 0, 7: 0, 8: 0, 9: 0}
    n_total = 7
    for d in range(1, 10):
        e = math.log10(1.0 + 1.0 / d)
        obs = counts[d] / n_total
        assert abs(rows[d]["observed_frac"] - round(obs, 6)) < 1e-12
        assert abs(rows[d]["expected_frac"] - round(e, 6)) < 1e-12
        assert abs(rows[d]["abs_dev"] - round(abs(obs - e), 6)) < 1e-12
        chi = (counts[d] - n_total * e) ** 2 / (n_total * e)
        assert abs(rows[d]["chi2_term"] - round(chi, 6)) < 1e-6


def test_benford_suite_check_pass_and_fail(spark):
    # Benford-conforming counts (1000 rows at the rounded expected
    # fractions) vs a uniform-digit feed (the fabricated-data signature).
    conforming = []
    for d in range(1, 10):
        conforming += [(float(d),)] * round(1000 * math.log10(1 + 1 / d))
    uniform = [(float(d),) for d in range(1, 10) for _ in range(100)]
    tables = {
        "good": spark.createDataFrame(conforming, "v double"),
        "bad": spark.createDataFrame(uniform, "v double"),
    }
    rep = run_suite(
        tables,
        {"checks": [
            {"type": "benford", "name": "good_v", "table": "good",
             "column": "v"},
            {"type": "benford", "name": "bad_v", "table": "bad",
             "column": "v", "max_mad": 0.015},
        ]},
    )
    rows = {r["check_name"]: r.asDict() for r in rep.collect()}
    assert rows["good_v"]["status"] == "pass"
    assert rows["good_v"]["metric"] < 0.006  # Nigrini close conformity
    assert rows["bad_v"]["status"] == "fail"
    assert rows["bad_v"]["metric"] > 0.015


def test_benford_suggestion_and_drafted_suite_self_passes(spark):
    """column_suggestions proposes a benford check for strictly-positive
    high-cardinality numerics spanning >= 2 decades, and the suite
    as_suite_config drafts from it PASSES on the data it was drafted
    from (the measured-MAD ceiling stance every suggested audio check
    already follows)."""
    from jsonschema_spark.operators.suggest import (
        as_suite_config,
        column_suggestions,
    )

    rng_vals = []
    for d in range(1, 10):  # roughly Benford counts across 3 decades
        for k in range(round(120 * math.log10(1 + 1 / d))):
            rng_vals.append((float(d) * 10 ** (k % 3) + k,))
    t = spark.createDataFrame(rng_vals, "v double")
    sugg = column_suggestions(t, ["v"])
    kinds = {r["check_type"] for r in sugg.collect()}
    assert "benford" in kinds
    cfg = as_suite_config(t, sugg, table="t")
    bch = [c for c in cfg["checks"] if c["type"] == "benford"]
    assert bch and bch[0]["column"] == "v"
    rep = run_suite({"t": t}, cfg)
    statuses = {r["check_name"]: r["status"] for r in rep.collect()}
    assert statuses["v_benford"] == "pass"
    # narrow-range numerics (one decade) must NOT suggest benford
    u = spark.createDataFrame(
        [(float(v),) for v in range(50, 99)], "v double"
    )
    kinds_u = {r["check_type"] for r in column_suggestions(u, ["v"]).collect()}
    assert "benford" not in kinds_u


def test_benford_empty_column_fails_loudly(spark):
    t = spark.createDataFrame([(0.0,), (None,)], "v double")
    rep = run_suite(
        {"t": t},
        {"checks": [{"type": "benford", "name": "b", "table": "t",
                     "column": "v"}]},
    )
    row = rep.collect()[0]
    assert row["status"] == "fail" and row["metric"] is None
