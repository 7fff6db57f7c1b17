"""Incremental validation (operators/incremental.py).

The defining invariant: the incremental composition (carry prior
violations across the snapshot diff + fresh-validate only added/changed
rows) equals a full validation of the new snapshot, row for row. Pinned
here on planted mutations and edge cases; the contract queries
`incremental_validate_orders` / `incremental_totals_orders` pin the same
equality against a DuckDB full-replay oracle at sf0.01.
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.incremental import (
    incremental_totals,
    incremental_violations,
)
from jsonschema_spark.operators.validate import validate

SCHEMA = {
    "type": "object",
    "required": ["id", "v"],
    "properties": {
        "id": {"type": "integer", "minimum": 1},
        "v": {"type": "integer", "minimum": 0, "maximum": 100},
        "s": {"enum": ["a", "b"]},
    },
}

COLS = ["id", "v", "s"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long, s string")


@pytest.fixture(scope="module")
def snapshots(spark):
    old_rows = [(i, (i * 7) % 120, "a" if i % 3 else "c") for i in range(1, 201)]
    old = _df(spark, old_rows)
    # removed: %13 == 0; changed: %11 == 0 (v pushed out of range) and
    # %17 == 0 (s fixed from 'c' to 'b'); added: 500..520 with a mix of
    # passing and failing rows.
    new_rows = [
        (
            i,
            200 if i % 11 == 0 else v,
            "b" if i % 17 == 0 else s,
        )
        for (i, v, s) in old_rows
        if i % 13 != 0
    ] + [(i, i % 150, "a" if i % 2 else "z") for i in range(500, 521)]
    new = _df(spark, new_rows)
    return old, new


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_violations_equals_full(spark, snapshots):
    old, new = snapshots
    prior = validate(old, SCHEMA).violations(["id"])
    inc = incremental_violations(old, new, "id", SCHEMA, prior)
    full = validate(new, SCHEMA).violations(["id"])
    assert _sorted_rows(inc) == _sorted_rows(full)
    assert inc.count() > 0  # the mutation plan actually plants violations


def test_incremental_violations_composes_across_snapshots(spark, snapshots):
    """Output of one increment is a valid prior for the next."""
    old, mid = snapshots
    prior = validate(old, SCHEMA).violations(["id"])
    inc_mid = incremental_violations(old, mid, "id", SCHEMA, prior)
    newer = mid.where(F.col("id") % 5 != 0).union(
        mid.sparkSession.createDataFrame([(9001, -5, "a")], "id long, v long, s string")
    )
    inc2 = incremental_violations(mid, newer, "id", SCHEMA, inc_mid)
    full = validate(newer, SCHEMA).violations(["id"])
    assert _sorted_rows(inc2) == _sorted_rows(full)


def test_incremental_empty_delta_is_identity(spark, snapshots):
    old, _ = snapshots
    prior = validate(old, SCHEMA).violations(["id"])
    inc = incremental_violations(old, old, "id", SCHEMA, prior)
    assert _sorted_rows(inc) == _sorted_rows(prior)


def test_incremental_totals_equals_full(spark, snapshots):
    old, new = snapshots
    prior = validate(old, SCHEMA).totals()
    inc = incremental_totals(old, new, "id", SCHEMA, prior).collect()[0]
    full = validate(new, SCHEMA).totals().collect()[0]
    assert tuple(inc) == tuple(full)


def test_incremental_totals_empty_delta(spark, snapshots):
    old, _ = snapshots
    prior = validate(old, SCHEMA).totals()
    inc = incremental_totals(old, old, "id", SCHEMA, prior).collect()[0]
    assert tuple(inc) == tuple(prior.collect()[0])


def test_all_rows_removed(spark, snapshots):
    old, _ = snapshots
    empty = old.where(F.lit(False))
    prior_v = validate(old, SCHEMA).violations(["id"])
    assert incremental_violations(old, empty, "id", SCHEMA, prior_v).count() == 0
    prior_t = validate(old, SCHEMA).totals()
    row = incremental_totals(old, empty, "id", SCHEMA, prior_t).collect()[0]
    assert tuple(row) == (0, 0, 0, 0)
