"""Incremental validation: re-validate only what changed between snapshots.

The composition the 10^12-row story actually needs day to day: a full
validation pass over yesterday's snapshot already exists (its violation
rows and totals are checkpointed); today's snapshot differs by a delta
that is orders of magnitude smaller than the table. ``snapshot_diff``
(operators/diff.py) names that delta; the compiled keyword algebra is
per-row (a row's violations depend on nothing but the row), so

    violations(new) == violations(old)  minus  rows whose key was
    removed or changed         plus  fresh validation of added+changed

holds EXACTLY — not approximately — whenever the key is unique per row.
Both functions here compute the right-hand side, so the expensive
constraint evaluation touches only O(|delta|) rows instead of O(|table|).

Scale shape (10^12 rows, 0.1% daily delta):
- ONE key join inside ``snapshot_diff`` (sides pruned to key + compared
  columns before the shuffle; AQE picks sort-merge vs broadcast vs
  skew-split).
- The delta key set is typically tiny -> AQE broadcasts it for the
  semi-join that carves the revalidation slice out of ``new`` and the
  anti-join that drops stale rows from the prior violation set; at
  poisoned-delta scale both degrade gracefully to shuffle joins (no
  forced ``F.broadcast`` anywhere — the curate-funnel lesson).
- Constraint evaluation (the codegen'd violations array) runs ONLY on
  the delta slices; unchanged rows are never re-scanned by the
  validator.

Contract: ``keys`` must uniquely identify rows in both snapshots (the
same contract as ``snapshot_diff``); NULL-keyed rows are dropped by the
diff and therefore never revalidated — validate them in the full pass.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.diff import snapshot_diff
from jsonschema_spark.operators.validate import validate
from jsonschema_spark.plans.compile import CompileOptions

Keys = Union[str, Sequence[str]]


def _key_list(keys: Keys) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


def incremental_violations(
    old: DataFrame,
    new: DataFrame,
    keys: Keys,
    schema,
    prior_violations: DataFrame,
    options: Optional[CompileOptions] = None,
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Violation rows for ``new``, computed from the prior snapshot's
    violation rows plus fresh validation of ONLY the added+changed slice.

    ``prior_violations`` is ``validate(old, schema).violations(keys)``
    (or this function's own output from the previous increment — the
    composition is associative across snapshots). Result is row-for-row
    identical to ``validate(new, schema).violations(keys)``; the pytest
    suite and the DuckDB contract oracle both pin that equality.
    """
    ks = _key_list(keys)
    delta = snapshot_diff(old, new, ks, compare_cols=compare_cols)
    # Any change kind invalidates the prior rows for that key: removed and
    # changed keys had prior violations that no longer apply; added keys
    # have none (the anti-join is a no-op for them, which is correct).
    stale_keys = delta.select(*ks)
    carried = prior_violations.join(stale_keys, on=ks, how="left_anti")
    fresh_keys = delta.where(F.col("change") != "removed").select(*ks)
    fresh_slice = new.join(fresh_keys, on=ks, how="left_semi")
    fresh = validate(fresh_slice, schema, options).violations(ks)
    return carried.unionByName(fresh)


def incremental_totals(
    old: DataFrame,
    new: DataFrame,
    keys: Keys,
    schema,
    prior_totals: DataFrame,
    options: Optional[CompileOptions] = None,
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """One-row (rows, passed, failed, violation_count) totals for ``new``
    without re-validating unchanged rows.

    ``new`` partitions exactly into (old minus stale) ∪ fresh, where
    stale = removed+changed keys of ``old`` and fresh = added+changed
    keys of ``new``; totals are additive over that partition, so

        totals(new) = prior_totals - totals(old ⋉ stale) + totals(new ⋉ fresh)

    with both correction terms validated over delta-sized slices only.
    ``prior_totals`` is ``validate(old, schema).totals()`` (or the
    previous increment's output).
    """
    ks = _key_list(keys)
    delta = snapshot_diff(old, new, ks, compare_cols=compare_cols)
    stale_keys = delta.where(F.col("change") != "added").select(*ks)
    fresh_keys = delta.where(F.col("change") != "removed").select(*ks)
    stale_totals = validate(
        old.join(stale_keys, on=ks, how="left_semi"), schema, options
    ).totals()
    fresh_totals = validate(
        new.join(fresh_keys, on=ks, how="left_semi"), schema, options
    ).totals()

    # sum() over an empty slice is NULL (count is 0) — an empty delta must
    # contribute zero, not poison the arithmetic.
    fields = ["rows", "passed", "failed", "violation_count"]
    z = lambda c, a: F.coalesce(F.col(c), F.lit(0)).cast("long").alias(a)  # noqa: E731
    p = prior_totals.select(*[z(c, f"p_{c}") for c in fields])
    s = stale_totals.select(*[z(c, f"s_{c}") for c in fields])
    f_ = fresh_totals.select(*[z(c, f"f_{c}") for c in fields])
    return (
        p.crossJoin(s)
        .crossJoin(f_)
        .select(
            *[
                (F.col(f"p_{c}") - F.col(f"s_{c}") + F.col(f"f_{c}")).alias(c)
                for c in fields
            ]
        )
    )
