"""Snapshot diff: key-based change detection between two table versions.

The incremental-validation primitive the checkpoint/resume story needs on
the DATA side (operators/checkpoint.py covers the work-tracking side):
given two snapshots of the same logical table (two Iceberg snapshot reads,
yesterday's copy vs today's), classify every key as added / removed /
changed / unchanged and name the columns that changed. Downstream a
pipeline validates only the added+changed slice instead of the full
10^12 rows, and drift checks compare like against like.

Scale design (10^12 rows):
- ONE join on the key, strategy chosen by AQE (sort-merge at scale,
  broadcast when one snapshot slice is small; skew-split at runtime).
  Both sides are pruned to key + compared columns BEFORE the join, so the
  shuffle carries only what the comparison reads.
- Per-column comparison is null-safe equality (``<=>``) compiled into the
  join's projection — whole-stage codegen, zero Python, no windows, no
  driver round-trips.
- ``changed_cols`` is built with ``concat_ws`` over per-column
  ``when(... , name)`` branches (codegen), not interpreted HOF lambdas.
- ``snapshot_diff_summary`` / ``column_change_counts`` reduce the diff to
  O(change kinds) / O(columns) rows with narrow hash aggregates.

NULL semantics: a NULL key row cannot be matched and is dropped from both
sides (same contract as operators/referential.py); for compared columns,
NULL -> value and value -> NULL count as changed, NULL -> NULL as equal
(null-safe equality).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Keys = Union[str, Sequence[str]]


def _key_list(keys: Keys) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


def _resolve_compare_cols(
    old: DataFrame, new: DataFrame, keys: list[str], compare_cols: Optional[Sequence[str]]
) -> list[str]:
    if compare_cols is not None:
        cols = list(compare_cols)
        for c in cols:
            if c not in old.columns or c not in new.columns:
                raise ValueError(f"snapshot_diff: compare column {c!r} missing from a side")
        return cols
    # deterministic default: shared non-key columns in the OLD side's order
    new_set = set(new.columns)
    return [c for c in old.columns if c in new_set and c not in keys]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Keys,
    compare_cols: Optional[Sequence[str]] = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Per-key change rows between two snapshots.

    Returns (key..., change, changed_cols, n_changed) where ``change`` is
    'added' (key only in ``new``), 'removed' (only in ``old``) or
    'changed' (present in both, at least one compared column differs under
    null-safe equality); ``changed_cols`` is the comma-joined list of
    differing columns in ``compare_cols`` order (empty string for
    added/removed — the row has no counterpart to compare against).
    ``include_unchanged=True`` additionally emits 'unchanged' rows (for
    summaries; the default output is the actionable slice).
    """
    ks = _key_list(keys)
    cols = _resolve_compare_cols(old, new, ks, compare_cols)

    def pruned(df: DataFrame, side: str) -> DataFrame:
        d = df
        for k in ks:
            d = d.where(F.col(k).isNotNull())
        return d.select(
            *[F.col(k).alias(f"{side}_{k}") for k in ks],
            *[F.col(c).alias(f"{side}_{c}") for c in cols],
        )

    o = pruned(old, "o")
    n = pruned(new, "n")
    cond = None
    for k in ks:
        eq = F.col(f"o_{k}") == F.col(f"n_{k}")
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")

    in_old = F.col(f"o_{ks[0]}").isNotNull()
    in_new = F.col(f"n_{ks[0]}").isNotNull()
    col_changed = [~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}")) for c in cols]
    n_changed = None
    for cc in col_changed:
        term = cc.cast("int")
        n_changed = term if n_changed is None else (n_changed + term)
    changed_cols = F.concat_ws(
        ",", *[F.when(cc, F.lit(c)) for cc, c in zip(col_changed, cols)]
    )

    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(n_changed > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    matched = in_old & in_new
    out = joined.select(
        *[F.coalesce(F.col(f"n_{k}"), F.col(f"o_{k}")).alias(k) for k in ks],
        change.alias("change"),
        F.when(matched, changed_cols).otherwise(F.lit("")).alias("changed_cols"),
        F.when(matched, n_changed).otherwise(F.lit(0)).alias("n_changed"),
    )
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: Keys,
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """O(change kinds) rollup: (change, n) including 'unchanged'."""
    d = snapshot_diff(old, new, keys, compare_cols, include_unchanged=True)
    return d.groupBy("change").agg(F.count(F.lit(1)).alias("n"))


def column_change_counts(
    old: DataFrame,
    new: DataFrame,
    keys: Keys,
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per-column changed-row counts over keys present in BOTH snapshots.

    Returns (column, n_changed) — one row per compared column that changed
    at least once. Reuses the diff plan: the changed_cols string is split
    back to names and counted with one narrow groupBy (the alternative —
    one conditional sum per column — is a wide aggregate that falls out of
    whole-stage codegen past ~100 columns; see CLAUDE.md).
    """
    d = snapshot_diff(old, new, keys, compare_cols).where(F.col("change") == "changed")
    return (
        d.select(F.explode(F.split("changed_cols", ",")).alias("column"))
        .where(F.col("column") != "")
        .groupBy("column")
        .agg(F.count(F.lit(1)).alias("n_changed"))
    )
