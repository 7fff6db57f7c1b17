"""Referential-integrity checks (north rule).

Strategy selection is explicit because it is THE scale decision:
- ``broadcast`` — dimension fits in executor memory: broadcast-hash
  LEFT ANTI join, zero shuffle of the fact table.
- ``shuffle``  — both sides large: sort-merge LEFT ANTI join; AQE may
  still convert or split skew at runtime.
The orphan count == 0 is the pass criterion; ``orphans`` returns the rows
for reporting, ``check`` the rollup.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphans(
    fact: DataFrame,
    dim: DataFrame,
    fact_keys: Sequence[str] | str,
    dim_keys: Sequence[str] | str | None = None,
    strategy: str = "broadcast",
) -> DataFrame:
    """Fact rows whose key has no match in dim (NULL keys are not orphans —
    absent-property semantics, consistent with the validator)."""
    fact_keys = [fact_keys] if isinstance(fact_keys, str) else list(fact_keys)
    dim_keys = fact_keys if dim_keys is None else (
        [dim_keys] if isinstance(dim_keys, str) else list(dim_keys)
    )
    cond = None
    for fk, dk in zip(fact_keys, dim_keys):
        c = fact[fk] == dim[dk]
        cond = c if cond is None else (cond & c)
    right = F.broadcast(dim) if strategy == "broadcast" else dim
    non_null = fact
    for fk in fact_keys:
        non_null = non_null.filter(F.col(fk).isNotNull())
    return non_null.join(right, cond, "left_anti")


def check_chain(
    edges: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Snowflake-schema referential report: one verdict row per FK edge.

    ``edges`` = (name, fact_df, fact_key, dim_df, dim_key) tuples — e.g.
    the full TPC-H-ish chain lineitem→supplier→nation→region plus
    orders→customer→nation. Each edge is an independent anti-join
    aggregate (dims broadcast — they are small by definition in a
    snowflake; pass pre-filtered frames for planted audits); the report
    is a union of one-row aggregates, so edge verdicts compute in
    parallel and the result is O(edges) rows.
    """
    reports = []
    for name, fact, fk, dim, dk in edges:
        o = orphans(fact, dim, fk, dk)
        reports.append(
            o.agg(F.count(F.lit(1)).alias("orphan_count")).select(
                F.lit(name).alias("edge"),
                "orphan_count",
                (F.col("orphan_count") == 0).alias("ok"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def check(
    fact: DataFrame,
    dim: DataFrame,
    fact_keys: Sequence[str] | str,
    dim_keys: Sequence[str] | str | None = None,
    strategy: str = "broadcast",
) -> DataFrame:
    """One-row rollup: (orphan_count, ok)."""
    o = orphans(fact, dim, fact_keys, dim_keys, strategy)
    return o.agg(
        F.count(F.lit(1)).alias("orphan_count"),
        (F.count(F.lit(1)) == 0).alias("ok"),
    )
