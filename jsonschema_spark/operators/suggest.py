"""Constraint suggestion: profile a table once, emit the check suite a
human would write (the Deequ ConstraintSuggestion face of the engine).

``column_suggestions`` computes per-column facts in TWO passes total —
one wide aggregate (row/null counts, numeric min/max) and one stacked
distinct pass (all columns through a single groupBy(column, value), the
distinctness_profile idiom; shuffle bounded by total distinct values)
— then derives suggestion rows with deterministic rules:

  not_null                 zero NULLs observed
  unique                   every non-NULL value distinct
  completeness_categories  2..category_max distinct values (an enum)
  mean_between [min, max]  numeric with real spread (> category_max)

``as_suite_config`` turns those rows into a runnable operators/suite
config (collecting the <= category_max expected values for enum columns
— bounded driver traffic, same stance as Deequ). The suggested suite is
PASSING BY CONSTRUCTION on the profiled table; its value is catching the
next batch that drifts. Rules are exact integer/comparison arithmetic,
so a DuckDB oracle replays every suggestion decision.

Reference parity note: the reference engine validates documents against
a HAND-WRITTEN schema; this operator closes the loop by drafting the
table-level contract from data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

DEFAULT_CATEGORY_MAX = 12


def _is_numeric(df: DataFrame, col: str) -> bool:
    return isinstance(df.schema[col].dataType, _NUMERIC)


def column_suggestions(
    df: DataFrame,
    columns: Sequence[str],
    category_max: int = DEFAULT_CATEGORY_MAX,
) -> DataFrame:
    """Suggestion rows: (column, check_type, param_lo, param_hi). A
    column may yield several suggestions (unique implies not_null-able
    facts, etc.); ordering is by the output's own columns, so the set is
    deterministic."""
    # pass 1: ONE wide aggregate — total rows, per-column null counts,
    # numeric min/max as double
    aggs = [F.count(F.lit(1)).alias("__n_total")]
    for c in columns:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if _is_numeric(df, c):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__mx_{c}"))
    wide = df.agg(*aggs)
    facts_entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n_total").alias("n_total"),
            F.col(f"__nn_{c}").alias("n_nonnull"),
            (F.col(f"__mn_{c}") if _is_numeric(df, c)
             else F.lit(None).cast("double")).alias("mn"),
            (F.col(f"__mx_{c}") if _is_numeric(df, c)
             else F.lit(None).cast("double")).alias("mx"),
            F.lit(_is_numeric(df, c)).alias("is_num"),
        )
        for c in columns
    ]
    facts = wide.select(F.explode(F.array(*facts_entries)).alias("f")).select(
        "f.*"
    )

    # pass 2: stacked distinct counts (all columns, one shuffle)
    stacked = [
        F.when(
            F.col(c).isNotNull(),
            F.struct(F.lit(c).alias("column"),
                     F.col(c).cast("string").alias("value")),
        )
        for c in columns
    ]
    distinct = (
        df.select(F.explode(F.array(*stacked)).alias("e"))
        .where(F.col("e").isNotNull())
        .select("e.column", "e.value")
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("column")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    # full outer: an all-NULL column has no distinct rows but still has facts
    j = facts.join(distinct, "column", "left_outer").na.fill(
        {"n_distinct": 0}
    )

    cm = int(category_max)
    anchor = columns[0]
    sugg = F.array(
        # table-level size floor (Deequ's hasSize suggestion): emitted once,
        # anchored to the first profiled column; half the observed rows is
        # the catastrophic-drop tripwire, not a tight bound
        F.when(
            (F.col("column") == anchor) & (F.col("n_total") > 0),
            F.struct(F.lit("row_count").alias("check_type"),
                     F.floor(F.col("n_total") / 2).cast("double")
                      .alias("param_lo"),
                     F.lit(None).cast("double").alias("param_hi")),
        ),
        F.when(
            (F.col("n_total") > 0) & (F.col("n_nonnull") == F.col("n_total")),
            F.struct(F.lit("not_null").alias("check_type"),
                     F.lit(None).cast("double").alias("param_lo"),
                     F.lit(None).cast("double").alias("param_hi")),
        ),
        F.when(
            (F.col("n_nonnull") > 0)
            & (F.col("n_distinct") == F.col("n_nonnull")),
            F.struct(F.lit("unique").alias("check_type"),
                     F.lit(None).cast("double").alias("param_lo"),
                     F.lit(None).cast("double").alias("param_hi")),
        ),
        F.when(
            (F.col("n_distinct") >= 2) & (F.col("n_distinct") <= cm),
            F.struct(F.lit("completeness_categories").alias("check_type"),
                     F.col("n_distinct").cast("double").alias("param_lo"),
                     F.lit(None).cast("double").alias("param_hi")),
        ),
        F.when(
            F.col("is_num") & (F.col("n_distinct") > cm),
            F.struct(F.lit("mean_between").alias("check_type"),
                     F.col("mn").alias("param_lo"),
                     F.col("mx").alias("param_hi")),
        ),
    )
    return (
        j.select("column", F.explode(sugg).alias("s"))
        .where(F.col("s").isNotNull())
        .select(
            F.when(F.col("s")["check_type"] == "row_count", F.lit("*"))
            .otherwise(F.col("column")).alias("column"),
            F.col("s")["check_type"].alias("check_type"),
            F.col("s")["param_lo"].alias("param_lo"),
            F.col("s")["param_hi"].alias("param_hi"),
        )
    )


def as_suite_config(
    df: DataFrame,
    suggestions: DataFrame,
    table: str = "t",
    category_max: int = DEFAULT_CATEGORY_MAX,
) -> dict:
    """Materialize suggestion rows into a runnable suite config. Collects
    the expected-value list for enum columns (<= category_max values per
    column — bounded driver traffic)."""
    rows = suggestions.collect()
    enum_cols = sorted(
        {r["column"] for r in rows
         if r["check_type"] == "completeness_categories"}
    )
    expected: dict[str, list] = {}
    for c in enum_cols:
        vals = [
            r[0]
            for r in df.select(F.col(c).cast("string"))
            .where(F.col(c).isNotNull())
            .distinct()
            .collect()
        ]
        if len(vals) > category_max:  # raced profile vs now — stay bounded
            vals = vals[: category_max]
        expected[c] = sorted(vals)
    checks = []
    for r in sorted(rows, key=lambda r: (r["column"], r["check_type"])):
        c, ct = r["column"], r["check_type"]
        name = f"{c}_{ct}"
        if ct == "not_null":
            checks.append({"type": "not_null", "name": name, "table": table,
                           "column": c})
        elif ct == "unique":
            checks.append({"type": "unique", "name": name, "table": table,
                           "keys": [c]})
        elif ct == "completeness_categories":
            checks.append({"type": "completeness_categories", "name": name,
                           "table": table, "column": c,
                           "expected": expected[c]})
        elif ct == "mean_between":
            checks.append({"type": "mean_between", "name": name,
                           "table": table, "column": c,
                           "min_mean": r["param_lo"],
                           "max_mean": r["param_hi"]})
        elif ct == "row_count":
            checks.append({"type": "row_count", "name": f"{table}_row_count",
                           "table": table,
                           "min_rows": int(r["param_lo"])})
    return {"checks": checks}
