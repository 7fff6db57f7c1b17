"""Functional-dependency checks: does ``determinant -> dependent`` hold?

The Deequ-style "satisfies" family's structural cousin, and a constraint
JSON Schema cannot express (it relates ROWS, not values inside one row):
a column set A functionally determines B iff every A-group carries exactly
one B value. Classic uses on the north-star table: ``clip_id -> sr_hz``
(re-ingested clips must not change their sample rate), ``codec ->
container magic``; on TPC-H-ish data ``l_partkey -> l_suppkey`` fails by
design (a part ships from several suppliers) and makes a good planted
report.

Scale design (10^12 rows):
- ALL requested FDs are checked in ONE scan: each row explodes into one
  (fd, determinant-key, dependent-value) entry per FD (codegen'd inline
  generator over a literal array of structs — same stacking shape as
  ``drift.drift_report``), then TWO narrow hash aggregates:
  groupBy(fd, det, dep).count  ->  groupBy(fd, det)  ->  groupBy(fd).
  Shuffle volume after the first partial aggregate is bounded by the
  number of DISTINCT (fd, det, dep) triples, never the row count.
- No windows, no driver round-trips, no Python.
- The first aggregate keys on (fd, det, dep) — one hot determinant group
  does NOT funnel through one reducer while distinct pairs are counted;
  only the already-collapsed per-group rows meet at (fd, det).

NULL semantics (documented contract):
- Rows where ANY determinant column is NULL are excluded from that FD
  (absent-property semantics, consistent with the validator and
  referential checks).
- A NULL dependent is a VALUE: a group carrying both NULL and 'x'
  violates the FD. Internally NULL maps to a reserved sentinel after a
  null-flag split so it can never collide with a real string.

Cross-engine determinism: determinant/dependent values ride as strings
(``cast(... as string)`` — exact for ints/strings/dates; avoid raw
doubles in oracle-checked FDs), joined with an ASCII 0x1f separator, so
DuckDB replays the identical grouping.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from jsonschema_spark.functions.grid import grid_round

#: separator for multi-column determinant keys (never appears in numeric
#: or categorical test data; documented contract for string determinants)
SEP = "\x1f"
#: sentinel for a NULL dependent value (prefixed by a flag char so a real
#: string can never collide with it)
NULL_DEP = "\x00null"


def _det_key(cols: Sequence[str]) -> F.Column:
    return F.concat_ws(SEP, *[F.col(c).cast("string") for c in cols])


def _dep_val(col: str) -> F.Column:
    return F.coalesce(F.col(col).cast("string"), F.lit(NULL_DEP))


def _normalize(
    fds: Mapping[str, Tuple[Sequence[str] | str, str]],
) -> dict[str, tuple[list[str], str]]:
    out = {}
    for name, (det, dep) in fds.items():
        det_cols = [det] if isinstance(det, str) else list(det)
        out[name] = (det_cols, dep)
    return out


def fd_group_profile(
    df: DataFrame, fds: Mapping[str, Tuple[Sequence[str] | str, str]]
) -> DataFrame:
    """Per-(fd, determinant-group) profile: (fd, det, n_rows, n_distinct).

    One scan for all FDs (stacked inline generator), two narrow aggregates.
    ``n_distinct`` counts distinct dependent VALUES including NULL-as-value.
    """
    norm = _normalize(fds)
    entries = []
    for name, (det_cols, dep) in norm.items():
        all_det_non_null = None
        for c in det_cols:
            nn = F.col(c).isNotNull()
            all_det_non_null = nn if all_det_non_null is None else (all_det_non_null & nn)
        entries.append(
            F.when(
                all_det_non_null,
                F.struct(
                    F.lit(name).alias("fd"),
                    _det_key(det_cols).alias("det"),
                    _dep_val(dep).alias("dep"),
                ),
            )
        )
    stacked = (
        df.select(F.explode(F.array(*entries)).alias("e"))
        .where(F.col("e").isNotNull())
        .select("e.fd", "e.det", "e.dep")
    )
    per_pair = stacked.groupBy("fd", "det", "dep").agg(
        F.count(F.lit(1)).alias("pair_rows")
    )
    return per_pair.groupBy("fd", "det").agg(
        F.sum("pair_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("pair_rows").alias("majority_rows"),
    )


def fd_report(
    df: DataFrame, fds: Mapping[str, Tuple[Sequence[str] | str, str]]
) -> DataFrame:
    """One row per FD: does it hold, and how badly does it fail?

    (fd, n_groups, violating_groups, violating_rows, max_distinct,
    g3_error, fd_holds). ``violating_rows`` counts rows living in groups
    with >1 dependent value — the rows a repair would have to touch.
    ``g3_error`` is the standard approximate-FD error (TANE's g3, public
    literature): the minimum FRACTION of rows whose removal makes the FD
    hold exactly — 1 − Σ_groups max-dependent-count / n. A 0.002 g3 on a
    "violated" FD says the dependency is structurally near-exact (one
    re-ingest glitch per 500 rows), where violating_groups alone cannot
    distinguish noise from genuinely multi-valued relationships.
    ``g3_error`` is exact integer arithmetic until one final division —
    engine-replayable.
    """
    prof = fd_group_profile(df, fds)
    viol = F.col("n_distinct") > 1
    return (
        prof.groupBy("fd")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(viol.cast("bigint")).alias("violating_groups"),
            F.sum(F.when(viol, F.col("n_rows")).otherwise(F.lit(0))).alias(
                "violating_rows"
            ),
            F.max("n_distinct").alias("max_distinct"),
            F.sum("n_rows").alias("_n"),
            F.sum("majority_rows").alias("_keep"),
        )
        .select(
            "fd",
            "n_groups",
            "violating_groups",
            "violating_rows",
            "max_distinct",
            grid_round(
                (F.col("_n") - F.col("_keep")) / F.col("_n").cast("double"), 6
            ).alias("g3_error"),
            (F.col("violating_groups") == 0).alias("fd_holds"),
        )
    )


def fd_violating_groups(
    df: DataFrame,
    fds: Mapping[str, Tuple[Sequence[str] | str, str]],
    k: int = 20,
) -> DataFrame:
    """Top-k violating determinant groups per FD, worst first.

    Deterministic ordering (n_distinct desc, n_rows desc, det asc) so the
    result is replayable; the rank window runs over the already-aggregated
    per-group profile PARTITIONED BY fd — O(distinct groups) rows, and
    only violating groups enter the window.
    """
    from pyspark.sql import Window

    prof = fd_group_profile(df, fds).where(F.col("n_distinct") > 1)
    w = Window.partitionBy("fd").orderBy(
        F.col("n_distinct").desc(), F.col("n_rows").desc(), F.col("det").asc()
    )
    return (
        prof.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("fd", "det", "n_rows", "n_distinct", "rank")
    )
