"""Deterministic sampling operators for corpus curation.

Training-data pipelines sample constantly — down-weight a crawl source,
balance languages, fit a token budget — and at 10^12 rows the sample must
be DETERMINISTIC (re-runs and retried tasks pick the same rows; an auditor
can recompute membership from the key alone). Random-number sampling
(``df.sample``) gives none of that. Everything here derives membership
from ``md5(seed || key)``:

    u(key) = int(hex(md5(seed|key))[:15], 16) / 2^60   — uniform in [0,1)

so membership is a pure function of (seed, key) — portable across engines
(the DuckDB oracles recompute it bit-identically via hex casts, the same
``md5_60`` trick as the MinHash oracle family).

Scale design (10^12 rows):
- ``hash_sample`` / ``stratified_sample`` are pure row-local filters: no
  shuffle at all, fully codegen'd (md5 + substring + conv are JVM
  built-ins). Sampling 10^12 rows costs one scan.
- ``token_budget_sample`` needs a per-stratum running sum, i.e. a window
  ordered by the hash WITHIN each stratum. That is the right scale shape
  when strata are numerous and individually bounded (sources, languages,
  shards): each stratum sorts independently, no global order. For a
  single giant stratum, pre-shard it (add a hash-derived sub-stratum) or
  use ``hash_sample`` with rate = budget/total as the shuffle-free
  approximation.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = float(1 << 60)


def sample_hash(key: Column, seed: str = "") -> Column:
    """60-bit deterministic hash of (seed, key) as BIGINT in [0, 2^60)."""
    tagged = F.concat_ws("|", F.lit(seed), key.cast("string"))
    return F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")


def sample_uniform(key: Column, seed: str = "") -> Column:
    """Deterministic uniform in [0,1) derived from the key — the membership
    score every operator below thresholds on."""
    return sample_hash(key, seed) / F.lit(HASH_SPACE)


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: str = ""
) -> DataFrame:
    """Keep rows with u(key) < rate. Deterministic, shuffle-free, exact-ish
    (binomial around rate*n). NULL keys are dropped (no stable identity to
    sample on — surface them with a required/uniqueness check instead)."""
    return df.where(
        F.col(key_col).isNotNull()
        & (sample_uniform(F.col(key_col), seed) < F.lit(rate))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. {"en": 0.1, "de": 0.5}) — the
    language/source-rebalancing primitive. Still a pure row-local filter:
    the rate lookup compiles to a CASE chain over the (small, driver-known)
    strata map; strata absent from ``rates`` get ``default_rate``."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    return df.where(
        F.col(key_col).isNotNull()
        & (sample_uniform(F.col(key_col), seed) < rate)
    )


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    budget: int,
    strata_col: Optional[str] = None,
    seed: str = "",
) -> DataFrame:
    """Deterministic prefix of the hash-ordered stream whose cumulative
    ``weight_col`` (token counts) stays within ``budget`` — per stratum
    when ``strata_col`` is given, so each source/language gets its own
    budget. A row is kept iff the running sum INCLUDING it is <= budget
    (first over-budget row is excluded, like a greedy packer).

    The hash ordering makes the kept prefix a uniform random subset that is
    stable under re-runs and under appends of later-hashing rows."""
    u = sample_hash(F.col(key_col), seed)
    parts = [F.col(strata_col)] if strata_col else []
    w = (
        Window.partitionBy(*parts).orderBy(u.asc(), F.col(key_col).asc())
        if parts
        else Window.orderBy(u.asc(), F.col(key_col).asc())
    )
    running = F.sum(F.col(weight_col).cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.where(F.col(key_col).isNotNull() & F.col(weight_col).isNotNull())
        .withColumn("_running", running)
        .where(F.col("_running") <= F.lit(int(budget)))
        .drop("_running")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata_col: Optional[str] = None,
    seed: str = "",
) -> DataFrame:
    """Weighted sampling without replacement, deterministic: keep the k
    rows with the largest score u(key)^(1/weight) per stratum — the
    Efraimidis–Spirakis A-Res key, inclusion probability proportional to
    weight, driven by the same md5 uniform as every other sampler here
    (re-run-stable, auditable, engine-portable).

    Rows with NULL/non-positive weights or NULL keys are excluded. The
    rank runs per stratum (no global sort when ``strata_col`` is given);
    k is small by construction, so the window state is bounded."""
    u = sample_uniform(F.col(key_col), seed)
    w = F.col(weight_col).cast("double")
    score = F.pow(u, F.lit(1.0) / w)
    parts = [F.col(strata_col)] if strata_col else []
    win = (
        Window.partitionBy(*parts).orderBy(score.desc(), F.col(key_col).asc())
        if parts
        else Window.orderBy(score.desc(), F.col(key_col).asc())
    )
    return (
        df.where(F.col(key_col).isNotNull() & w.isNotNull() & (w > 0))
        .withColumn("_rk", F.row_number().over(win))
        .where(F.col("_rk") <= F.lit(int(k)))
        .drop("_rk")
    )


def sample_report(
    df: DataFrame,
    sampled: DataFrame,
    strata_col: str,
    weight_col: Optional[str] = None,
) -> DataFrame:
    """Per-stratum before/after accounting: (stratum, rows_in, rows_kept
    [, weight_in, weight_kept]). Two narrow aggregates + one tiny join."""
    aggs_in = [F.count(F.lit(1)).alias("rows_in")]
    aggs_out = [F.count(F.lit(1)).alias("rows_kept")]
    if weight_col:
        aggs_in.append(F.sum(F.col(weight_col).cast("long")).alias("weight_in"))
        aggs_out.append(F.sum(F.col(weight_col).cast("long")).alias("weight_kept"))
    a = df.groupBy(F.col(strata_col).alias("stratum")).agg(*aggs_in)
    b = sampled.groupBy(F.col(strata_col).alias("stratum")).agg(*aggs_out)
    out = a.join(b, "stratum", "left")
    fills = {"rows_kept": 0}
    if weight_col:
        fills["weight_kept"] = 0
    return out.fillna(fills).orderBy("stratum")


MIX_SCALE = 1 << 20  # integer weight scaling: floor(n^alpha * 2^20)


def _alpha_weight(n: Column, alpha: float, scale: int) -> Column:
    """Integer-scaled stratum weight floor(n^alpha * scale) as BIGINT.

    alpha in {0.0, 0.5, 1.0} uses only correctly-rounded IEEE ops (sqrt,
    multiply-by-power-of-two is exponent-shift-exact, floor), so DuckDB
    reproduces the value bit-for-bit. Other alphas go through pow, which
    is NOT correctly rounded — fine inside Spark, excluded from oracles.
    """
    if alpha == 0.5:
        return F.floor(F.sqrt(n.cast("double")) * F.lit(float(scale))).cast("long")
    if alpha == 1.0:
        return (n.cast("long") * F.lit(int(scale))).cast("long")
    if alpha == 0.0:
        return F.when(n > 0, F.lit(int(scale))).otherwise(F.lit(0)).cast("long")
    return F.floor(
        F.pow(n.cast("double"), F.lit(float(alpha))) * F.lit(float(scale))
    ).cast("long")


def mixture_plan(
    df: DataFrame,
    strata_col: str,
    budget: int,
    weight_col: Optional[str] = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based corpus mixing plan (the GPT-3 / PaLM / multilingual
    alpha-sampling step): per-stratum mass n_s (row count, or sum of
    ``weight_col``), mixture share p_s = n_s^alpha / sum(n_t^alpha), and the
    deterministic per-stratum sampling rate that hits a total ``budget`` of
    mass with that mixture:

        rate_s = min(1, budget * p_s / n_s)

    alpha < 1 up-weights small strata (alpha=0.5 is the classic sqrt
    temperature; alpha=0 is uniform-over-strata; alpha=1 is proportional =
    no rebalancing). Rates cap at 1 — a stratum smaller than its mixture
    allocation contributes everything it has (no upsampling here; epochs >
    1 is the trainer's job).

    Scale shape: one groupBy on the strata column (tiny output — strata are
    sources/languages), one scalar aggregate for the normalizer, one
    broadcast-sized cross join. The normalizer sums INTEGER-scaled weights
    (floor(n^alpha * 2^20)), so summation order cannot perturb the result —
    that is what keeps the whole plan engine-exact for oracle replay.
    NULL strata are excluded (no identity to allocate to).
    """
    mass = (
        F.sum(F.col(weight_col).cast("long")) if weight_col else F.count(F.lit(1))
    ).cast("long")
    plan = (
        df.where(F.col(strata_col).isNotNull())
        .groupBy(F.col(strata_col).alias("stratum"))
        .agg(mass.alias("n"))
        .withColumn("w_scaled", _alpha_weight(F.col("n"), alpha, MIX_SCALE))
    )
    tot = plan.agg(F.sum("w_scaled").alias("_tot"))
    mix_p = F.col("w_scaled").cast("double") / F.col("_tot").cast("double")
    rate = F.least(
        F.lit(1.0),
        F.lit(float(int(budget)))
        * F.col("w_scaled").cast("double")
        / F.col("_tot").cast("double")
        / F.col("n").cast("double"),
    )
    return plan.crossJoin(F.broadcast(tot)).select(
        "stratum", "n", "w_scaled", mix_p.alias("mix_p"), rate.alias("rate")
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    budget: int,
    weight_col: Optional[str] = None,
    alpha: float = 0.5,
    seed: str = "",
) -> DataFrame:
    """Apply a ``mixture_plan``: deterministic hash sampling at each
    stratum's temperature rate. Membership is u(seed|key) < rate_s — a pure
    function of (seed, key, corpus composition), re-run-stable and
    auditable. The plan side is tiny (one row per stratum) so AQE
    broadcasts the join; the corpus is never shuffled."""
    plan = mixture_plan(df, strata_col, budget, weight_col, alpha).select(
        F.col("stratum").alias(strata_col), "rate"
    )
    return (
        df.where(F.col(key_col).isNotNull() & F.col(strata_col).isNotNull())
        .join(plan, strata_col)
        .where(sample_uniform(F.col(key_col), seed) < F.col("rate"))
        .drop("rate")
    )


def assign_splits(
    df: DataFrame,
    key_col: str,
    fractions: Mapping[str, float],
    group_col: Optional[str] = None,
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/valid/test split assignment — leakage-safe when
    grouped.

    Every row gets ``out_col`` in ``fractions``' keys, chosen by where the
    60-bit hash of its identity lands among cumulative-fraction
    thresholds (exact integer literals — the DuckDB oracle inlines the
    same ints). The identity is ``coalesce(group_col, key_col)`` when
    ``group_col`` is given, else ``key_col``:

    - Plain mode: split is a pure function of (seed, key) — rerun-stable,
      no shuffle, fully codegen'd.
    - Grouped mode (THE point): pass a near-duplicate cluster id
      (``dedup.connected_components``) as ``group_col`` and every member
      of a cluster lands in the SAME split — near-duplicates can never
      straddle train/test, the standard contamination hole hash-splitting
      on raw ids leaves open.

    Fractions must sum to ~1 (assignment is total: last split takes the
    tail, so rounding never drops a row). NULL identities all hash the
    same tag and land together in one deterministic split — give rows a
    real identity (or a cluster) before splitting.
    """
    names = list(fractions)
    if len(names) < 2:
        raise ValueError("need at least two splits")
    total = float(sum(fractions[n] for n in names))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    thresholds: list[int] = []
    cum = 0.0
    for n in names[:-1]:
        cum += float(fractions[n])
        thresholds.append(int(round(cum * (1 << 60))))
    identity = (
        F.coalesce(F.col(group_col), F.col(key_col))
        if group_col is not None
        else F.col(key_col)
    )
    h = sample_hash(identity, seed)
    expr = None
    for name, thr in zip(names[:-1], thresholds):
        branch = h < F.lit(thr)
        expr = (
            F.when(branch, F.lit(name))
            if expr is None
            else expr.when(branch, F.lit(name))
        )
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)
