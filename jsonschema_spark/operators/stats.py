"""Per-column statistics pass (north rule: null fraction, min/max, distinct).

Scale design: ONE single-pass hash aggregate over the table computes every
requested stat for every column — partial aggregation happens map-side, the
shuffle carries one partial-agg row per task. Distinct counts default to
``approx_count_distinct`` (HyperLogLog++, mergeable sketch => no extra
shuffle); ``exact=True`` switches to exact distinct (one expand) for
oracle-comparable output.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from jsonschema_spark.functions.grid import grid_round

_MINMAXABLE = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
    T.DoubleType, T.DecimalType, T.StringType, T.DateType, T.TimestampType,
    T.TimestampNTZType, T.BooleanType,
)


def column_quantiles(
    df: DataFrame,
    column: str,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """(quantile, value) — one row per requested quantile.

    Default is the mergeable KLL-style sketch (``approx_percentile``): one
    partial+final aggregate, no global sort — the only sane shape at 10^12
    rows. ``exact=True`` switches to the exact interpolating ``percentile``
    (sort-based; for audits and oracle comparison).
    """
    qs = list(quantiles)
    c = F.col(column).cast("double")
    if exact:
        agg = F.percentile(c, F.array(*[F.lit(q) for q in qs]))
    else:
        agg = F.percentile_approx(c, qs, accuracy)
    wide = df.agg(agg.alias("_qs"))
    entries = [
        F.struct(F.lit(q).alias("quantile"),
                 grid_round(F.element_at("_qs", i + 1), 6).alias("value"))
        for i, q in enumerate(qs)
    ]
    return (
        wide.select(F.explode(F.array(*entries)).alias("s"))
        .select("s.*")
        .orderBy("quantile")
    )


def column_stats(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    exact_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Long-format stats: one row per column.

    (column, row_count, null_count, null_frac, min, max, distinct_count)
    min/max are rendered as strings so heterogeneous column types stack.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else [f.name for f in df.schema.fields]

    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"))
        if isinstance(fields[c], _MINMAXABLE):
            aggs.append(F.min(c).cast("string").alias(f"_min_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"_max_{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"_min_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"_max_{c}"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"_dist_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"_dist_{c}"))

    wide = df.agg(*aggs)

    # Pivot wide -> long with a stack of per-column structs (driver-free).
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_rows").alias("row_count"),
            F.col(f"_null_{c}").alias("null_count"),
            grid_round(F.col(f"_null_{c}") / F.col("_rows"), 6).alias("null_frac"),
            F.col(f"_min_{c}").alias("min"),
            F.col(f"_max_{c}").alias("max"),
            F.col(f"_dist_{c}").alias("distinct_count"),
        )
        for c in cols
    ]
    return (
        wide.select(F.explode(F.array(*entries)).alias("s"))
        .select("s.*")
        .orderBy("column")
    )


def _variant_type_map():
    # numeric spellings shared with the validation type gates (single source
    # of truth: plans/compile.VARIANT_NUMERIC_SOV)
    from jsonschema_spark.plans.compile import VARIANT_NUMERIC_SOV

    return [
        ("^OBJECT", "object"),
        ("^ARRAY", "array"),
        ("^STRING", "string"),
        ("^BOOLEAN", "boolean"),
        ("^VOID", "null"),
        (VARIANT_NUMERIC_SOV, "number"),
    ]


def variant_json_type(col) -> "F.Column":
    """Runtime JSON type of a VARIANT value as the draft 2020-12 type name
    (object/array/string/number/boolean/null); NULL for absent values."""
    sov = F.schema_of_variant(col)
    expr = F.lit(None).cast("string")
    for pat, name in reversed(_variant_type_map()):
        expr = F.when(sov.rlike(pat), F.lit(name)).otherwise(expr)
    return expr


def variant_type_histogram(df: DataFrame, column: str) -> DataFrame:
    """(json_type, count) over a VARIANT column — the dynamic-JSON analogue
    of a dtype profile: one hash aggregate (map-side partials), rows ordered
    by type name. Absent (SQL NULL) values report as json_type='absent'."""
    jt = F.coalesce(variant_json_type(F.col(column)), F.lit("absent"))
    return (
        df.select(jt.alias("json_type"))
        .groupBy("json_type")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("json_type")
    )


def robust_center_spread(
    df: DataFrame, column: str, exact: bool = False, accuracy: int = 10000
) -> DataFrame:
    """One-row (median, mad): median and median-absolute-deviation of
    ``column``. MAD needs the median as an input, so this is two chained
    aggregates composed WITHOUT a driver round-trip: the one-row median
    frame cross-joins back onto the table (broadcast of a single row).

    Default uses the mergeable percentile sketch (partial+final aggregate,
    no sort — the only sane shape at 10^12 rows); ``exact=True`` switches
    to the interpolating exact percentile for audits and oracle comparison
    (matches DuckDB ``quantile_cont``).
    """
    c = F.col(column).cast("double")

    def med(col):
        return (
            F.percentile(col, F.lit(0.5))
            if exact
            else F.percentile_approx(col, F.lit(0.5), F.lit(accuracy))
        )

    m = df.agg(med(c).alias("median"))
    return (
        df.crossJoin(m)
        .agg(
            F.first("median").alias("median"),
            med(F.abs(c - F.col("median"))).alias("mad"),
        )
    )


def skew_report(df: DataFrame, column: str, salt_threshold_ppm: int = 10000) -> DataFrame:
    """One-row key-skew verdict for ``column`` — THE input to the salting
    decision every shuffle-keyed operator in this engine exposes
    (uniqueness ``salted=``, validate's salted rollups): if one key value
    carries more than ``salt_threshold_ppm`` parts-per-million of the
    rows, a shuffle keyed on the raw column funnels that share through
    one reducer and the key should be salted (or AQE skew-join split).

    (total_rows, n_distinct, max_cnt, max_share_ppm, salt_recommended).
    NULLs are excluded (they key no shuffle partition of interest).

    Plan shape: ONE chain — groupBy(value).count (partial+final; shuffle
    carries one row per distinct value) into a single global aggregate of
    that histogram. No second reference to the histogram, no window, no
    driver round-trip. Shares are exact BIGINT arithmetic
    (cnt*1e6 div total) so DuckDB replays them bit-for-bit.
    """
    hist = (
        df.where(F.col(column).isNotNull())
        .groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        hist.agg(
            F.sum("cnt").alias("total_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("cnt").alias("max_cnt"),
        )
        .select(
            "total_rows",
            "n_distinct",
            "max_cnt",
            F.expr("(max_cnt * CAST(1000000 AS BIGINT)) div total_rows").alias(
                "max_share_ppm"
            ),
        )
        .select(
            "*",
            (F.col("max_share_ppm") > salt_threshold_ppm).alias("salt_recommended"),
        )
    )


def heavy_hitters(df: DataFrame, column: str, k: int = 20) -> DataFrame:
    """Top-k most frequent values of ``column`` with exact counts and
    integer-ppm shares — which keys are hot, for skew triage and salting
    bucket design.

    (value, cnt, share_ppm, rank), rank 1 = hottest; deterministic
    tie-break (cnt desc, value asc) so the result is replayable.

    Plan shape: groupBy(value).count, then the histogram is persisted —
    it is referenced twice (top-k + total) and an unpersisted double
    reference would plan the full upstream scan once per reference
    (measured elsewhere in this repo: 8 scans instead of 2). Top-k runs
    as orderBy+limit = TakeOrdered (per-partition heap + driver merge of
    k rows, no global sort shuffle); the rank window orders only the k
    collected candidates. ``value`` is cast to string so mixed callers
    and the oracle agree on ordering semantics.
    """
    from pyspark.sql import Window
    from pyspark import StorageLevel

    hist = (
        df.where(F.col(column).isNotNull())
        .groupBy(F.col(column).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = hist.agg(F.sum("cnt").alias("total_rows"))
    top = hist.orderBy(F.col("cnt").desc(), F.col("value").asc()).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("value").asc())
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            "value",
            "cnt",
            F.expr("(cnt * CAST(1000000 AS BIGINT)) div total_rows").alias(
                "share_ppm"
            ),
            F.row_number().over(w).alias("rank"),
        )
    )


def distinctness_profile(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Per-column value-distribution shape (the Deequ Distinctness /
    UniqueValueRatio / Entropy analyzers): one row per column with
    (column, n_rows, n_distinct, distinctness, unique_value_ratio,
    entropy). NULLs excluded (completeness is column_stats' job).

    - distinctness      = n_distinct / n_rows
    - unique_value_ratio = values occurring exactly once / n_distinct
    - entropy (nats)    = ln(n) - sum(c·ln c)/n over value counts c —
      each c·ln c term is floored onto an integer 1e-6 grid and summed
      as BIGINTs (the PSI-oracle precedent: double ln agrees across
      engines well above that grid), so the sum is aggregation-order
      independent and DuckDB-replayable; the final combination is
      correctly-rounded double arithmetic, rounded to 6.

    Plan shape: ALL columns in one stacked pass — explode to (column,
    value-as-string), ONE groupBy(column, value) partial+final count
    (shuffle bounded by total distinct values across columns), then one
    narrow groupBy(column). No windows, no driver round-trips.
    """
    entries = [
        F.when(
            F.col(c).isNotNull(),
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).cast("string").alias("value"),
            ),
        )
        for c in columns
    ]
    stacked = (
        df.select(F.explode(F.array(*entries)).alias("e"))
        .where(F.col("e").isNotNull())
        .select("e.column", "e.value")
    )
    counts = stacked.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("c")
    )
    scaled_clnc = F.floor(
        F.col("c").cast("double") * F.log(F.col("c").cast("double")) * F.lit(1e6)
        + F.lit(0.5)
    ).cast("bigint")
    agg = counts.groupBy("column").agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum((F.col("c") == 1).cast("bigint")).alias("n_unique"),
        F.sum(scaled_clnc).alias("sum_clnc_scaled"),
    )
    n = F.col("n_rows").cast("double")
    entropy = F.log(n) - (F.col("sum_clnc_scaled") / F.lit(1e6)) / n
    return agg.select(
        "column",
        "n_rows",
        "n_distinct",
        grid_round(F.col("n_distinct") / F.col("n_rows"), 6).alias("distinctness"),
        grid_round(F.col("n_unique") / F.col("n_distinct"), 6).alias(
            "unique_value_ratio"
        ),
        F.when(F.col("n_rows") > 0, grid_round(entropy, 6)).alias("entropy"),
    )


def mutual_information(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns — the
    Deequ MutualInformation analyzer: how much knowing X tells you about
    Y (0 = independent; min(H(X), H(Y)) = deterministic). The
    relational use: quantify near-FDs that ``fd_report`` would call
    violated but are still structurally strong.

    One-row result (col_x, col_y, n, mi). Rows with a NULL on either
    side are excluded.

    Plan shape: ONE groupBy(x, y) joint-count aggregate (shuffle bounded
    by distinct pairs); marginals re-aggregate the tiny joint histogram
    (post-aggregate data, AQE broadcasts the joins); the final sum runs
    over joint-histogram rows. Each contribution
    c_xy · (ln c_xy + ln n − ln c_x − ln c_y) is floored onto the
    integer 1e-6 grid and summed as BIGINTs (entropy/PSI precedent), so
    the result is aggregation-order independent and DuckDB-replayable;
    MI = scaled_sum / 1e6 / n.
    """
    pair = df.select(
        F.col(col_x).cast("string").alias("x"),
        F.col(col_y).cast("string").alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    from pyspark import StorageLevel

    # joint is referenced four times (marginals ×2, total, join) — persist
    # the tiny post-aggregate histogram or Catalyst re-plans the full
    # upstream scan once per reference (the drift_matrix lesson).
    joint = (
        pair.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    mx = joint.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    my = joint.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    tot = joint.agg(F.sum("c_xy").alias("n"))
    j = joint.join(mx, "x").join(my, "y").crossJoin(F.broadcast(tot))
    ln = lambda col: F.log(col.cast("double"))  # noqa: E731
    term = F.col("c_xy").cast("double") * (
        ln(F.col("c_xy")) + ln(F.col("n")) - ln(F.col("c_x")) - ln(F.col("c_y"))
    )
    scaled = F.floor(term * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    return j.agg(
        F.max("n").alias("n"),
        grid_round(
            (F.sum(scaled) / F.lit(1e6)) / F.max("n").cast("double"), 6
        ).alias("mi"),
    ).select(
        F.lit(col_x).alias("col_x"), F.lit(col_y).alias("col_y"), "n", "mi"
    )


def moments(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Per-column mean / population-stddev with exact two-part fixed-point
    moment sums (order-independent — ``F.avg``/``F.stddev`` accumulate
    doubles in partition order and are not replayable cross-engine; a
    per-row double→DECIMAL(38,12) cast is the build-dependent trap that
    failed reconcile on the rounds-2/3 drivers — see functions/grid.py).
    Each moment is quantized per row into (floor(x), floor(frac·2^30+0.5))
    exact integers and summed as DECIMAL(38,0); reconstruction is one
    exact 2^-30 multiply + one correctly-rounded add. Returns (column, n,
    mean, stddev) — same stacked one-pass shape as
    :func:`correlation_pairs`. stddev is the population form
    sqrt(n·sxx - sx²)/n; NULL for n == 0."""
    from jsonschema_spark.functions.grid import fixed_parts, fixed_parts_total
    entries = [
        F.when(
            F.col(c).isNotNull(),
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).cast("double").alias("x"),
            ),
        )
        for c in columns
    ]
    stacked = (
        df.select(F.explode(F.array(*entries)).alias("e"))
        .where(F.col("e").isNotNull())
        .select("e.column", "e.x")
    )
    x_i, x_f = fixed_parts(F.col("x"))
    xx_i, xx_f = fixed_parts(F.col("x") * F.col("x"))
    agg = stacked.groupBy("column").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x_i).alias("sx_i"),
        F.sum(x_f).alias("sx_f"),
        F.sum(xx_i).alias("sxx_i"),
        F.sum(xx_f).alias("sxx_f"),
    )
    nd = F.col("n").cast("double")
    sx = fixed_parts_total("sx_i", "sx_f")
    sxx = fixed_parts_total("sxx_i", "sxx_f")
    return agg.select(
        "column",
        "n",
        grid_round(sx / nd, 6).alias("mean"),
        F.when(
            F.col("n") > 0,
            grid_round(F.sqrt(F.greatest(nd * sxx - sx * sx, F.lit(0.0))) / nd, 6),
        ).alias("stddev"),
    )


def correlation_pairs(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlation over the given numeric columns —
    (col_x, col_y, n, corr) for every unordered pair, NULL-pair rows
    excluded per pair, corr NULL for constant columns.

    Determinism design: ``F.corr`` (and any naive double accumulation)
    depends on partition merge order. Here every moment (sum x, sum y,
    sum x², sum y², sum xy) is a per-row DOUBLE product quantized into
    two-part exact integers — (floor(v), floor(frac·2^30+0.5)), see
    functions/grid.py — and summed as DECIMAL(38,0): exact, associative,
    identical across engines/partitionings/retries/builds (a per-row
    double→scaled-DECIMAL cast is the build-dependent trap that failed
    reconcile on the rounds-2/3 drivers); Pearson r is then a fixed
    sequence of correctly-rounded double ops over those exact sums, so
    DuckDB reproduces it bit-for-bit.

    Plan shape: each row explodes into one (pair, x, y) entry per pair
    (codegen'd generator), then ONE narrow groupBy(pair) — partial
    aggregation collapses each partition to n_pairs rows before the
    shuffle, so shuffle volume is O(partitions × pairs), never row count,
    and no aggregate grows wide enough to fall out of whole-stage codegen
    (the >100-field cliff a one-sum-per-pair wide aggregate hits).
    """
    from jsonschema_spark.functions.grid import fixed_parts, fixed_parts_total

    pairs = [
        (columns[i], columns[j])
        for i in range(len(columns))
        for j in range(i + 1, len(columns))
    ]
    entries = []
    for cx, cy in pairs:
        x = F.col(cx).cast("double")
        y = F.col(cy).cast("double")
        entries.append(
            F.when(
                x.isNotNull() & y.isNotNull(),
                F.struct(
                    F.lit(f"{cx}\x1f{cy}").alias("pair"),
                    x.alias("x"),
                    y.alias("y"),
                ),
            )
        )
    stacked = (
        df.select(F.explode(F.array(*entries)).alias("e"))
        .where(F.col("e").isNotNull())
        .select("e.pair", "e.x", "e.y")
    )
    moment_cols = {
        "sx": F.col("x"),
        "sy": F.col("y"),
        "sxx": F.col("x") * F.col("x"),
        "syy": F.col("y") * F.col("y"),
        "sxy": F.col("x") * F.col("y"),
    }
    aggs = [F.count(F.lit(1)).alias("n")]
    for name, expr in moment_cols.items():
        p_i, p_f = fixed_parts(expr)
        aggs.append(F.sum(p_i).alias(f"{name}_i"))
        aggs.append(F.sum(p_f).alias(f"{name}_f"))
    agg = stacked.groupBy("pair").agg(*aggs)
    nd = F.col("n").cast("double")
    sx = fixed_parts_total("sx_i", "sx_f")
    sy = fixed_parts_total("sy_i", "sy_f")
    cov = nd * fixed_parts_total("sxy_i", "sxy_f") - sx * sy
    vx = nd * fixed_parts_total("sxx_i", "sxx_f") - sx * sx
    vy = nd * fixed_parts_total("syy_i", "syy_f") - sy * sy
    den = F.sqrt(vx) * F.sqrt(vy)
    return agg.select(
        F.split_part(F.col("pair"), F.lit("\x1f"), F.lit(1)).alias("col_x"),
        F.split_part(F.col("pair"), F.lit("\x1f"), F.lit(2)).alias("col_y"),
        "n",
        F.when(den > 0, grid_round(cov / den, 6)).alias("corr"),
    )


def benford_report(df: DataFrame, column: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic forensic-accounting / data-fabrication screen (Nigrini):
    naturally-occurring multi-magnitude numerics (amounts, populations,
    file sizes) follow P(d) = log10(1 + 1/d); fabricated or truncated
    feeds don't.

    Returns exactly 9 rows (digit 1-9): n, observed_frac, expected_frac,
    abs_dev (|obs - exp|, the per-digit MAD term) and chi2_term
    ((n - N·e)²/(N·e), summing to the chi-square statistic), all rounded
    to 6. Digits never observed still appear with n = 0.

    Determinism design: the digit is extracted from the value's STRING
    form (first ``[1-9]`` char — sign/zeros/decimal point skipped), not
    from log10/pow arithmetic whose floor() flips across engines at
    exact powers of ten; expected fractions are Python-computed
    full-precision literals. Zero and NULL carry no first significant
    digit and are excluded (their count is recoverable from column_stats).

    Plan shape: ONE narrow groupBy over a codegen'd regexp projection
    (shuffle carries ≤9 rows per task), joined to a 9-row literal frame
    — no window over the data, no second scan."""
    import math

    from pyspark.sql import Window

    digit = F.regexp_extract(F.col(column).cast("string"), "[1-9]", 0)
    obs = (
        df.select(digit.alias("d"))
        .where(F.col("d") != "")
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = df.sparkSession.createDataFrame(
        [(str(d), math.log10(1.0 + 1.0 / d)) for d in range(1, 10)],
        "d string, expected double",
    )
    joined = base.join(obs, "d", "left").select(
        F.col("d").cast("int").alias("digit"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        "expected",
    )
    total = F.sum("n").over(Window.partitionBy())  # 9 post-agg rows
    nd = F.col("n").cast("double")
    td = F.col("_t").cast("double")
    exp_n = td * F.col("expected")
    # a column with NO significant digits (empty/all-zero/all-NULL) has
    # no distribution: fractions stay NULL (ANSI-safe), callers fail loud
    obs = F.when(td > 0, nd / td)
    return (
        joined.withColumn("_t", total)
        .select(
            "digit",
            "n",
            grid_round(obs, 6).alias("observed_frac"),
            grid_round(F.col("expected"), 6).alias("expected_frac"),
            grid_round(F.abs(obs - F.col("expected")), 6).alias("abs_dev"),
            F.when(
                td > 0, grid_round((nd - exp_n) * (nd - exp_n) / exp_n, 6)
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def mad_outliers(
    df: DataFrame,
    column: str,
    key_cols: Sequence[str],
    k: float = 3.5,
    exact: bool = False,
) -> DataFrame:
    """Rows whose modified z-score 0.6745*|x - median|/MAD exceeds ``k``
    (Iglewicz-Hoaglin robust outlier rule — resistant to the outliers
    themselves, unlike mean/stddev z-scores).

    Returns (key..., value, modified_z) with modified_z rounded to 6.
    Plan shape: two aggregates + one broadcast of a single stats row +
    one codegen'd filter scan — no window, no sort of the data."""
    stats = robust_center_spread(df, column, exact=exact)
    c = F.col(column).cast("double")
    z = grid_round(F.lit(0.6745) * F.abs(c - F.col("median")) / F.col("mad"), 6)
    return (
        df.crossJoin(F.broadcast(stats))
        .where(c.isNotNull() & (F.col("mad") > 0) & (z > k))
        .select(*key_cols, c.alias("value"), z.alias("modified_z"))
    )
