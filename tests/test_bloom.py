"""Bloom-filter membership screen (operators/bloom.py).

Anchors: zero false negatives (every true member hits); false-positive
rate lands near theory for the sized filter; the bitmap build is
input-size-independent in rows shuffled (at most n_bits/64 words);
params sizing follows the standard formulas; the probe plan contains
no join and no Python.
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.bloom import (
    bloom_build,
    bloom_params,
    bloom_probe_expr,
    bloom_screen,
    bloom_words,
)


def test_params_standard_sizing():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0
    # m ~ 9.585 * n for 1% FPR; k ~ 7
    assert 9000 <= m <= 10100 and k in (6, 7)
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_no_false_negatives_and_fpr_near_theory(spark):
    n_ref, n_probe = 500, 4000
    ref = spark.range(n_ref).select(
        F.concat(F.lit("m"), F.col("id")).alias("v")
    )
    m, k = bloom_params(n_ref, 0.02)
    words = bloom_words(ref, "v", m, k)
    assert len(words) == m // 64
    # members: every single one must hit
    hits = ref.select(
        bloom_probe_expr(F.col("v"), words, k).alias("h")
    ).agg(F.sum(F.col("h").cast("long"))).collect()[0][0]
    assert hits == n_ref
    # non-members: FPR near the 2% target (binomial slack)
    non = spark.range(n_probe).select(
        F.concat(F.lit("x"), F.col("id")).alias("v")
    )
    fp = non.select(
        bloom_probe_expr(F.col("v"), words, k).alias("h")
    ).agg(F.sum(F.col("h").cast("long"))).collect()[0][0]
    rate = fp / n_probe
    assert rate < 0.05, rate


def test_build_bounded_by_bitmap_not_input(spark):
    ref = spark.range(20000).select(F.col("id").cast("string").alias("v"))
    n_bits, k = 1024, 3
    rows = bloom_build(ref, "v", n_bits, k).collect()
    assert len(rows) <= n_bits // 64
    # saturated filter: every word present and nonzero
    assert all(r["word"] != 0 for r in rows)


def test_screen_end_to_end_and_plan_shape(spark):
    docs = spark.range(300).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc"),
        (F.col("id") % 3 == 0).alias("is_member"),
    )
    ref = docs.where("is_member").select(F.col("doc").alias("r"))
    out = bloom_screen(docs, "doc", ref, "r", fpr=0.001)
    got = out.collect()
    for r in got:
        if r["is_member"]:
            assert r["bloom_hit"] is True  # no false negatives, ever
    # probe plan: no join, no Python
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Python" not in plan


def test_probe_matches_duckdb_replay(spark):
    """Cross-engine: DuckDB rebuilds the words from the same reference
    with the same md5 arithmetic and reproduces every probe verdict."""
    import duckdb

    n_bits, k = 1 << 12, 4
    ref = spark.range(150).select(
        F.concat(F.lit("m"), F.col("id")).alias("v")
    )
    words = bloom_words(ref, "v", n_bits, k)
    probe = spark.range(900).select(
        F.concat(F.lit("p"), (F.col("id") % 450)).alias("v")
    )
    got = {
        (r["v"],): r["h"]
        for r in probe.select(
            "v", bloom_probe_expr(F.col("v"), words, k).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    poss = " UNION ALL ".join(
        f"SELECT DISTINCT v, {j} AS j, "
        f"('0x' || substr(md5(v || ':bf{j}'), 1, 15))::BIGINT "
        f"% {n_bits} AS pos FROM probe"
        for j in range(k)
    )
    refpos = " UNION ALL ".join(
        f"SELECT ('0x' || substr(md5('m' || CAST(r AS VARCHAR) || ':bf{j}'), 1, 15))::BIGINT "
        f"% {n_bits} AS pos FROM range(150) t(r)"
        for j in range(k)
    )
    con.execute(
        "CREATE TABLE probe AS SELECT 'p' || CAST(r % 450 AS VARCHAR) AS v "
        "FROM range(900) t(r)"
    )
    rows = con.execute(f"""
        WITH w AS (
          -- DuckDB 1::BIGINT << 63 overflows (Spark wraps to the sign
          -- bit) — spell the top bit explicitly
          SELECT pos // 64 AS wi,
                 bit_or(CASE WHEN pos % 64 = 63
                             THEN -9223372036854775808
                             ELSE 1::BIGINT << CAST(pos % 64 AS INTEGER)
                        END) AS wd
          FROM ({refpos}) GROUP BY 1
        ), p AS ({poss})
        SELECT v, CAST(count(*) FILTER (
                 WHERE ((SELECT wd FROM w WHERE wi = p.pos // 64) >> CAST(p.pos % 64 AS INTEGER)) & 1 = 1
               ) AS INTEGER) = {k} AS h
        FROM p GROUP BY v
    """).fetchall()
    want = {(v,): h for v, h in rows}
    assert got == want


def test_bloom_probe_streaming_parity(spark, tmp_path):
    """The probe is a stateless constant-folded expression, so the SAME
    words drive identical verdicts under readStream (north rule: one
    compiled plan, batch and streaming) — the shape of a live
    contamination screen on an ingest stream."""
    d = str(tmp_path / "bloom_docs")
    docs = spark.range(400).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc")
    )
    docs.write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)
    ref = batch.where(F.expr("substring(doc, 2) % 4 = 0")).select(
        F.col("doc").alias("r")
    )
    m, k = bloom_params(100, 0.01)
    words = bloom_words(ref, "r", m, k)

    def screen(df):
        return df.select(
            "doc", bloom_probe_expr(F.col("doc"), words, k).alias("hit")
        )

    want = sorted(tuple(r) for r in screen(batch).collect())
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        screen(stream)
        .writeStream.format("memory").queryName("q_bloom_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bl"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM q_bloom_stream").collect()
    )
    assert got == want


def test_probe_literal_ceiling_guard():
    from jsonschema_spark.operators.bloom import MAX_PROBE_WORDS

    with pytest.raises(ValueError, match="plan-literal ceiling"):
        bloom_probe_expr(F.lit("x"), [0] * (MAX_PROBE_WORDS + 1), 3)


def test_suite_bloom_screen_check(spark):
    """Declarative suite integration: the bloom_screen check type
    bounds the (over-approximate) contamination hit rate against a
    reference table, join-free on the scan side."""
    from jsonschema_spark.operators.suite import run_suite

    docs = spark.range(400).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc")
    )
    ref = docs.where("substring(doc, 2) % 5 = 0").select(
        F.col("doc").alias("bench_doc")
    )
    cfg = {
        "checks": [
            {"name": "contam_strict", "type": "bloom_screen",
             "table": "docs", "column": "doc",
             "reference_table": "bench", "reference_column": "bench_doc",
             "fpr": 0.001, "max_hit_rate": 0.0},
            {"name": "contam_loose", "type": "bloom_screen",
             "table": "docs", "column": "doc",
             "reference_table": "bench", "reference_column": "bench_doc",
             "fpr": 0.001, "max_hit_rate": 0.25},
        ]
    }
    rows = {r["check_name"]: r for r in run_suite(
        {"docs": docs, "bench": ref}, cfg).collect()}
    # 20% true members (+ tiny FPR) -> strict fails, loose passes
    assert rows["contam_strict"]["status"] == "fail"
    assert rows["contam_loose"]["status"] == "pass"
    assert 0.199 <= rows["contam_strict"]["metric"] <= 0.24
