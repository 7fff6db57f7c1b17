"""File-layout health (operators/layout.py): small-file profile +
min/max data-skipping effectiveness."""

from pyspark.sql import functions as F

from jsonschema_spark.operators.layout import file_profile, layout_report
from jsonschema_spark.sources.layouts import (
    LAYOUT_FILES,
    LAYOUT_N,
    materialized_layout,
)


def test_layout_report_range_vs_hash(spark):
    """The whole point: a range-clustered layout prunes (overlap 0), a
    hash-interleaved one doesn't (overlap 1) — same logical table."""
    rng, _ = materialized_layout(spark, "range")
    hsh, _ = materialized_layout(spark, "hash")
    r = layout_report(rng, "k").collect()[0]
    h = layout_report(hsh, "k").collect()[0]
    for rep in (r, h):
        assert rep["n_files"] == LAYOUT_FILES
        assert rep["n_rows"] == LAYOUT_N
        assert rep["total_pairs"] == LAYOUT_FILES * (LAYOUT_FILES - 1) // 2
        assert rep["avg_file_rows"] == LAYOUT_N / LAYOUT_FILES
    assert r["overlap_pairs"] == 0 and r["overlap_fraction"] == 0.0
    assert h["overlap_pairs"] == h["total_pairs"]
    assert h["overlap_fraction"] == 1.0
    assert r["row_skew"] == 1.0  # equal buckets by construction


def test_file_profile_shape(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("v")
    )
    d = str(tmp_path / "t")
    df.repartition(4).write.parquet(d)
    prof = file_profile(spark.read.parquet(d), ["k", "v"]).collect()
    assert len(prof) == 4
    assert sum(r["n_rows"] for r in prof) == 100
    assert all(r["file"].endswith(".parquet") and not
               r["file"].startswith("file:") for r in prof)
    assert len({r["file"] for r in prof}) == 4
    assert min(r["min_k"] for r in prof) == 0
    assert max(r["max_k"] for r in prof) == 99
    assert all(0 <= r["min_v"] <= r["max_v"] <= 9 for r in prof)


def test_layout_report_single_file(spark, tmp_path):
    """One file: no pairs, overlap_fraction 0 (nothing to prune against),
    not a division error."""
    d = str(tmp_path / "one")
    spark.range(10).select(F.col("id").alias("k")).coalesce(1).write.parquet(d)
    rep = layout_report(spark.read.parquet(d), "k").collect()[0]
    assert rep["n_files"] == 1
    assert rep["total_pairs"] == 0
    assert rep["overlap_fraction"] == 0.0
