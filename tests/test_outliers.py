"""Robust MAD outliers (operators/stats.robust_center_spread / mad_outliers)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.stats import mad_outliers, robust_center_spread


@pytest.fixture(scope="module")
def frame(spark):
    # 99 inliers around 10 +- 4, one gross outlier, one null
    rows = [(i, 10.0 + (i % 9) - 4.0) for i in range(99)]
    rows += [(99, 1000.0), (100, None)]
    return spark.createDataFrame(rows, "id long, v double")


def test_center_spread_exact(frame):
    r = robust_center_spread(frame, "v", exact=True).collect()[0]
    assert r["median"] == 10.0
    assert r["mad"] == 2.0  # |v-10| in {0..4}, median 2


def test_outlier_flagged(frame):
    out = mad_outliers(frame, "v", ["id"], k=3.5, exact=True).collect()
    assert [r["id"] for r in out] == [99]
    assert out[0]["modified_z"] == pytest.approx(0.6745 * 990 / 2.0, abs=1e-4)


def test_median_resistant_to_outlier(frame):
    """The defining property vs mean/stddev: the gross outlier does not
    move the center/spread enough to mask itself or flag inliers."""
    out = mad_outliers(frame, "v", ["id"], k=2.0, exact=True)
    ids = {r["id"] for r in out.collect()}
    assert 99 in ids
    assert all(i == 99 or not (i in ids) for i in range(99))  # k=2 > max inlier z=1.349


def test_zero_mad_yields_no_rows(spark):
    df = spark.createDataFrame([(i, 5.0) for i in range(10)] + [(10, 9.0)],
                               "id long, v double")
    # median 5, MAD 0 -> rule undefined; operator returns empty, not inf-z
    assert mad_outliers(df, "v", ["id"], exact=True).count() == 0


def test_sketch_close_to_exact(frame):
    ex = robust_center_spread(frame, "v", exact=True).collect()[0]
    ap = robust_center_spread(frame, "v", exact=False).collect()[0]
    assert ap["median"] == pytest.approx(ex["median"], abs=1.0)
    assert ap["mad"] == pytest.approx(ex["mad"], abs=1.0)
