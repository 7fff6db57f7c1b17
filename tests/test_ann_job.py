"""ANN index job (jobs/ann_index_job.py): build a PQ/IVF index table +
sidecar, query it with ADC; full probe must equal flat PQ over the same
codebooks."""

import json
import os

from pyspark.sql import functions as F

from jobs.ann_index_job import SIDECAR, build, query
from jsonschema_spark.operators.similarity import pq_topk
from tests.conftest import SF_DIR

EMB = f"{SF_DIR}/embeddings.parquet"


def test_ann_build_and_full_probe_query(spark, tmp_path):
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "hits")
    stats = build(spark, EMB, idx, m=8, k_per_space=8, n_cells=4,
                  sample_size=128, iters=3)
    assert stats["indexed_rows"] == spark.read.parquet(EMB).count()
    # layout: partitioned by coarse cell -> probing = partition pruning
    cells = [d for d in os.listdir(idx) if d.startswith("ivf_cell=")]
    assert 1 <= len(cells) <= 4
    with open(os.path.join(idx, SIDECAR)) as f:
        meta = json.load(f)
    assert meta["m"] == 8 and len(meta["codebooks"]) == 8

    qstats = query(spark, idx, EMB, out, k=5, n_probe=4, query_limit=3)
    assert qstats["hits"] == 15
    got = spark.read.parquet(out)
    # full probe == flat PQ with the sidecar codebooks
    emb = spark.read.parquet(EMB)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    flat = pq_topk(emb, queries, meta["codebooks"], k=5).collect()
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"],  # noqa: E731
                     r["approx_dist"])
    assert sorted(map(key, got.collect())) == sorted(map(key, flat))


def test_ann_query_partial_probe_subset(spark, tmp_path):
    idx = str(tmp_path / "idx2")
    build(spark, EMB, idx, m=4, k_per_space=8, n_cells=4,
          sample_size=128, iters=3)
    qstats = query(spark, idx, EMB, None, k=5, n_probe=1, query_limit=3)
    # partial probe still returns a full top-k per query (cells hold >=k)
    assert qstats["hits"] == 15
