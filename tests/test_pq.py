"""Product quantization (operators/similarity.py PQ family).

Differential strategy: encode and ADC are replayed in pure Python with the
same fixed left-associative IEEE op order the Column expressions use, so
codes and distances must match bit-for-bit; ranking replicates Spark's
HALF_UP round via decimal."""

from __future__ import annotations

import decimal
import random

from pyspark.sql import functions as F

from jsonschema_spark.operators.similarity import (
    pq_encode,
    pq_seed_codebooks,
    pq_topk,
    pq_train,
)
from tests.conftest import SF_DIR


def _sq_l2(vec, cent, start=0):
    tot = None
    for j, c in enumerate(cent):
        e = float(vec[start + j]) - c
        t = e * e
        tot = t if tot is None else tot + t
    return tot


def _codes(vec, books):
    d_s = len(books[0][0])
    out = []
    for s, book in enumerate(books):
        dists = [_sq_l2(vec, cent, s * d_s) for cent in book]
        out.append(dists.index(min(dists)))
    return out


def _round_half_up(x, places=6):
    q = decimal.Decimal(1).scaleb(-places)
    return float(decimal.Decimal(x).quantize(q, rounding=decimal.ROUND_HALF_UP))


def _adc(qvec, codes, books):
    d_s = len(books[0][0])
    tot = None
    for s, book in enumerate(books):
        t = _sq_l2(qvec, book[codes[s]], s * d_s)
        tot = t if tot is None else tot + t
    return tot


def _emb(spark, n=60):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") < n)
    )


def test_pq_encode_matches_pure_python_replay(spark):
    emb = _emb(spark)
    books = pq_seed_codebooks(emb, m=8, k_per_space=8)
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(emb, books).select("vec_id", "pq_code").collect()
    }
    raw = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    for vid, vec in raw.items():
        assert got[vid] == _codes(vec, books), vid


def test_pq_topk_matches_pure_python_adc(spark):
    emb = _emb(spark)
    books = pq_seed_codebooks(emb, m=8, k_per_space=8)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_topk(emb, queries, books, k=5).collect()
    raw = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    for qid in (0, 1, 2):
        scored = sorted(
            (
                (_round_half_up(_adc(raw[qid], _codes(vec, books), books)), vid)
                for vid, vec in raw.items()
            )
        )[:5]
        mine = [(r["approx_dist"], r["vec_id"]) for r in got if r["query_id"] == qid]
        assert [(d, v) for d, v in scored] == mine, qid


def test_pq_train_deterministic_and_reduces_error(spark):
    import numpy as np

    emb = _emb(spark, n=120)
    b1 = pq_train(emb, m=8, k_per_space=8, sample_size=100, iters=4)
    b2 = pq_train(emb, m=8, k_per_space=8, sample_size=100, iters=4)
    assert b1 == b2
    seeds = pq_seed_codebooks(emb, m=8, k_per_space=8)
    x = np.asarray(
        [r["embedding"] for r in emb.orderBy("vec_id").limit(100).collect()],
        dtype=np.float64,
    )

    def qerr(books):
        tot = 0.0
        d_s = len(books[0][0])
        for s, book in enumerate(books):
            xs = x[:, s * d_s : (s + 1) * d_s]
            c = np.asarray(book)
            tot += ((xs[:, None, :] - c[None, :, :]) ** 2).sum(-1).min(1).sum()
        return tot

    assert qerr(b1) <= qerr(seeds)


def test_pq_recall_on_clustered_data(spark):
    rng = random.Random(7)
    dim, m = 16, 4
    centers = [[10.0 * ((c >> b) & 1) for b in range(dim)] for c in range(4)]
    rows = [
        (
            i,
            [centers[i % 4][j] + rng.uniform(-0.5, 0.5) for j in range(dim)],
        )
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_train(df, m=m, k_per_space=8, sample_size=80, iters=5)
    queries = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_topk(df, queries, books, k=5).collect()
    raw = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in df.collect()}
    hits = total = 0
    for qid in range(4):
        exact = sorted(
            (sum((a - b) ** 2 for a, b in zip(raw[qid], vec)), vid)
            for vid, vec in raw.items()
        )[:5]
        exact_ids = {vid for _, vid in exact}
        pq_ids = {r["vec_id"] for r in got if r["query_id"] == qid}
        hits += len(exact_ids & pq_ids)
        total += 5
    assert hits / total >= 0.6, hits / total


def test_pq_dim_not_divisible_raises(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    import pytest

    with pytest.raises(ValueError):
        pq_seed_codebooks(df, m=2)
    with pytest.raises(ValueError):
        pq_train(df, m=2)


def test_ivfpq_full_probe_equals_flat_pq(spark):
    from jsonschema_spark.operators.similarity import ivfpq_topk, seed_centroids

    emb = _emb(spark)
    books = pq_seed_codebooks(emb, m=8, k_per_space=8)
    coarse = seed_centroids(emb, n_cells=4)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    flat = pq_topk(emb, queries, books, k=5).collect()
    full = ivfpq_topk(
        emb, queries, books, k=5, n_cells=4, n_probe=4, centroids=coarse
    ).collect()
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"], r["approx_dist"])  # noqa: E731
    assert sorted(map(key, full)) == sorted(map(key, flat))


def test_ivfpq_partial_probe_finds_cluster_neighbors(spark):
    from jsonschema_spark.operators.similarity import ivfpq_topk, kmeans_centroids

    rng = random.Random(11)
    dim, m = 16, 4
    centers = [[12.0 * ((c >> b) & 1) for b in range(dim)] for c in range(4)]
    rows = [
        (i, [centers[i % 4][j] + rng.uniform(-0.4, 0.4) for j in range(dim)])
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_train(df, m=m, k_per_space=8, sample_size=80, iters=5)
    coarse = kmeans_centroids(df, n_cells=4, sample_size=80, iters=5)
    queries = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivfpq_topk(
        df, queries, books, k=5, n_cells=4, n_probe=1, dim=dim, centroids=coarse
    ).collect()
    # probing ONE cell must still return same-cluster neighbors
    for r in got:
        assert r["vec_id"] % 4 == r["query_id"] % 4
    counts = {q: sum(1 for r in got if r["query_id"] == q) for q in range(4)}
    assert all(v == 5 for v in counts.values()), counts
