"""connected_components / duplicate_clusters: transitive duplicate-cluster
resolution over near-dup pair lists (large-star/small-star contraction).

Pins: known-graph component labels, O(log^2 n) convergence on a long path
(the case that defeats plain min-label propagation), agreement with a
brute-force union-find on random graphs, and the end-to-end
duplicate_clusters policy over planted near-duplicate documents.
"""

import random

from pyspark.sql import functions as F

from jsonschema_spark.operators import dedup


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = dedup.connected_components(df, **kw)
    return sorted((r["node"], r["component"]) for r in out.collect())


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((n, find(n)) for n in parent)


def test_chain_triangle_and_isolated_pair(spark):
    edges = [(2, 1), (2, 3), (3, 4), (10, 11), (5, 6), (6, 7), (5, 7), (8, 8)]
    got = _cc(spark, edges)
    # (8,8) is a self-loop: dropped; singletons never enter the edge list
    assert got == [
        (1, 1), (2, 1), (3, 1), (4, 1),
        (5, 5), (6, 5), (7, 5),
        (10, 10), (11, 10),
    ]


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.connected_components(df).count() == 0


def test_long_path_converges_in_few_rounds(spark):
    # a 200-node path has diameter 199: min-label propagation would need
    # ~200 rounds; star contraction must finish well inside max_iterations=12
    edges = [(i, i + 1) for i in range(200)]
    got = _cc(spark, edges, max_iterations=12)
    assert got == [(i, 0) for i in range(201)]


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for _ in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(90)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        assert _cc(spark, edges) == _union_find(edges)


def test_duplicate_clusters_planted_chain(spark):
    # A<->B and B<->C are near-dups (one-token edits of a 12-token base);
    # A<->C differ in two tokens but all three must land in ONE cluster
    # via transitivity. D is unrelated.
    base = "the quick brown fox jumps over the lazy dog near the riverbank"
    docs = [
        (1, base),
        (2, base.replace("quick", "swift")),
        (3, base.replace("quick", "swift").replace("lazy", "idle")),
        (4, "completely different content about spark execution plans " * 2),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup.duplicate_clusters(df, threshold=0.3, method="jaccard")
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1}
    # survivor policy: keep doc_id == cluster_id -> exactly one survivor
    survivors = {d for d, c in got.items() if d == c}
    assert survivors == {1}


def test_components_output_is_a_fixpoint(spark):
    # running the contraction on the star edges it emits must be a no-op
    edges = [(2, 1), (2, 3), (3, 4), (10, 11)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    comp = dedup.connected_components(df)
    stars = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("id_a"), F.col("component").alias("id_b")
    )
    again = dedup.connected_components(stars, max_iterations=3)
    assert sorted(map(tuple, comp.collect())) == sorted(map(tuple, again.collect()))
