"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``          — exact brute force: broadcast the (small) query
  set against the corpus; one scan, no shuffle of the corpus, window top-k
  partitioned by query. The correctness baseline.
- ``lsh_ann_topk``         — scale path: random-hyperplane LSH. Plane
  signs come from xxhash64(plane || dim) so planes are deterministic and
  regenerable on any executor (no random state shipped). Candidates =
  bucket collisions (multi-probe via bands), ranked exactly within bucket.
- ``ivf_topk``             — IVF-style alternative: corpus is bucketed by
  nearest of K deterministic "centroid" vectors; queries probe the
  ``n_probe`` nearest buckets only.

Vector math is pure Column expressions (zip_with/aggregate) — JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    a, b = _to_double(a), _to_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, cos, rank) — exact top-k by cosine.

    ``queries``: (query_id, embedding). Broadcast side = queries (small);
    the corpus streams through map-side; the only shuffle is the per-query
    top-k window over corpus_rows x n_queries candidates (cut k-fold by a
    cheap pre-rank if needed).
    """
    q = F.broadcast(queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv")))
    joined = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(q)
    scored = joined.select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def _plane_weights(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random weights in [-1, 1), computed ONCE on the
    driver (md5-derived). Embedding them as literals matters at scale:
    expression-side hash derivation sits inside a higher-order function that
    Catalyst does not constant-fold, so it would re-hash dim values per ROW."""
    import hashlib

    out = []
    for d in range(dim):
        h = int.from_bytes(
            hashlib.md5(f"p{plane}|{d}".encode()).digest()[:8], "little"
        )
        out.append((h % 2000003 - 1000001.5) / 1000001.5)
    return out


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Sign of <vec, r_plane> with driver-computed literal plane weights."""
    weights = F.array(*[F.lit(w) for w in _plane_weights(plane, dim)])
    return (dot(_to_double(vec), weights) > 0).cast("int")


def lsh_signature(vec: Column, n_planes: int, dim: int) -> Column:
    """int bucket id: sign bits of ``n_planes`` random hyperplanes."""
    sig = F.lit(0)
    for p in range(n_planes):
        sig = sig * 2 + _hyperplane_sign(vec, p, dim)
    return sig


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: rank exactly within LSH bucket collisions.

    ``n_tables`` independent sign-LSH tables (plane sets offset per table);
    a candidate collides in >= 1 table. Recall grows with tables, cost with
    bucket width (2^-n_planes of the corpus per bucket in expectation).
    """
    def with_buckets(df: DataFrame, idc: str) -> DataFrame:
        out = df
        for t in range(n_tables):
            planes0 = t * n_planes
            sig = F.lit(t)  # disambiguate tables in one join key space
            for p in range(n_planes):
                sig = sig * 2 + _hyperplane_sign(F.col(vec_col), planes0 + p, dim)
            out = out.withColumn(f"_b{t}", sig)
        buckets = F.array(*[F.col(f"_b{t}") for t in range(n_tables)])
        return out.select(idc, vec_col, F.explode(buckets).alias("bucket")).distinct()

    c = with_buckets(corpus.select(id_col, vec_col), id_col)
    q = with_buckets(queries.select(query_id_col, vec_col), query_id_col).withColumnRenamed(
        vec_col, "_qv"
    )
    cand = c.join(F.broadcast(q), "bucket").select(
        query_id_col, id_col, F.col(vec_col), F.col("_qv")
    ).distinct()
    scored = cand.select(
        query_id_col, id_col, F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("cos")
    ).groupBy(query_id_col, id_col).agg(F.max("cos").alias("cos"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def _centroid(cell: int, dim: int) -> Column:
    """Deterministic pseudo-centroid as a literal array (at real scale these
    come from a k-means sample; hash-derived here so any executor can
    reproduce them — computed once on the driver, never per row)."""
    import hashlib

    vals = []
    for d in range(dim):
        h = int.from_bytes(
            hashlib.md5(f"c{cell}|{d}".encode()).digest()[:8], "little"
        )
        vals.append((h % 1999993 - 999996.5) / 999996.5)
    return F.array(*[F.lit(v) for v in vals])


def _cell_sims(vec_col: str, n_cells: int, dim: int) -> Column:
    """array<struct<sim,cell>> of similarities to every centroid.

    Linear expression size; array_max / array_sort pick cells, unlike a
    chained-when argmax (quadratic) would."""
    return F.array(
        *[
            F.struct(
                F.round(cosine(F.col(vec_col), _centroid(cell, dim)), 9).alias("sim"),
                F.lit(cell).alias("cell"),
            )
            for cell in range(n_cells)
        ]
    )


def ivf_assign(
    df: DataFrame, n_cells: int = 16, dim: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """Assign each vector to its nearest deterministic pseudo-centroid."""
    return df.withColumn(
        "ivf_cell", F.array_max(_cell_sims(vec_col, n_cells, dim)).getField("cell")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via IVF probing: the corpus is bucketed ONCE by
    nearest centroid; each query scores only the vectors in its ``n_probe``
    nearest cells (exact cosine rank within the probed subset).

    With ``n_probe == n_cells`` this degenerates to exact search — the
    recall/cost dial the scale path needs (probe fraction ~ n_probe/n_cells
    of the corpus per query). The join is corpus-bucket x broadcast query
    probes: the corpus is never reshuffled per query.
    """
    c = ivf_assign(corpus.select(id_col, vec_col), n_cells, dim, vec_col)
    probe_cells = F.transform(
        F.slice(F.reverse(F.array_sort(_cell_sims(vec_col, n_cells, dim))), 1, n_probe),
        lambda s: s.getField("cell"),
    )
    q = (
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qv"),
            probe_cells.alias("_cells"),
        )
        .select(query_id_col, "_qv", F.explode("_cells").alias("ivf_cell"))
    )
    cand = c.join(F.broadcast(q), "ivf_cell")
    scored = cand.select(
        query_id_col, id_col, F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )
