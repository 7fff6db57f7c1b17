"""spark-submit entry point: training-data curation pipeline over documents.

Composes the engine's operators into the standard pretraining-corpus flow —
schema validation -> quality gating -> exact dedup -> MinHash near-dedup —
and emits the curated corpus plus a JSON funnel report. Every stage is
DataFrame-native (SURVEY §2C + training-data operators): one scan feeds the
validation + profile projection, dedup removals are aggregates/anti-joins
(no windows over the full table), and the near-dup pair set rides a
broadcast anti-join back onto the corpus.

Cluster usage:

    zip -r jsonschema_spark.zip jsonschema_spark
    spark-submit --py-files jsonschema_spark.zip \\
        jobs/curate_documents_job.py \\
        --input <documents-parquet> --output /curated/docs \\
        --quality-min 0.5 --min-tokens 5 --jaccard-threshold 0.6

Sandbox smoke:

    python jobs/curate_documents_job.py \\
        --input /root/testdata/sf0.001/documents.parquet \\
        --output /tmp/curated_docs --master 'local[8]'

Two near-dedup survivor policies (deterministic, selectable):

- ``pairs`` (default): for every verified near-dup pair (id_a < id_b) the
  larger id is dropped — single-pass, no iteration. Docs that are only
  TRANSITIVELY related (a~b, b~c, but a,c never paired) can both survive.
- ``clusters``: resolve the transitive closure with
  ``dedup.connected_components`` (large-star/small-star, O(log^2 n)
  rounds) and keep exactly the min-id doc of every duplicate cluster —
  the strict one-survivor-per-group guarantee, at the cost of the
  iterative contraction.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from jsonschema_spark.operators import dedup, text as text_ops  # noqa: E402
from jsonschema_spark.operators.validate import validate  # noqa: E402

# The corpus contract: what a row must look like to enter curation at all.
DOCUMENTS_JSON_SCHEMA = {
    "$id": "https://example.com/documents.schema.json",
    "type": "object",
    "required": ["doc_id", "text", "lang", "source"],
    "properties": {
        "doc_id": {"type": "integer", "minimum": 0},
        "text": {"type": "string", "minLength": 1},
        "lang": {"enum": ["en", "es", "de", "fr", "zh", "und"]},
        "source": {"type": "string", "pattern": "^src\\d+$"},
        "n_chars": {"type": "integer", "minimum": 0},
    },
}


def curate(
    docs,
    quality_min: float = 0.5,
    min_tokens: int = 5,
    jaccard_threshold: float = 0.6,
    schema: dict | None = None,
    output: str | None = None,
    near_dedup_policy: str = "pairs",
    near_dup_method: str = "minhash",
):
    """Run the funnel; returns (curated DataFrame, stats dict).

    The input is scanned once into an annotated+profiled frame that is
    persisted — every later stage (counts, gates, dedup joins) reuses it.
    With ``output`` set, the curated corpus is written (parquet) BEFORE the
    cache is released, so the write reuses the persisted funnel instead of
    recomputing validate + profile + both dedup joins from scratch.
    """
    schema = schema or DOCUMENTS_JSON_SCHEMA
    ann = validate(docs, schema).annotated
    # profile columns are pure projections of `text` — computed in-line on
    # the annotated frame (a doc_id join would drop NULL ids and
    # cross-multiply duplicate ids, corrupting every funnel count)
    c = F.col("text")
    profiled = ann.select(
        "*",
        text_ops.token_count(c).alias("token_count"),
        text_ops.quality_score(c).alias("quality"),
        text_ops.fingerprint(c).alias("fingerprint"),
        text_ops.lang_id(c).alias("lang_pred"),
    ).persist()

    gate = (F.col("quality") >= quality_min) & (F.col("token_count") >= min_tokens)
    # one aggregate materializes the cache AND yields the first three funnel
    # counts (instead of three separate count() jobs over the cached frame)
    funnel = profiled.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.col("_valid").cast("long")).alias("n_valid"),
        F.sum((F.col("_valid") & gate).cast("long")).alias("n_gated"),
    ).collect()[0]
    n_input = funnel["n_input"]
    n_invalid = n_input - funnel["n_valid"]
    n_low_quality = funnel["n_valid"] - funnel["n_gated"]
    gated = profiled.filter(F.col("_valid") & gate)

    # exact dedup: one survivor per content fingerprint (min doc_id), as an
    # aggregate + semi-join — no global window, shuffle keyed by fingerprint
    survivors = (
        gated.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    )
    exact = gated.join(survivors, ["fingerprint", "doc_id"], "left_semi")
    n_exact_removed = n_input - n_invalid - n_low_quality - exact.count()

    # near-dedup pair generation: MinHash LSH (sub-quadratic scale default,
    # candidates verified by exact Jaccard) or the exact shingle inverted
    # index ('jaccard' — full recall, for audits / smaller corpora)
    if near_dup_method == "minhash":
        pairs = dedup.minhash_lsh_pairs(
            exact.select("doc_id", "text"), threshold=jaccard_threshold
        )
    elif near_dup_method == "jaccard":
        pairs = dedup.jaccard_pairs(
            exact.select("doc_id", "text"), threshold=jaccard_threshold
        )
    else:
        raise ValueError(f"unknown near_dup_method: {near_dup_method!r}")
    # No explicit broadcast hint: drop_ids is O(near-duplicate docs), which
    # at web scale can be billions of ids — far beyond broadcast limits. AQE
    # broadcasts when the runtime size is small and shuffles otherwise.
    if near_dedup_policy == "clusters":
        comp = dedup.connected_components(pairs)
        drop_ids = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
    elif near_dedup_policy == "pairs":
        drop_ids = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    else:
        raise ValueError(f"unknown near_dedup_policy: {near_dedup_policy!r}")
    curated = exact.join(drop_ids, "doc_id", "left_anti")
    n_near_removed = (
        n_input - n_invalid - n_low_quality - n_exact_removed - curated.count()
    )

    by_lang = {
        r["lang_pred"]: r["cnt"]
        for r in curated.groupBy("lang_pred").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    out_cols = [col for col in curated.columns if not col.startswith("_")]
    curated = curated.select(*out_cols)
    if output:
        curated.write.mode("overwrite").parquet(output)
    # all counts (and the optional output write) are materialized; release
    # the cache. Callers that iterate over the returned plan further should
    # persist the result themselves.
    profiled.unpersist()
    stats = {
        "input_rows": n_input,
        "schema_invalid": n_invalid,
        "low_quality": n_low_quality,
        "exact_dups_removed": n_exact_removed,
        "near_dups_removed": n_near_removed,
        "output_rows": n_input - n_invalid - n_low_quality - n_exact_removed - n_near_removed,
        "by_lang_pred": by_lang,
    }
    return curated, stats


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", help="curated corpus output dir (parquet)")
    p.add_argument("--schema", help="path to a JSON schema document "
                                    "(default: built-in documents schema)")
    p.add_argument("--quality-min", type=float, default=0.5)
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--jaccard-threshold", type=float, default=0.6)
    p.add_argument("--near-dup-method", choices=("minhash", "jaccard"),
                   default="minhash",
                   help="'minhash': LSH candidates + exact verify (scale "
                        "default); 'jaccard': exact inverted index")
    p.add_argument("--near-dedup-policy", choices=("pairs", "clusters"),
                   default="pairs",
                   help="'pairs': drop the larger id of each verified pair "
                        "(single-pass); 'clusters': connected-components "
                        "transitive closure, one survivor per cluster")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    builder = SparkSession.builder.appName("jsonschema-spark-curate-documents")
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(args.input)
    schema = None
    if args.schema:
        with open(args.schema) as f:
            schema = json.load(f)

    _curated, stats = curate(
        docs,
        quality_min=args.quality_min,
        min_tokens=args.min_tokens,
        jaccard_threshold=args.jaccard_threshold,
        schema=schema,
        output=args.output,
        near_dedup_policy=args.near_dedup_policy,
        near_dup_method=args.near_dup_method,
    )
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
