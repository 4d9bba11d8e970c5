"""Hot-key stress for the dedup/ANN tier (round-4 verdict item 5).

The ×10/×30 replicas in SCALE.md are UNIFORM — every document and
vector keeps its own identity, so LSH buckets and IVF cells stay
balanced. Real 100 TB corpora are not like that: one boilerplate
template can account for a double-digit percent of all pages, and an
embedding corpus can collapse onto one dense region. This experiment
builds a deliberately skewed twin of the uniform ×10 replica:

- documents: every doc_id % 5 == 0 (20% of the corpus) has its text
  replaced by ONE shared boilerplate template → identical MinHash
  signatures and SimHash values, i.e. every LSH/band bucket the
  template touches holds ~20% of the corpus;
- embeddings: every vec_id % 2 == 0 (50% of the corpus) is replaced by
  a near-copy of the first one-hot IVF centroid (tiny deterministic
  jitter in coordinate 1) → one IVF cell holds >50% of all vectors and
  the sign-LSH/hyperplane buckets collapse the same way.

It then times the dedup/ANN queries on the uniform ×10 replica and the
skewed one, back-to-back in one session, and prints per-query ratios.
The design claim under test: the hot-bucket cap
(operators/dedup.DEFAULT_MAX_BUCKET_SIZE) and the nprobe/cells scan
bound keep wall time flat — skew shifts WHERE the work lands, the caps
bound HOW MUCH work exists.

Writes nothing to the repo; data in /tmp. Results are recorded in
SCALE.md. Usage: python tools/skew_experiment.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
UNIFORM = "/tmp/spark_graft_scale10"
SKEWED = "/tmp/spark_graft_skew10"
#: Optional query-name filter (argv[1:]) — subset runs against the
#: idempotently reused twins, for incremental SCALE.md rows.
ONLY = set(sys.argv[1:])

#: One boilerplate template — the "same cookie banner on 20% of the
#: web" scenario. Long enough to carry full shingle/MinHash signatures.
TEMPLATE = (
    "This website uses cookies to ensure you get the best experience. "
    "By continuing to browse the site you are agreeing to our use of "
    "cookies and to the terms of service. Please review our privacy "
    "policy for details about data retention, third party processors, "
    "and how to withdraw consent at any time."
)

QUERIES = [
    # dedup tier (text): hot LSH buckets, hot simhash bands
    "exact_dedup_docs",
    "near_dup_pairs_docs",
    "simhash_hamming_pairs",
    "incremental_dedup_docs",
    "dedup_funnel_report",
    # ANN tier (vectors): hot IVF cell, collapsed LSH buckets
    "cosine_topk_embeddings",
    "ann_lsh_topk_embeddings",
    "ann_hyperplane_topk_embeddings",
    "ivf_topk_embeddings",
    "ivfpq_topk_embeddings",
    "kmeans_train_embeddings",
    # round-6: the sketch family + star-contraction clustering — the
    # 20%-boilerplate template is their stress too (hot shingle sets,
    # a 10k-doc identical-text cluster in the pair graph).
    "kmv_distinct_shingles_by_source",
    "theta_sketch_shingle_overlap",
    "kmv_merge_global_distinct",
    "dedup_clusters_starcontract",
]


def build_skewed(spark) -> None:
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    os.makedirs(SKEWED, exist_ok=True)
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "lineitem",
        "orders",
        "events",
    ):
        link = os.path.join(SKEWED, f"{t}.parquet")
        if not os.path.lexists(link):
            src = os.path.join(UNIFORM, f"{t}.parquet")
            if not os.path.exists(src):
                src = os.path.join(BASE, f"{t}.parquet")
            os.symlink(src, link)
    dest = os.path.join(SKEWED, "documents.parquet")
    if not os.path.exists(dest):
        docs = load_table(spark, UNIFORM, "documents")
        skew = docs.withColumn(
            "text",
            F.when(F.col("doc_id") % 5 == 0, F.lit(TEMPLATE)).otherwise(
                F.col("text")
            ),
        ).withColumn("n_chars", F.length("text").cast("bigint"))
        skew.write.mode("overwrite").parquet(dest)
        print(f"built skewed documents: {skew.count()}", file=sys.stderr)
    dest = os.path.join(SKEWED, "embeddings.parquet")
    if not os.path.exists(dest):
        emb = load_table(spark, UNIFORM, "embeddings")
        dim = 64
        hot = F.array(
            *(
                [F.lit(1.0).cast("float")]
                + [((F.col("vec_id") % 997) / F.lit(1.0e6)).cast("float")]
                + [F.lit(0.0).cast("float")] * (dim - 2)
            )
        )
        skew = emb.withColumn(
            "embedding",
            F.when(F.col("vec_id") % 2 == 0, hot).otherwise(F.col("embedding")),
        )
        skew.write.mode("overwrite").parquet(dest)
        print(f"built skewed embeddings: {skew.count()}", file=sys.stderr)


def run(spark, sf_dir: str) -> dict[str, float]:
    from pipeline_query_engine_demo_spark import plans

    qs = plans.queries()
    # warmup
    qs["exact_dedup_docs"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    out = {}
    for name in QUERIES:
        if ONLY and name not in ONLY:
            continue
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        out[name] = round(time.perf_counter() - t0, 2)
    return out


def main() -> None:
    from pipeline_query_engine_demo_spark.session import get_spark

    spark = get_spark("skew-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(UNIFORM, "documents.parquet")):
        print(
            "uniform x10 replica missing — run tools/scale_experiment.py first",
            file=sys.stderr,
        )
        sys.exit(2)
    build_skewed(spark)
    uniform = run(spark, UNIFORM)
    skewed = run(spark, SKEWED)
    report = {
        name: {
            "uniform_x10_sec": uniform[name],
            "skewed_x10_sec": skewed[name],
            "ratio": round(skewed[name] / uniform[name], 2)
            if uniform[name] > 0
            else None,
        }
        for name in QUERIES
        if not ONLY or name in ONLY
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
