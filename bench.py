"""Benchmark harness: runs the headline query set at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with the noop sink
(``df.write.format("noop")``) so timings measure the whole plan —
scan, shuffles, joins, Python workers — without driver-collect or
disk-write overhead polluting the number.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Headline set: one per major engine area (reference replica, agg,
#: star join, window, as-of, time window, dedup pipeline, ANN, text,
#: UDF). Deliberately excludes the bounded-slice and streaming entries
#: (those are correctness surfaces, not throughput ones).
HEADLINE = [
    "flagship_filter_join_limit",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "window_topk_per_group",
    "asof_join_last_purchase",
    "tumbling_window_counts",
    "exact_dedup_docs",
    "near_dup_pairs_docs",
    "cosine_topk_embeddings",
    "ann_lsh_topk_embeddings",
    "ann_hyperplane_topk_embeddings",
    "ivf_topk_embeddings",
    "tfidf_top_terms",
    "text_stats_docs",
    "pandas_udf_grouped_agg_qty",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pipeline_query_engine_demo_spark import plans
    from pipeline_query_engine_demo_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = plans.queries()

    # Untimed warmup pass over the whole set: the first execution of
    # each path pays JVM JIT, codegen compilation, Python-worker
    # spin-up, and shuffle-service init — measured 2-3x inflation on
    # the heavy queries (e.g. the MinHash pipeline 8.7s cold vs 4.5s
    # steady on this box). The timed pass therefore reports
    # steady-state throughput, which is the number that scales to a
    # long-running cluster job and is stable round-over-round.
    for name in HEADLINE:
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
