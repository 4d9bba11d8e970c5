"""Planted-skew task-balance experiment for the dedup funnel (round-10
verdict item 6).

tools/skew_experiment.py shows hot-key WALL-TIME ratios; this one shows
TASK-LEVEL balance — the thing that actually melts a 1000-executor job:
one straggler task holding the stage. Fixture: the sf0.1 documents
corpus (5,000 distinct docs) plus ONE planted boilerplate cluster of
5,000 sha2-identical members (the "same cookie banner on half the
crawl" regime). 5,000 > DEFAULT_CLONE_GROUP_CAP (1,000), so the
contraction path must drop the mega-group WHOLE, and what remains of
the LSH/verify pipeline must stay task-balanced: the claim under test
is max task duration <= ~2x median in every substantial stage of
near_dup_pairs.

Counterfactual (--uncapped): the same fixture with
clone_group_cap=None / max_bucket_size=None, where the single clone
group legitimately expands to C(5000,2) ~ 12.5M intra-group pairs —
expect a dominant straggler and/or a wall-time blow-up. Run it to see
WHY the caps exist; the capped run is the production configuration.

Per-task quantiles come from the Spark UI REST API (taskSummary), the
only surface local mode exposes per-task durations on; the experiment
session enables the UI just for itself.

Writes nothing to the repo; fixture in /tmp. Results go in SCALE.md.
Usage: python tools/skew_taskbalance.py [--uncapped]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
FIXTURE = "/tmp/spark_graft_skew_cluster"
CLUSTER_SIZE = 5000
UNCAPPED = "--uncapped" in sys.argv

TEMPLATE = (
    "This website uses cookies to ensure you get the best experience. "
    "By continuing to browse the site you are agreeing to our use of "
    "cookies and to the terms of service. Please review our privacy "
    "policy for details about data retention, third party processors, "
    "and how to withdraw consent at any time."
)


def build_fixture(spark) -> None:
    dest = os.path.join(FIXTURE, "documents.parquet")
    if os.path.exists(dest):
        return
    os.makedirs(FIXTURE, exist_ok=True)
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    docs = load_table(spark, BASE, "documents")
    planted = spark.range(CLUSTER_SIZE).select(
        (F.col("id") + F.lit(10**9)).alias("doc_id"),
        F.lit(TEMPLATE).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("boilerplate").alias("source"),
        F.lit(len(TEMPLATE)).cast("long").alias("n_chars"),
    )
    docs.unionByName(planted).repartition(32).write.mode("overwrite").parquet(dest)
    print(f"fixture built: {FIXTURE} (5000 distinct + {CLUSTER_SIZE}-clone cluster)",
          file=sys.stderr)


def rest(app_url: str, path: str):
    with urllib.request.urlopen(app_url + path, timeout=10) as r:
        return json.load(r)


def task_balance(spark, group: str) -> list[dict]:
    """Per-stage (numTasks, median_ms, max_ms, ratio) for all stages of
    the jobs tagged with `group`, heaviest-by-max first."""
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    app = f"{ui}/api/v1/applications/{app_id}"
    stage_ids = set()
    for job in rest(app, "/jobs"):
        if job.get("jobGroup") == group:
            stage_ids.update(job["stageIds"])
    out = []
    for sid in sorted(stage_ids):
        try:
            summ = rest(app, f"/stages/{sid}/0/taskSummary?quantiles=0.0,0.5,1.0")
            stage = rest(app, f"/stages/{sid}/0")
        except Exception:
            continue  # skipped stage (reused exchange)
        dur = summ["duration"]
        med, mx = dur[1], dur[2]
        if stage["numCompleteTasks"] < 8 or mx < 200:
            continue  # too small to say anything about balance
        out.append(
            {
                "stage": sid,
                "tasks": stage["numCompleteTasks"],
                "median_ms": round(med),
                "max_ms": round(mx),
                "max_over_median": round(mx / max(med, 1.0), 2),
            }
        )
    out.sort(key=lambda r: -r["max_ms"])
    return out


def main() -> None:
    from pipeline_query_engine_demo_spark.session import get_spark

    spark = get_spark(
        "skew-taskbalance", **{"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_fixture(spark)

    from pipeline_query_engine_demo_spark.operators import dedup
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    docs = load_table(spark, FIXTURE, "documents")
    kwargs = (
        {"max_bucket_size": None, "clone_group_cap": None} if UNCAPPED else {}
    )
    group = "neardup-capped" if not UNCAPPED else "neardup-uncapped"
    spark.sparkContext.setJobGroup(group, "near_dup_pairs planted-skew run")
    t0 = time.perf_counter()
    pairs = dedup.near_dup_pairs(docs, "doc_id", "text", **kwargs)
    n_pairs = pairs.count()
    wall = round(time.perf_counter() - t0, 2)
    spark.sparkContext.setJobGroup("idle", "")

    stages = task_balance(spark, group)
    worst = max((s["max_over_median"] for s in stages), default=None)
    print(
        json.dumps(
            {
                "mode": "uncapped" if UNCAPPED else "capped",
                "cluster_size": CLUSTER_SIZE,
                "wall_sec": wall,
                "pairs_out": n_pairs,
                "worst_max_over_median": worst,
                "stages_by_max_task": stages[:8],
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
