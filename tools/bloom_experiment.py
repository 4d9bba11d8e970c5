"""Shuffle-bytes evidence for runtime bloom-filter join pruning.

Runs the bloom_filter_pruned_join aggregation twice — once with
InjectRuntimeFilter enabled (the registered query's confs) and once
with it disabled — and measures actual shuffle WRITE bytes via the
AppStatusStore stage metrics (cumulative across the app; deltas are
taken around each run). The bloom filter's promise is map-side row
pruning BEFORE the exchange, so shuffle write is the honest meter —
scan bytes are identical in both variants (the filter sits above the
scan, not inside it; that side is DPP's job, plans/partitioned.py).

Both variants must return identical results (asserted): bloom false
positives are re-checked by the join, so the filter can only shrink
the exchange, never change the answer.

Usage: python tools/bloom_experiment.py [sf_dir]
  e.g. the x100 replica built by scale_experiment.py:
       python tools/bloom_experiment.py /tmp/spark_graft_scale100
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pipeline_query_engine_demo_spark.plans import relational
    from pipeline_query_engine_demo_spark.session import get_spark

    spark = get_spark("bloom-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm
    store = spark.sparkContext._jsc.sc().statusStore()

    def shuffle_write_bytes() -> int:
        # AppStatusStore.stageList(statuses, details, withSummaries,
        # unsortedQuantiles, taskStatus) — cumulative across all stages
        # retained so far; callers take deltas.
        stages = store.stageList(
            jvm.java.util.ArrayList(),
            False,
            False,
            spark.sparkContext._gateway.new_array(jvm.double, 0),
            jvm.java.util.ArrayList(),
        )
        it, total = stages.iterator(), 0
        while it.hasNext():
            total += it.next().shuffleWriteBytes()
        return total

    def agg():
        return (
            relational.build_bloom_filter_join(spark, SF_DIR)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)")
                )
                .cast("double")
                .alias("revenue"),
            )
        )

    variants = {
        "bloom_on": relational.BLOOM_FILTER_CONFS,
        "bloom_off": {
            **relational.BLOOM_FILTER_CONFS,
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
        },
    }
    out: dict[str, dict] = {}
    results: dict[str, list] = {}
    for label, confs in variants.items():
        prev = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            df = agg()
            df.write.format("noop").mode("overwrite").save()  # warmup
            b0 = shuffle_write_bytes()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            b1 = shuffle_write_bytes()
            plan = df._jdf.queryExecution().executedPlan().toString()
            results[label] = sorted(map(tuple, agg().collect()))
            out[label] = {
                "shuffle_write_bytes": b1 - b0,
                "wall_s": round(wall, 3),
                "might_contain_in_plan": "might_contain" in plan,
            }
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    assert out["bloom_on"]["might_contain_in_plan"]
    assert not out["bloom_off"]["might_contain_in_plan"]
    assert results["bloom_on"] == results["bloom_off"], "results diverged"
    summary = {
        "sf_dir": SF_DIR,
        **out,
        "results_identical": True,
        "shuffle_bytes_ratio": round(
            out["bloom_on"]["shuffle_write_bytes"]
            / max(1, out["bloom_off"]["shuffle_write_bytes"]),
            4,
        ),
    }
    print(json.dumps(summary, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
