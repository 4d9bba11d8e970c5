"""Scan-bytes evidence for partition pruning (r11 verdict item 1).

Runs the three partitioned-layout queries (plans/partitioned.py) twice:
once against the Hive-partitioned replica (pruned scan) and once
against an UNPARTITIONED twin of the same derived table (full scan),
and measures actual bytes read from disk via Hadoop's
GlobalStorageStatistics — in local mode every task runs in the driver
JVM, so the "file"-scheme bytesRead counter is a faithful whole-query
scan meter (shuffle/spill use raw java.io, not Hadoop FS, and are
excluded by construction).

Both variants read the same dimension-side base tables, so the
partitioned-vs-twin delta isolates exactly what pruning saved. Each
variant runs twice and the SECOND run is reported (first pays codegen
warmup; the bytes figure is identical across runs, the wall figure is
steady-state).

Results go into SCALE.md ("Round 12: partition pruning" section).

Usage: python tools/dpp_experiment.py [sf_dir]
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
    from pipeline_query_engine_demo_spark.plans import partitioned
    from pipeline_query_engine_demo_spark.session import get_spark

    spark = get_spark("dpp-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm

    def bytes_read() -> int:
        s = jvm.org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics().get(
            "file"
        )
        return int(s.getLong("bytesRead")) if s is not None else 0

    # Partitioned replicas (written once per process by the plans module)
    # and unpartitioned twins carrying the same derived column.
    li_part = partitioned.lineitem_by_ship_month(spark, SF_DIR)
    ev_part = partitioned.events_by_day(spark, SF_DIR)
    li_twin = partitioned._replica_path(SF_DIR, "lineitem_twin_flat")
    ev_twin = partitioned._replica_path(SF_DIR, "events_twin_flat")
    if not os.path.exists(os.path.join(li_twin, "_SUCCESS")):
        spark.read.parquet(li_part).write.mode("overwrite").parquet(li_twin)
    if not os.path.exists(os.path.join(ev_twin, "_SUCCESS")):
        spark.read.parquet(ev_part).write.mode("overwrite").parquet(ev_twin)

    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    def q_static(fact):
        return (
            fact.filter(F.col("l_ship_month").between("1996-01", "1996-03"))
            .groupBy(F.col("l_ship_month").alias("ship_month"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def q_dpp_lineitem(fact):
        dim = (
            load_table(spark, SF_DIR, "orders")
            .filter(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.year("o_orderdate") == 1997)
            )
            .select(F.date_format("o_orderdate", "yyyy-MM").alias("ord_month"))
            .distinct()
        )
        return (
            fact.join(dim, fact["l_ship_month"] == dim["ord_month"])
            .groupBy(F.col("l_ship_month").alias("ship_month"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def q_dpp_events(fact):
        top_day = (
            fact.filter(F.col("event_type") == "purchase")
            .groupBy("event_date")
            .agg(F.count(F.lit(1)).alias("n_purch"))
            .orderBy(F.col("n_purch").desc(), F.col("event_date").asc())
            .limit(1)
            .select("event_date")
        )
        return (
            fact.join(top_day, "event_date")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    scenarios = [
        ("static_partition_prune_lineitem", q_static, li_part, li_twin),
        ("dpp_urgent_months_revenue", q_dpp_lineitem, li_part, li_twin),
        ("dpp_events_top_day_mix", q_dpp_events, ev_part, ev_twin),
    ]

    rows = []
    for name, q, part_path, twin_path in scenarios:
        out = {"query": name}
        for label, path in (("partitioned", part_path), ("unpartitioned", twin_path)):
            fact = spark.read.parquet(path)
            df = q(fact)
            df.write.format("noop").mode("overwrite").save()  # warmup
            b0 = bytes_read()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            b1 = bytes_read()
            res = sorted(map(tuple, q(spark.read.parquet(path)).collect()))
            out[label] = {
                "bytes_read": b1 - b0,
                "wall_s": round(wall, 3),
                "result_rows": len(res),
            }
            out.setdefault("_results", []).append(res)
        a, b = out.pop("_results")
        out["results_identical"] = a == b
        out["bytes_ratio"] = round(
            out["partitioned"]["bytes_read"]
            / max(1, out["unpartitioned"]["bytes_read"]),
            4,
        )
        rows.append(out)
        print(json.dumps(out))

    print("\nSUMMARY")
    for r in rows:
        print(
            f"{r['query']:38} pruned={r['partitioned']['bytes_read']:>12,}B "
            f"full={r['unpartitioned']['bytes_read']:>12,}B "
            f"ratio={r['bytes_ratio']:.3f} identical={r['results_identical']}"
        )
    assert all(r["results_identical"] for r in rows)
    spark.stop()


if __name__ == "__main__":
    main()
