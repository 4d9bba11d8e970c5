"""Physical-layout and pushdown regression guards.

These pin the two scan-side properties the 100 TB design leans on:
sorted writes must actually produce disjoint per-file key ranges (the
footer stats every later scan prunes with), and timestamp filters must
keep reaching the Parquet scan as PushedFilters — the property the
NTZ-generation cast could silently break in a future refactor.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from pipeline_query_engine_demo_spark.sources.catalog import load_table


def test_sorted_layout_produces_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """repartitionByRange + sortWithinPartitions must yield files whose
    orderkey ranges do not overlap — the precondition for footer-stats
    file pruning. Verified from the actual Parquet metadata, not the
    plan."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "sorted")
    (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .repartitionByRange(4, "l_orderkey")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite")
        .parquet(out)
    )
    ranges = []
    for name in os.listdir(out):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, name)).metadata
        lo = min(
            md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    assert len(ranges) >= 2
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, f"overlapping file ranges: {ranges}"


def test_timestamp_filter_pushdown_survives_generation_handling(spark, sf_dir):
    """Filters on the normalized timestamp columns must still appear in
    the scan's PushedFilters — Catalyst rewrites the comparison against
    the NTZ scan column under the UTC session, and this test fails if a
    future change to the generation handling breaks that."""
    li = load_table(spark, sf_dir, "lineitem")
    plan = (
        li.filter(F.col("l_shipdate") >= "1994-01-01")
        .select("l_quantity")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]

    ev = load_table(spark, sf_dir, "events")
    plan2 = (
        ev.filter(F.col("ts") >= "2024-01-10")
        .select("event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pushed2 = plan2.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "ts" in pushed2
