"""Spark 4 Python Data Source API: batch partition parallelism and
streaming offset progression across restarts (checkpointed state)."""

from __future__ import annotations

import os
import tempfile

from pipeline_query_engine_demo_spark.sources.pydatasource import (
    STREAM_TOTAL as TOTAL,
    CounterStreamSource,
)


def test_batch_source_reads_all_partitions_in_parallel(spark):
    from pipeline_query_engine_demo_spark.sources.pydatasource import (
        SequenceFeedSource,
    )

    try:
        spark.dataSource.register(SequenceFeedSource)
    except Exception:
        pass
    df = spark.read.format("sequence_feed").option("n_rows", 500).load()
    assert df.rdd.getNumPartitions() == 8
    rows = df.orderBy("n").collect()
    assert len(rows) == 500
    assert rows[0].n == 0 and rows[-1].n == 499
    assert all(r.n_squared == r.n * r.n for r in rows)


def test_stream_source_resumes_offsets_across_restarts(spark):
    """Each availableNow run drains the reader's next prefetched batch;
    the checkpoint carries both the source offset and the aggregation
    state, so three restarts accumulate the full 100-row feed into the
    complete-mode counts — the incremental contract of a custom Python
    streaming source."""
    try:
        spark.dataSource.register(CounterStreamSource)
    except Exception:
        pass
    ckpt = os.path.join(tempfile.mkdtemp(prefix="pyds_ckpt_"), "c1")

    def run_once(name: str):
        agg = (
            spark.readStream.format("counter_feed")
            .load()
            .groupBy("grp")
            .count()
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.grp: r["count"] for r in spark.table(name).collect()}

    totals = {}
    for i in range(4):
        totals = run_once(f"t_counter_{i}")
        if sum(totals.values()) >= TOTAL:
            break
    assert sum(totals.values()) == TOTAL
    assert totals == {g: TOTAL // 5 for g in range(5)}


def test_counter_stream_source_drains_all_offsets(spark, sf_dir):
    """The streaming Python data source must deliver the full bounded
    sequence exactly once across its offset ranges: totals equal the
    closed form, and the offset-replay API is deterministic."""
    from pipeline_query_engine_demo_spark.plans.sinks import (
        python_stream_datasource_rollup,
    )
    from pipeline_query_engine_demo_spark.sources.pydatasource import (
        STREAM_TOTAL,
        CounterStreamReader,
    )

    rows = {r.grp: (r.n, r.total) for r in python_stream_datasource_rollup(spark, sf_dir).collect()}
    exp = {}
    for i in range(STREAM_TOTAL):
        n, t = exp.get(i % 5, (0, 0))
        exp[i % 5] = (n + 1, t + i)
    assert rows == exp
    # exactly-once replay contract: committed ranges re-read identically
    r = CounterStreamReader()
    a = list(r.readBetweenOffsets({"pos": 40}, {"pos": 80}))
    b = list(r.readBetweenOffsets({"pos": 40}, {"pos": 80}))
    assert a == b and len(a) == 40 and a[0] == (40, 0)
