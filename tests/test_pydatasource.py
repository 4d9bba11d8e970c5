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
