"""Streaming semantics beyond the single-batch oracle checks:
multi-batch incremental state evolution (maxFilesPerTrigger=1) and
stream-batch parity for the windowed aggregation."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from pipeline_query_engine_demo_spark import streaming
from pipeline_query_engine_demo_spark.sources.catalog import load_table


def _chunked_events_dir(spark, sf_dir, tmp_path, n_chunks=3) -> str:
    """Re-chunk the events fixture into n parquet files so the file
    stream source sees multiple micro-batches."""
    out = str(tmp_path / "events_chunks")
    events = load_table(spark, sf_dir, "events")
    events.repartition(n_chunks).write.mode("overwrite").parquet(out)
    return out


def test_stateful_counts_accumulate_across_batches(spark, sf_dir, tmp_path):
    src = _chunked_events_dir(spark, sf_dir, tmp_path)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    result = streaming.run_to_memory(streaming.stateful_user_counts(stream), "update")
    # update mode emits one row per key per batch it appears in; the
    # LAST emission per key must equal the batch-side total count.
    final = (
        result.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    )
    expected = (
        load_table(spark, sf_dir, "events").groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    )
    joined = final.join(expected, "user_id")
    assert joined.count() == expected.count()
    assert joined.filter(F.col("n_events") != F.col("n")).count() == 0
    # and at least one key must have been emitted in >1 batch (proves
    # incremental state, not a single-batch degenerate run)
    multi = result.groupBy("user_id").count().filter(F.col("count") > 1)
    assert multi.count() > 0


def test_stream_batch_parity_tumbling(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.windows import tumbling_window_counts

    events = streaming.read_events_stream(spark, sf_dir)
    streamed = streaming.run_to_memory(streaming.tumbling_counts(events), "complete")
    batch = tumbling_window_counts(spark, sf_dir)
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
