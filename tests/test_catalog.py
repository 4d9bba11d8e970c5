"""Catalog and session-factory contracts."""

from __future__ import annotations

import pytest

from pipeline_query_engine_demo_spark.sources.catalog import TABLES, load_table, register_views


def test_unknown_table_rejected(spark, sf_dir):
    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, sf_dir, "nope")


def test_events_ts_is_microsecond_timestamp(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    row = df.selectExpr("max(ts) AS m").collect()[0]
    assert row.m.year >= 2024


def test_register_views_covers_all_tables(spark, sf_dir):
    tables = register_views(spark, sf_dir)
    assert set(tables) == set(TABLES)
    assert spark.sql("SELECT COUNT(*) AS n FROM region").collect()[0].n > 0


def test_events_loader_handles_both_timestamp_generations(spark, tmp_path):
    """The fixture has shipped with two ts physical types (ns, then µs
    NTZ). The loader must normalize BOTH to a session-zoned timestamp:
    the ns generation by BIGINT read + integer truncation (exactly
    DuckDB's ns→µs narrowing), the µs generation by an NTZ cast. The
    current testdata only exercises one branch, so this test synthesizes
    the other generation and pins its semantics against regression."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import pyspark.sql.functions as F

    ns_dir = tmp_path / "gen_ns"
    ns_dir.mkdir()
    # 1.5 µs past the second: truncation (not rounding) must keep .000001
    ts_ns = pa.array([1704067200_000_001_500], pa.timestamp("ns"))
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": ts_ns,
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"]),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(table, str(ns_dir / "events.parquet"))

    df = load_table(spark, str(ns_dir), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = df.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s")).collect()[0].s
    assert got == "2024-01-01 00:00:00.000001"
