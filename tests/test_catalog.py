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
