"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything delegates to the query registry
(``pipeline_query_engine_demo_spark.plans``): each module there
registers its (Spark builder, DuckDB oracle) pairs at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipeline_query_engine_demo_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's plan shape — filter → inner hash equi-join →
    offset/limit (/root/reference/src/main.rs:29-48) — over the real
    Parquet fixtures.
    """
    from pipeline_query_engine_demo_spark.plans.relational import flagship_filter_join_limit

    return flagship_filter_join_limit(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return plans.oracles()
