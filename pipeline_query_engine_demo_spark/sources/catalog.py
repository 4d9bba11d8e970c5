"""Fixture-table catalog.

The reference's only source is an in-memory row vector scanned in
1024-row morsels (``src/releation/mod.rs:11-26``,
``src/executor/mod.rs:250-276``). Here the source layer is
``spark.read.parquet`` — Spark's vectorized Parquet reader gives the
columnar morsels, partition splitting, predicate/projection pushdown, and
(on a cluster) data-local scheduling for free.

Scale notes (100 TB):
- Scans are defined lazily per table so Catalyst prunes columns and pushes
  filters into the Parquet footer — callers must NOT ``.cache()`` whole
  tables.
- ``load_tables`` never materializes anything; registering temp views
  keeps the SQL and DataFrame entry points over the same lazy scans.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: Every fixture table the driver generates (TESTDATA.md). Order matters
#: only for humans: dimensions first, facts, then the LLM-pipeline corpora.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy Parquet scan for one fixture table.

    ``events.ts`` has shipped in two fixture generations: nanosecond
    Parquet (SURVEY.md §7 risk 5), which Spark 4 refuses to read as a
    timestamp — we read it as a nanos BIGINT (legacy flag, set at
    runtime so it works on any caller's session) and truncate to
    microseconds with integer division (truncation, not rounding,
    because that is exactly what DuckDB does when it narrows ns → µs) —
    and, in the current generation, plain µs timestamps with
    ``isAdjustedToUTC=false``, which Spark's NTZ inference surfaces as
    TIMESTAMP_NTZ. Every timestamp column (events.ts, o_orderdate,
    l_shipdate) is normalized to the session-zoned TIMESTAMP type the
    engine was built against: with the session in UTC the NTZ→LTZ cast
    is wall-clock-identical, and several APIs (streaming watermarks on
    schema-declared sources, mixed NTZ/LTZ comparisons) only accept the
    zoned type. The cast is a zero-cost projection — pushdown and
    pruning on the remaining columns are unaffected.

    The streaming twin of the ts rules (ns-div-1000 + NTZ→LTZ for the
    declared-schema stream readers) is
    ``streaming.windows._normalize_ts`` — change the two together.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All fixture tables as lazy DataFrames keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (for ``spark.sql`` queries) and
    return the DataFrames as well."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
