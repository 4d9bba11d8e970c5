"""Invariants for the graph / sampling / layout queries that the oracle
hash can't express: PageRank mass conservation and Python-replicated
reference math for the A-ES keys and the Morton curve."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F
from pyspark.sql import Window

from pipeline_query_engine_demo_spark.operators.graph import pagerank
from pipeline_query_engine_demo_spark.plans.analytics import (
    weighted_sample_docs,
    zorder_curve_events,
)
from pipeline_query_engine_demo_spark.sources.catalog import load_table


def test_pagerank_mass_and_ordering(spark):
    """On a path graph a<->b<->c (symmetric), total rank mass stays ~1
    and the center node outranks the leaves."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], "src string, dst string"
    )
    ranks = {r.node: r.pagerank for r in pagerank(edges, iterations=10).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6, ranks
    assert ranks["b"] > ranks["a"] == ranks["c"], ranks


def test_weighted_sample_keys_match_python(spark, sf_dir):
    got = weighted_sample_docs(spark, sf_dir).collect()
    assert len(got) == 10
    for r in got:
        h = hashlib.md5(f"{r.doc_id}|wsample-v1".encode()).hexdigest()
        u = int(h[:13], 16) / float(16**13)
        expect = round(round(math.log(u), 9) / r.n_chars, 12)
        assert abs(r.es_key - expect) < 1e-12, (r.doc_id, r.es_key, expect)
    # keys are negative (ln u < 0) and sorted descending
    keys = [r.es_key for r in got]
    assert keys == sorted(keys, reverse=True)
    assert all(k < 0 for k in keys)


def test_zorder_curve_roundtrips(spark, sf_dir):
    rows = zorder_curve_events(spark, sf_dir).limit(200).collect()
    assert rows
    for r in rows:
        x = sum(((r.zvalue >> (2 * i)) & 1) << i for i in range(8))
        y = sum(((r.zvalue >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (x, y) == (r.x, r.y), (r.event_id, r.zvalue, x, y, r.x, r.y)


def test_zorder_locality_beats_single_key(spark, sf_dir):
    """The point of the curve: range-bucketing by zvalue keeps BOTH
    dimensions' spread per bucket small, while bucketing by x alone
    leaves y unconstrained. Compare mean per-bucket y-range."""
    df = zorder_curve_events(spark, sf_dir)
    zb = (
        df.withColumn("bucket", F.ntile(64).over(Window.orderBy("zvalue")))
        .groupBy("bucket")
        .agg((F.max("y") - F.min("y")).alias("spread"))
        .agg(F.avg("spread"))
        .first()[0]
    )
    xb = (
        df.withColumn("bucket", F.ntile(64).over(Window.orderBy("x", "event_id")))
        .groupBy("bucket")
        .agg((F.max("y") - F.min("y")).alias("spread"))
        .agg(F.avg("spread"))
        .first()[0]
    )
    assert zb < xb, (zb, xb)
