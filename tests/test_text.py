"""Text expression library edge cases: short-document shingles,
fingerprint permutation behavior, quality-score bounds."""

from __future__ import annotations

import pyspark.sql.functions as F

from pipeline_query_engine_demo_spark.functions import text


def _one(spark, text_value, col):
    df = spark.createDataFrame([(text_value,)], "text string")
    return df.select(col.alias("v")).collect()[0].v


def test_shingles_short_doc_empty(spark):
    assert _one(spark, "one two", text.shingles("text", 3)) == []
    assert _one(spark, "one two three", text.shingles("text", 3)) == ["one two three"]
    assert _one(spark, "a b c d", text.shingles("text", 3)) == ["a b c", "b c d"]


def test_fingerprints_permutation(spark):
    fp = lambda t: _one(spark, t, text.doc_fingerprint("text"))
    rh = lambda t: _one(spark, t, text.rolling_content_hash("text"))
    # word-set equal, different order: set fingerprint collides,
    # rolling hash distinguishes
    assert fp("a b c") == fp("c b a") == fp("a a b c")
    assert rh("a b c") != rh("c b a")
    assert rh("a b c") == rh("a b c")


def test_quality_score_bounds(spark, sf_dir):
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select(text.quality_score("text", ["the", "a"]).alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).collect()[0]
    assert 0.0 <= stats.lo <= stats.hi <= 1.0
