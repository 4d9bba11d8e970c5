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


def test_jaro_winkler_matches_duckdb_exactly(spark, sf_dir):
    """The pandas-UDF Jaro-Winkler must equal DuckDB's built-in
    float-for-float on EVERY blocked candidate pair — this exact
    equality is what entitles the linkage query's oracle to use
    jaro_winkler_similarity."""
    import duckdb

    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    grams = names.select(
        "name",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(name) - 2),"
                    " i -> substring(name, i, 3))"
                )
            )
        ).alias("gram"),
    )
    a = grams.select(F.col("name").alias("name_a"), "gram")
    b = grams.select(F.col("name").alias("name_b"), "gram")
    cand = (
        a.join(b, "gram")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    got = {
        (r["name_a"], r["name_b"]): r["jw"]
        for r in cand.withColumn(
            "jw", text.jaro_winkler("name_a", "name_b")
        ).collect()
    }
    assert len(got) > 100
    con = duckdb.connect()
    for (na, nb), jw in got.items():
        expect = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [na, nb]
        ).fetchone()[0]
        assert jw == expect, (na, nb, jw, expect)
