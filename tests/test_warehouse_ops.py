"""Invariants for the session-3 warehouse/curation operators: SCD2
interval algebra, Gopher filter rule agreement, fuzzy-match blocking
soundness, temperature sampling monotonicity."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from pipeline_query_engine_demo_spark.plans import curation, windows


def test_scd2_intervals_partition_each_users_timeline(spark, sf_dir):
    """Per user: versions are 1..k; exactly one open (is_current) row;
    each closed row's valid_to equals the next version's valid_from
    (half-open intervals tile the timeline with no gap or overlap);
    and no zero-length or negative interval exists."""
    out = windows.scd2_user_state_history(spark, sf_dir).cache()
    per_user = out.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.countDistinct("version").alias("d"),
        F.min("version").alias("lo"),
        F.max("version").alias("hi"),
        F.count(F.when(F.col("is_current"), 1)).alias("n_open"),
    )
    bad = per_user.filter(
        (F.col("n_open") != 1)
        | (F.col("lo") != 1)
        | (F.col("hi") != F.col("n"))
        | (F.col("d") != F.col("n"))
    )
    assert bad.count() == 0

    nxt = F.lead("valid_from").over(
        Window.partitionBy("user_id").orderBy("version")
    )
    stitched = out.withColumn("_next_from", nxt)
    assert (
        stitched.filter(
            F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("_next_from"))
        ).count()
        == 0
    )
    assert stitched.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") <= F.col("valid_from"))
    ).count() == 0
    # Consecutive versions never repeat a state (no-op updates collapse).
    prev_state = F.lag("state").over(
        Window.partitionBy("user_id").orderBy("version")
    )
    assert out.withColumn("_p", prev_state).filter(
        F.col("_p") == F.col("state")
    ).count() == 0


def test_gopher_kept_flag_agrees_with_signals(spark, sf_dir):
    """kept must be exactly the conjunction of the published rules
    evaluated on the emitted signal columns, and the filter must
    actually discriminate on this corpus (both outcomes present)."""
    out = curation.gopher_quality_filter(spark, sf_dir).cache()
    recomputed = (
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("stopword_hits") >= 2)
    )
    assert out.filter(F.col("kept") != recomputed).count() == 0
    kinds = {r.kept for r in out.select("kept").distinct().collect()}
    assert kinds == {True, False}


def test_fuzzy_blocking_finds_all_close_pairs(spark, sf_dir):
    """Soundness of trigram blocking on this corpus: every distinct-name
    pair with levenshtein <= 3 must appear in the blocked result (for
    names of length >= 4, edit distance <= 3 cannot destroy every
    shared trigram here — verify against the exhaustive all-pairs
    ground truth, which is feasible on the vocabulary-sized name set)."""
    out = curation.fuzzy_name_match_pairs(spark, sf_dir)
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    names = [r.name for r in load_table(spark, sf_dir, "part")
             .select(F.col("p_name").alias("name")).distinct().collect()]

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    truth = {
        (a, b)
        for i, a in enumerate(sorted(names))
        for b in sorted(names)[i + 1 :]
        if lev(a, b) <= 3
    }
    got = {(r.name_a, r.name_b) for r in out.collect()}
    assert got == truth


def test_temperature_sampling_keeps_tail_sources_whole(spark, sf_dir):
    """alpha < 1 must downsample larger sources more: realized keep
    rates should be monotonically non-increasing in source size, and
    the smallest source's keep_prob is exactly 1."""
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    out = curation.temperature_sample_by_source(spark, sf_dir)
    totals = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("total"))
    )
    stats = (
        out.groupBy("source")
        .agg(F.count("*").alias("kept"), F.max("keep_prob").alias("p"))
        .join(totals, "source")
        .orderBy(F.col("total").desc())
        .collect()
    )
    smallest = min(stats, key=lambda r: r.total)
    assert smallest.p == 1.0
    by_size = sorted(stats, key=lambda r: r.total)
    probs = [r.p for r in by_size]
    assert probs == sorted(probs, reverse=True)
