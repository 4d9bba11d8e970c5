"""Privacy auditing and differential-privacy queries (split from plans/analytics.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession

from pipeline_query_engine_demo_spark.functions.rounding import (
    round_half_up,
    sql_round_half_up,
)
from pipeline_query_engine_demo_spark.plans.registry import query
from pipeline_query_engine_demo_spark.sources.catalog import load_table


#: Benford first-digit probabilities log10(1 + 1/d), pre-folded to
#: Python doubles once and embedded as literals in BOTH engines — the
#: nDCG-discount trick: no runtime log10 anywhere.
import math as _math  # noqa: E402


# BH wraps the permutation oracle verbatim as a CTE so the two stay in
# lockstep; registered post-hoc because the decorator runs before the
# wrapped oracle string is addressable.
from pipeline_query_engine_demo_spark.plans.registry import (  # noqa: E402
    REGISTRY as _REG,
)
import dataclasses as _dc  # noqa: E402

@query(
    "dp_noisy_counts",
    category="analytics",
    oracle=f"""
        WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                   FROM documents GROUP BY source),
        u AS (SELECT source, n,
                     CAST(CAST('0x' || substring(md5(source || '#dp'), 1, 15)
                          AS BIGINT) AS DOUBLE)
                         / 1152921504606846976.0 AS u
              FROM c),
        z AS (SELECT source, n,
                     CASE WHEN u < 0.5 THEN ln(2.0 * u)
                          ELSE -ln(2.0 - 2.0 * u) END AS noise
              FROM u)
        SELECT source, n,
               {sql_round_half_up("noise", 6)} AS noise,
               {sql_round_half_up("n + noise", 6)} AS noisy_n
        FROM z ORDER BY source
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy MECHANISM row — the release step after the
    k-anonymity / l-diversity / t-closeness audits: per-source counts
    with Laplace(b = 1/ε, ε = 1) noise via the inverse CDF
    (u < ½ → b·ln(2u), else −b·ln(2−2u)) over the repo's deterministic
    md5-uniform lattice (u = first-15-hex-digits / 2⁶⁰, keyed by the
    group value — so both engines draw the IDENTICAL noise and the gate
    hashes exactly; a production release swaps the seed for real
    entropy, changing nothing structural). The ln-of-data risk is the
    same one tfidf_top_terms owns.

    Scale: one combinable count per group + a map-side noise
    expression — the noise adds zero shuffles, which is the point of
    the Laplace mechanism at 100 TB (noise is per-GROUP, not
    per-row)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("source"), F.lit("#dp"))), 1, 15),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
        / F.lit(float(2**60))
    )
    noise = F.when(u < 0.5, F.log(F.lit(2.0) * u)).otherwise(
        -F.log(F.lit(2.0) - F.lit(2.0) * u)
    )
    return (
        counts.select("source", "n", noise.alias("_noise"))
        .select(
            "source",
            "n",
            round_half_up(F.col("_noise"), 6).alias("noise"),
            round_half_up(F.col("n") + F.col("_noise"), 6).alias("noisy_n"),
        )
        .orderBy("source")
    )


@query(
    "k_anonymity_audit",
    category="analytics",
    oracle=f"""
        WITH classes AS (
            SELECT c_mktsegment, c_nationkey,
                   CAST(COUNT(*) AS BIGINT) AS class_size
            FROM customer GROUP BY c_mktsegment, c_nationkey
        ),
        b AS (
            SELECT CASE WHEN class_size = 1 THEN '1'
                        WHEN class_size < 5 THEN '2-4'
                        WHEN class_size < 10 THEN '5-9'
                        ELSE '10+' END AS size_band,
                   class_size
            FROM classes
        ),
        tot AS (SELECT CAST(SUM(class_size) AS BIGINT) AS n_rows,
                       CAST(MIN(class_size) AS BIGINT) AS min_class
                FROM classes)
        SELECT b.size_band,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(b.class_size) AS BIGINT) AS n_rows,
               {sql_round_half_up(
                   'CAST(SUM(b.class_size) AS DOUBLE)'
                   ' / CAST(MAX(tot.n_rows) AS DOUBLE)', 6)} AS row_frac,
               CAST(MAX(tot.min_class) AS BIGINT) AS corpus_min_class
        FROM b CROSS JOIN tot
        GROUP BY b.size_band
        ORDER BY size_band
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier (market segment,
    nation): equivalence-class size bands with row fractions and the
    corpus-wide minimum class size — the privacy screen a dataset
    publisher runs before release (a '1' band row means unique
    quasi-identifier combinations exist; k-anonymity equals the
    corpus_min_class column). Pure integer counts; one ratio.

    Scale: one combinable aggregate on the quasi-identifier key, then
    a band-sized rollup with a broadcast 1-row total."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size")
    )
    band = (
        F.when(F.col("class_size") == 1, "1")
        .when(F.col("class_size") < 5, "2-4")
        .when(F.col("class_size") < 10, "5-9")
        .otherwise("10+")
    )
    tot = classes.agg(
        F.sum("class_size").cast("bigint").alias("n_rows_total"),
        F.min("class_size").cast("bigint").alias("min_class"),
    )
    b = classes.select(band.alias("size_band"), "class_size").crossJoin(
        F.broadcast(tot)
    )
    return (
        b.groupBy("size_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("class_size").cast("bigint").alias("n_rows"),
            round_half_up(
                F.sum("class_size").cast("double")
                / F.max("n_rows_total").cast("double"),
                6,
            ).alias("row_frac"),
            F.max("min_class").cast("bigint").alias("corpus_min_class"),
        )
        .orderBy("size_band")
    )


@query(
    "l_diversity_audit",
    category="analytics",
    oracle=f"""
        WITH classes AS (
            SELECT c_mktsegment, c_nationkey,
                   CAST(COUNT(*) AS BIGINT) AS class_size,
                   CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0)
                                            AS BIGINT)) AS BIGINT)
                       AS l_distinct
            FROM customer GROUP BY c_mktsegment, c_nationkey
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(MIN(class_size) AS BIGINT) AS k_anonymity,
               CAST(MIN(l_distinct) AS BIGINT) AS l_diversity,
               CAST(SUM(CASE WHEN l_distinct < 3 THEN class_size ELSE 0 END)
                    AS BIGINT) AS rows_below_l3,
               {sql_round_half_up(
                   'CAST(SUM(CASE WHEN l_distinct < 3 THEN class_size'
                   ' ELSE 0 END) AS DOUBLE) / CAST(SUM(class_size) AS DOUBLE)',
                   6)} AS frac_below_l3
        FROM classes
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit completing k_anonymity_audit: within each
    quasi-identifier class, how many DISTINCT sensitive values (account
    balance in coarse $1000 bands) appear — a class can be large
    (k-anonymous) yet still leak if everyone in it shares one sensitive
    value. Reports corpus k, corpus l, and the row mass in classes
    below l=3. Integer-only except one ratio; the band floor is true
    floor on both engines, so negative balances band identically.

    Scale: one combinable aggregate with a partial distinct on the
    (class, band) pair — the same shuffle the k-audit already pays."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("bigint")
    classes = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size"),
        F.countDistinct(band).cast("bigint").alias("l_distinct"),
    )
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("class_size").cast("bigint").alias("k_anonymity"),
        F.min("l_distinct").cast("bigint").alias("l_diversity"),
        F.sum(
            F.when(F.col("l_distinct") < 3, F.col("class_size")).otherwise(0)
        )
        .cast("bigint")
        .alias("rows_below_l3"),
        round_half_up(
            F.sum(
                F.when(F.col("l_distinct") < 3, F.col("class_size")).otherwise(0)
            ).cast("double")
            / F.sum("class_size").cast("double"),
            6,
        ).alias("frac_below_l3"),
    )


@query(
    "t_closeness_audit",
    category="analytics",
    oracle=f"""
        WITH cb AS (
            SELECT c_mktsegment AS seg, c_nationkey AS nat,
                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_cb
            FROM customer GROUP BY 1, 2, 3),
        g AS (SELECT band, CAST(SUM(n_cb) AS BIGINT) AS g_b
              FROM cb GROUP BY band),
        tot AS (SELECT CAST(SUM(g_b) AS BIGINT) AS n,
                       CAST(COUNT(*) AS BIGINT) AS m FROM g),
        cls AS (SELECT seg, nat, CAST(SUM(n_cb) AS BIGINT) AS n_c
                FROM cb GROUP BY 1, 2),
        grid AS (
            SELECT cls.seg, cls.nat, cls.n_c, g.band, g.g_b,
                   COALESCE(cb.n_cb, CAST(0 AS BIGINT)) AS n_cb
            FROM cls CROSS JOIN g
            LEFT JOIN cb ON cb.seg = cls.seg AND cb.nat = cls.nat
                        AND cb.band = g.band),
        cum AS (
            SELECT seg, nat, n_c,
                   SUM(n_cb) OVER (PARTITION BY seg, nat ORDER BY band)
                       AS c_ci,
                   SUM(g_b) OVER (PARTITION BY seg, nat ORDER BY band)
                       AS g_i
            FROM grid),
        emd AS (
            SELECT c.seg, c.nat, MAX(c.n_c) AS n_c,
                   CAST(SUM(ABS(t.n * c.c_ci - c.n_c * c.g_i)) AS BIGINT)
                       AS s
            FROM cum c CROSS JOIN tot t GROUP BY c.seg, c.nat)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(MAX(t.m) AS BIGINT) AS m_bands,
               {sql_round_half_up(
                   "MAX(CAST(e.s AS DOUBLE)"
                   " / CAST(e.n_c * t.n * (t.m - 1) AS DOUBLE))", 6)}
                   AS max_t,
               CAST(SUM(CASE WHEN 5 * e.s > e.n_c * t.n * (t.m - 1)
                             THEN e.n_c ELSE 0 END) AS BIGINT)
                   AS rows_above_t02,
               {sql_round_half_up(
                   "CAST(SUM(CASE WHEN 5 * e.s > e.n_c * t.n * (t.m - 1)"
                   " THEN e.n_c ELSE 0 END) AS DOUBLE)"
                   " / CAST(MAX(t.n) AS DOUBLE)", 6)}
                   AS frac_above_t02
        FROM emd e CROSS JOIN tot t
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE'07)
    completing the privacy trio with k_anonymity_audit and
    l_diversity_audit: a class can be large (k) and varied (l) yet
    still leak if its sensitive-value DISTRIBUTION diverges from the
    global one. For the ordered sensitive attribute (acctbal $1000
    bands) the distance is the ordered earth-mover's:
    EMD(P, Q) = Σ_i |cum_i(P) − cum_i(Q)| / (m − 1). Reports the worst
    class t, plus the row mass in classes with EMD > 0.2.

    Determinism: cum_i(P) − cum_i(Q) = (N·C_i − n_c·G_i) / (n_c·N)
    with integer cumulative counts C, G — the whole audit is exact
    BIGINT arithmetic (the t > 0.2 predicate cross-multiplies:
    5·S > n_c·N·(m−1)); only the two reported ratios are doubles.

    Scale: class×band counting is one combinable aggregate; the
    class×band grid is |classes|·|bands| rows (tiny — the DOMAIN is
    small even when the corpus isn't), with the global band histogram
    broadcast onto it."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("bigint")
    cb = cust.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        band.alias("band"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_cb"))
    g = cb.groupBy("band").agg(F.sum("n_cb").cast("bigint").alias("g_b"))
    tot = g.agg(
        F.sum("g_b").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    cls = cb.groupBy("seg", "nat").agg(
        F.sum("n_cb").cast("bigint").alias("n_c")
    )
    grid = (
        cls.crossJoin(F.broadcast(g))
        .join(cb, ["seg", "nat", "band"], "left")
        .select(
            "seg",
            "nat",
            "n_c",
            "band",
            "g_b",
            F.coalesce("n_cb", F.lit(0).cast("bigint")).alias("n_cb"),
        )
    )
    w = Window.partitionBy("seg", "nat").orderBy("band")
    cum = grid.select(
        "seg",
        "nat",
        "n_c",
        F.sum("n_cb").over(w).alias("c_ci"),
        F.sum("g_b").over(w).alias("g_i"),
    )
    emd = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("seg", "nat")
        .agg(
            F.max("n_c").alias("n_c"),
            F.sum(F.abs(F.col("n") * F.col("c_ci") - F.col("n_c") * F.col("g_i")))
            .cast("bigint")
            .alias("s"),
        )
    )
    e = emd.crossJoin(F.broadcast(tot))
    denom = F.col("n_c") * F.col("n") * (F.col("m") - 1)
    above = F.when(F.lit(5) * F.col("s") > denom, F.col("n_c")).otherwise(0)
    return e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.max("m").cast("bigint").alias("m_bands"),
        round_half_up(
            F.max(F.col("s").cast("double") / denom.cast("double")), 6
        ).alias("max_t"),
        F.sum(above).cast("bigint").alias("rows_above_t02"),
        round_half_up(
            F.sum(above).cast("double") / F.max("n").cast("double"), 6
        ).alias("frac_above_t02"),
    )
