"""Statistical tests, regression, and ML-adjacent queries (split from plans/analytics.py)."""

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

from pipeline_query_engine_demo_spark.plans.analytics import (  # shared helpers stay in the base module
    _DEC,
    _DRIFT_CUTOFF,
    _POIS1_CDF,
    _RIDGE_CV_FOLDS,
    _RIDGE_LAMBDA,
    _SPRT_A_N,
    _SPRT_B_N,
    _SPRT_C0_N,
    _SPRT_C1_N,
    _event_type_value_ranks,
    dataset_drift_psi,
    source_concentration_hhi,
)

#: OLS output columns as the shared floor-based half-up rounding (see
#: functions.rounding) — Spark round() vs DuckDB round() disagree by
#: one ulp on boundary doubles, and fixtures regenerate every round.
_RHU_SLOPE = sql_round_half_up("cov_n / varx_n", 9)
_RHU_INTERCEPT = sql_round_half_up("(syd - (cov_n / varx_n) * sxd) / ndd", 9)
_RHU_R2 = sql_round_half_up("(cov_n * cov_n) / (varx_n * vary_n)", 9)


@query(
    "stats_linear_regression",
    category="aggregation",
    oracle=f"""
        WITH s AS (
            SELECT l_returnflag AS returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
            FROM lineitem GROUP BY l_returnflag
        )
        , t AS (
            SELECT returnflag, n,
                   CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
                   CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx_n,
                   CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary_n,
                   CAST(sx AS DOUBLE) AS sxd,
                   CAST(sy AS DOUBLE) AS syd,
                   CAST(n AS DOUBLE) AS ndd
            FROM s
        )
        SELECT returnflag, n,
               {_RHU_SLOPE} AS slope,
               {_RHU_INTERCEPT} AS intercept,
               {_RHU_R2} AS r2
        FROM t
        ORDER BY returnflag
    """,
)
def stats_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit (slope, intercept, R²) of
    extendedprice against quantity — the distributed analog of SQL's
    ``regr_slope``/``regr_intercept``/``regr_r2``, computed from exact
    DECIMAL power sums (see stats_corr_covar) instead of the built-ins,
    whose float accumulation order varies with partitioning and cannot
    hash-match across engines.

    Scale: one map-side-combinable groupBy carrying six associative
    accumulators; the closed-form OLS formulas run once per group on
    exact inputs. The same power sums serve corr, covar, OLS, and
    z-scores — one shuffle amortized across every second-moment
    statistic a profiling pass needs."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    s = lineitem.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return s.select(
        "returnflag",
        "n",
        round_half_up(slope, 9).alias("slope"),
        round_half_up((sy - slope * sx) / nd, 9).alias("intercept"),
        round_half_up(
            ((nd * sxy - sx * sy) * (nd * sxy - sx * sy))
            / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)),
            9,
        ).alias("r2"),
    ).orderBy("returnflag")


@query(
    "chi2_categorical_drift",
    category="ops",
    oracle=f"""
        WITH obs AS (
            SELECT o_orderpriority AS priority,
                   CAST(SUM(CASE WHEN o_orderdate <  TIMESTAMP '{_DRIFT_CUTOFF}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
                   CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_DRIFT_CUTOFF}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS cur_cnt
            FROM orders GROUP BY o_orderpriority
        ),
        tot AS (
            SELECT CAST(SUM(ref_cnt) AS DOUBLE) AS ref_total,
                   CAST(SUM(cur_cnt) AS DOUBLE) AS cur_total,
                   CAST(SUM(ref_cnt) + SUM(cur_cnt) AS DOUBLE) AS grand
            FROM obs
        ),
        ex AS (
            SELECT priority, ref_cnt, cur_cnt,
                   CAST(ref_cnt + cur_cnt AS DOUBLE) * ref_total / grand AS exp_ref,
                   CAST(ref_cnt + cur_cnt AS DOUBLE) * cur_total / grand AS exp_cur
            FROM obs CROSS JOIN tot
        )
        SELECT priority, ref_cnt, cur_cnt,
               {sql_round_half_up('exp_ref', 6)} AS exp_ref,
               {sql_round_half_up('exp_cur', 6)} AS exp_cur,
               {sql_round_half_up(
                   '(ref_cnt - exp_ref) * (ref_cnt - exp_ref) / exp_ref'
                   ' + (cur_cnt - exp_cur) * (cur_cnt - exp_cur) / exp_cur', 6)}
                   AS chi2_term
        FROM ex ORDER BY priority
    """,
)
def chi2_categorical_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity drift for a CATEGORICAL column — the
    companion to dataset_drift_psi's numeric-bin PSI: did the
    o_orderpriority mix shift between the reference and current
    date windows? Per category: observed counts, expected counts under
    homogeneity (row_total x window_total / grand_total), and the
    chi-square contribution; sum against a chi2(k-1) critical value is
    the drift alarm.

    Scale shape: identical to the PSI plan — one conditional-count
    groupBy over the category domain (both windows in a single scan),
    broadcast 1-row totals, category-count-sized output forever. All
    arithmetic is products/ratios of exact integer counts evaluated in
    double the same way on both engines; no transcendental functions.
    """
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_DRIFT_CUTOFF).cast("timestamp")
    obs = (
        orders.select(
            F.col("o_orderpriority").alias("priority"),
            (F.col("o_orderdate") < cutoff).alias("is_ref"),
        )
        .groupBy("priority")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).cast("bigint").alias("ref_cnt"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).cast("bigint").alias("cur_cnt"),
        )
    )
    tot = F.broadcast(
        obs.agg(
            F.sum("ref_cnt").cast("double").alias("ref_total"),
            F.sum("cur_cnt").cast("double").alias("cur_total"),
            (F.sum("ref_cnt") + F.sum("cur_cnt")).cast("double").alias("grand"),
        )
    )
    ex = obs.crossJoin(tot).select(
        "priority",
        "ref_cnt",
        "cur_cnt",
        (
            (F.col("ref_cnt") + F.col("cur_cnt")).cast("double")
            * F.col("ref_total")
            / F.col("grand")
        ).alias("exp_ref"),
        (
            (F.col("ref_cnt") + F.col("cur_cnt")).cast("double")
            * F.col("cur_total")
            / F.col("grand")
        ).alias("exp_cur"),
    )
    chi2 = (F.col("ref_cnt") - F.col("exp_ref")) * (
        F.col("ref_cnt") - F.col("exp_ref")
    ) / F.col("exp_ref") + (F.col("cur_cnt") - F.col("exp_cur")) * (
        F.col("cur_cnt") - F.col("exp_cur")
    ) / F.col("exp_cur")
    return ex.select(
        "priority",
        "ref_cnt",
        "cur_cnt",
        round_half_up(F.col("exp_ref"), 6).alias("exp_ref"),
        round_half_up(F.col("exp_cur"), 6).alias("exp_cur"),
        round_half_up(chi2, 6).alias("chi2_term"),
    ).orderBy("priority")


# --------------------------------------------------------------------------
# Higher-moment statistics from exact power sums
# --------------------------------------------------------------------------

#: Shared sub-expressions for the higher-moment oracle. Every stage the
#: SQL computes mirrors the Spark builder's staged selects exactly, so
#: both engines evaluate the same IEEE expression tree on the same exact
#: decimal sums (see stats_corr_covar for the power-sum rationale).
_HM_SUMS_SQL = """
    s AS (
        SELECT l_returnflag AS returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
               SUM(CAST(CAST(l_quantity AS DECIMAL(9,2))
                        * CAST(l_quantity AS DECIMAL(9,2)) AS DECIMAL(18,4))) AS sxx,
               SUM(CAST(CAST(CAST(l_quantity AS DECIMAL(9,2))
                             * CAST(l_quantity AS DECIMAL(9,2)) AS DECIMAL(18,4))
                        * CAST(l_quantity AS DECIMAL(9,2)) AS DECIMAL(18,6))) AS sxxx,
               SUM(CAST(CAST(CAST(l_quantity AS DECIMAL(9,2))
                             * CAST(l_quantity AS DECIMAL(9,2)) AS DECIMAL(18,4))
                        * CAST(CAST(l_quantity AS DECIMAL(9,2))
                               * CAST(l_quantity AS DECIMAL(9,2)) AS DECIMAL(18,4))
                        AS DECIMAL(18,8))) AS sxxxx
        FROM lineitem GROUP BY l_returnflag
    ),
    d AS (
        SELECT returnflag, n,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
               CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) AS ex2,
               CAST(sxxx AS DOUBLE) / CAST(n AS DOUBLE) AS ex3,
               CAST(sxxxx AS DOUBLE) / CAST(n AS DOUBLE) AS ex4
        FROM s
    ),
    e AS (
        SELECT returnflag, n, m1, ex2, ex3, ex4,
               ex2 - m1 * m1 AS var_pop
        FROM d
    )
"""


@query(
    "stats_higher_moments",
    category="aggregation",
    oracle=f"""
        WITH {_HM_SUMS_SQL}
        SELECT returnflag, n,
               {sql_round_half_up("m1", 6)} AS mean_qty,
               {sql_round_half_up("sqrt(var_pop)", 6)} AS stddev_pop_qty,
               {sql_round_half_up(
                   "(ex3 - 3.0 * m1 * ex2 + 2.0 * m1 * m1 * m1)"
                   " / (sqrt(var_pop) * var_pop)", 6)} AS skewness_qty,
               {sql_round_half_up(
                   "(ex4 - 4.0 * m1 * ex3 + 6.0 * m1 * m1 * ex2"
                   " - 3.0 * m1 * m1 * m1 * m1) / (var_pop * var_pop) - 3.0",
                   6)} AS kurtosis_excess_qty
        FROM e
        ORDER BY returnflag
    """,
)
def stats_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean, population stddev, skewness, and excess kurtosis per group
    from exact DECIMAL power sums (n, Σx, Σx², Σx³, Σx⁴) — the built-in
    ``skewness``/``kurtosis`` accumulate centered floats whose low bits
    depend on partition order, so they can't hash-match across engines
    (same rationale as stats_corr_covar). Powers are staged through
    width-bounded DECIMAL casts (x² at scale 4, x³ at 6, x⁴ at 8 — all
    exact for the 2-decimal quantity domain), so every partial-agg
    order yields bit-identical sums; one double-precision expression
    tree, written identically in both engines, finishes per group.

    Scale: one map-side-combinable groupBy — the same single shuffle as
    any sum; moment statistics at 100 TB are exactly this shape
    (distributed partial power sums + a constant-size driver finish).

    Reference parity: the reference engine exposes only sum/avg
    aggregates (/root/reference/src/executor/mod.rs:383-466); this is
    the distribution-shape profiling a curation pipeline layers on top.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(9,2)")
    x2 = (x * x).cast("decimal(18,4)")
    s = lineitem.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sx"),
        F.sum(x2).alias("sxx"),
        F.sum((x2 * x).cast("decimal(18,6)")).alias("sxxx"),
        F.sum((x2 * x2).cast("decimal(18,8)")).alias("sxxxx"),
    )
    nd = F.col("n").cast("double")
    d = s.select(
        "returnflag",
        "n",
        (F.col("sx").cast("double") / nd).alias("m1"),
        (F.col("sxx").cast("double") / nd).alias("ex2"),
        (F.col("sxxx").cast("double") / nd).alias("ex3"),
        (F.col("sxxxx").cast("double") / nd).alias("ex4"),
    )
    e = d.select(
        "*", (F.col("ex2") - F.col("m1") * F.col("m1")).alias("var_pop")
    )
    m1, ex2, ex3, ex4 = (F.col(c) for c in ("m1", "ex2", "ex3", "ex4"))
    var_pop = F.col("var_pop")
    return e.select(
        "returnflag",
        "n",
        round_half_up(m1, 6).alias("mean_qty"),
        round_half_up(F.sqrt(var_pop), 6).alias("stddev_pop_qty"),
        round_half_up(
            (ex3 - F.lit(3.0) * m1 * ex2 + F.lit(2.0) * m1 * m1 * m1)
            / (F.sqrt(var_pop) * var_pop),
            6,
        ).alias("skewness_qty"),
        round_half_up(
            (
                ex4
                - F.lit(4.0) * m1 * ex3
                + F.lit(6.0) * m1 * m1 * ex2
                - F.lit(3.0) * m1 * m1 * m1 * m1
            )
            / (var_pop * var_pop)
            - F.lit(3.0),
            6,
        ).alias("kurtosis_excess_qty"),
    ).orderBy("returnflag")


@query(
    "spearman_rank_corr",
    category="aggregation",
    oracle=f"""
        WITH r AS (
            SELECT l_returnflag AS returnflag,
                   rank() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity) AS rx,
                   rank() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS ry
            FROM lineitem
        ),
        s AS (
            SELECT returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(rx) AS DOUBLE) AS sx,
                   CAST(SUM(ry) AS DOUBLE) AS sy,
                   CAST(SUM(rx * rx) AS DOUBLE) AS sxx,
                   CAST(SUM(ry * ry) AS DOUBLE) AS syy,
                   CAST(SUM(rx * ry) AS DOUBLE) AS sxy
            FROM r GROUP BY returnflag
        )
        SELECT returnflag, n,
               {sql_round_half_up(
                   "(CAST(n AS DOUBLE) * sxy - sx * sy)"
                   " / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)"
                   " * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))", 6)}
                   AS spearman_qty_price
        FROM s
        ORDER BY returnflag
    """,
)
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per group: ``rank()`` windows replace
    the values (ties share a rank, so the ranking is deterministic with
    no tie-break column), then Pearson's formula runs on exact integer
    rank sums. Ranks ≤ group size, so Σr² fits a BIGINT far beyond
    100 TB row counts; the sums are cast to double once and a single
    identical expression tree finishes on both engines — no
    partition-order float drift anywhere.

    Scale: one exchange on the group key serves both rank windows (two
    in-partition sorts) and the downstream partial agg — the plan every
    distributed rank statistic wants."""
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    # rank() is int32 in Spark (BIGINT in DuckDB); cast before squaring —
    # rank² overflows int32 past ~46k rows per group.
    r = lineitem.select(
        F.col("l_returnflag").alias("returnflag"),
        F.rank().over(wq).cast("bigint").alias("rx"),
        F.rank().over(wp).cast("bigint").alias("ry"),
    )
    s = r.groupBy("returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rx").cast("double").alias("sx"),
        F.sum("ry").cast("double").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("double").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "returnflag",
        "n",
        round_half_up(
            (nd * sxy - sx * sy)
            / (F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)),
            6,
        ).alias("spearman_qty_price"),
    ).orderBy("returnflag")


@query(
    "mad_robust_outliers_events",
    category="analytics",
    oracle="""
        WITH r AS (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        med AS (
            SELECT event_type,
                   CAST(MAX(n) AS BIGINT) AS n,
                   SUM(value) FILTER (WHERE 2 * rn = n OR 2 * rn = n + 1
                                         OR 2 * rn = n + 2)
                       / COUNT(*) FILTER (WHERE 2 * rn = n OR 2 * rn = n + 1
                                             OR 2 * rn = n + 2) AS median_value
            FROM r GROUP BY event_type
        ),
        dev AS (
            SELECT r.event_type, r.event_id,
                   abs(r.value - m.median_value) AS d
            FROM r JOIN med m ON r.event_type = m.event_type
        ),
        r2 AS (
            SELECT event_type, d,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY d, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ),
        mad AS (
            SELECT event_type,
                   SUM(d) FILTER (WHERE 2 * rn = n OR 2 * rn = n + 1
                                     OR 2 * rn = n + 2)
                       / COUNT(*) FILTER (WHERE 2 * rn = n OR 2 * rn = n + 1
                                             OR 2 * rn = n + 2) AS mad_value
            FROM r2 GROUP BY event_type
        )
        SELECT m.event_type, m.n, m.median_value, md.mad_value,
               CAST((SELECT COUNT(*) FROM dev d
                     WHERE d.event_type = m.event_type
                       AND d.d > 3.0 * 1.4826 * md.mad_value) AS BIGINT)
                   AS n_outliers
        FROM med m JOIN mad md ON m.event_type = md.event_type
        ORDER BY m.event_type
    """,
)
def mad_robust_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier detection per event type —
    the robust alternative to z-scores (zscore_outlier_events) that a
    single corrupted batch can't poison, since median and MAD both have
    a 50% breakdown point.

    Exact distributed median without interpolation ambiguity: rank each
    partition's values once, then pick the middle element(s) with the
    pure-integer predicate 2·rn ∈ {n, n+1, n+2} — for odd n exactly
    rank (n+1)/2 matches, for even n ranks n/2 and n/2+1 — and average
    the ≤2 picks (a 2-term IEEE sum, commutative, engine-identical).
    Repeating the construction on |x − median| yields MAD; outliers are
    |x − median| > 3·1.4826·MAD (1.4826 scales MAD to σ under
    normality).

    Scale: two exchanges on the group key (values, then deviations),
    each a single in-partition sort — no quantile interpolation formula
    to disagree on and no driver-side collect. For extreme per-group
    cardinalities swap the full sort for percentile_approx; this is the
    exact path."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    mid = (
        (F.lit(2) * F.col("rn") == F.col("n"))
        | (F.lit(2) * F.col("rn") == F.col("n") + F.lit(1))
        | (F.lit(2) * F.col("rn") == F.col("n") + F.lit(2))
    )
    r = ev.select(
        "event_type",
        "event_id",
        "value",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = r.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        (
            F.sum(F.when(mid, F.col("value"))) / F.count(F.when(mid, 1))
        ).alias("median_value"),
    )
    # Explicit broadcast (guide §3.1): med/mad are one-row-per-event-type
    # tables (low-cardinality enum key). Left to AQE, this join flapped
    # between SortMergeJoin and runtime-converted BroadcastHashJoin across
    # otherwise-identical runs (inherited MANIFEST-PLAN-DRIFT, r12 session
    # 5) — the hint pins the always-correct strategy and the fingerprint.
    dev = r.join(
        F.broadcast(med.select("event_type", "median_value")), "event_type"
    ).select(
        "event_type",
        "event_id",
        F.abs(F.col("value") - F.col("median_value")).alias("d"),
    )
    wd = Window.partitionBy("event_type").orderBy("d", "event_id")
    r2 = dev.select(
        "event_type",
        "d",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mad = r2.groupBy("event_type").agg(
        (F.sum(F.when(mid, F.col("d"))) / F.count(F.when(mid, 1))).alias("mad_value")
    )
    outliers = (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(
                F.when(F.col("d") > F.lit(3.0) * F.lit(1.4826) * F.col("mad_value"), 1)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
    )
    return (
        med.join(mad, "event_type")
        .join(outliers, "event_type")
        .select("event_type", "n", "median_value", "mad_value", "n_outliers")
        .orderBy("event_type")
    )


@query(
    "welch_ttest_acctbal",
    category="aggregation",
    oracle=f"""
        WITH s AS (
            SELECT
                CAST(COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING')
                     AS BIGINT) AS n1,
                CAST(COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY')
                     AS BIGINT) AS n2,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)))
                     FILTER (WHERE c_mktsegment = 'BUILDING') AS DOUBLE) AS s1,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)))
                     FILTER (WHERE c_mktsegment = 'MACHINERY') AS DOUBLE) AS s2,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))
                         * CAST(c_acctbal AS DECIMAL(12,2)))
                     FILTER (WHERE c_mktsegment = 'BUILDING') AS DOUBLE) AS q1,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))
                         * CAST(c_acctbal AS DECIMAL(12,2)))
                     FILTER (WHERE c_mktsegment = 'MACHINERY') AS DOUBLE) AS q2
            FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        ),
        d AS (
            SELECT n1, n2,
                   s1 / n1 AS m1, s2 / n2 AS m2,
                   (q1 - s1 * s1 / n1) / (n1 - 1) AS v1,
                   (q2 - s2 * s2 / n2) / (n2 - 1) AS v2
            FROM s
        )
        SELECT n1, n2,
               {sql_round_half_up('m1', 6)} AS mean_1,
               {sql_round_half_up('m2', 6)} AS mean_2,
               {sql_round_half_up(
                   '(m1 - m2) / sqrt(v1 / n1 + v2 / n2)', 6)} AS t_stat,
               {sql_round_half_up(
                   '(v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)'
                   ' / ((v1 / n1) * (v1 / n1) / (n1 - 1)'
                   ' + (v2 / n2) * (v2 / n2) / (n2 - 1))', 6)} AS df_welch
        FROM d
    """,
)
def welch_ttest_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two customer segments on
    account balance: one conditional-aggregate scan produces exact
    DECIMAL sums and sums-of-squares for both cohorts (the fixture's
    2-decimal balances are exact in DECIMAL(12,2)), then mean,
    sample variance, the t statistic, and the Welch–Satterthwaite
    degrees of freedom evaluate as one identical double expression tree
    on both engines — squares written as x*x, never pow(), so no libm
    variance.

    Scale: a single partial+final aggregate over the scan (both cohorts
    in one pass, no join, no shuffle beyond the 1-row combine); the
    statistic is O(1) state per cohort — the textbook map-side-combine
    shape at any table size."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    is1 = F.col("c_mktsegment") == "BUILDING"
    is2 = F.col("c_mktsegment") == "MACHINERY"
    s = cust.agg(
        F.count(F.when(is1, F.lit(1))).cast("bigint").alias("n1"),
        F.count(F.when(is2, F.lit(1))).cast("bigint").alias("n2"),
        F.sum(F.when(is1, bal)).cast("double").alias("s1"),
        F.sum(F.when(is2, bal)).cast("double").alias("s2"),
        F.sum(F.when(is1, bal * bal)).cast("double").alias("q1"),
        F.sum(F.when(is2, bal * bal)).cast("double").alias("q2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    d = s.select(
        "n1",
        "n2",
        (F.col("s1") / n1).alias("m1"),
        (F.col("s2") / n2).alias("m2"),
        ((F.col("q1") - F.col("s1") * F.col("s1") / n1) / (n1 - F.lit(1))).alias("v1"),
        ((F.col("q2") - F.col("s2") * F.col("s2") / n2) / (n2 - F.lit(1))).alias("v2"),
    )
    m1, m2 = F.col("m1"), F.col("m2")
    se1 = F.col("v1") / F.col("n1")
    se2 = F.col("v2") / F.col("n2")
    return d.select(
        "n1",
        "n2",
        round_half_up(m1, 6).alias("mean_1"),
        round_half_up(m2, 6).alias("mean_2"),
        round_half_up((m1 - m2) / F.sqrt(se1 + se2), 6).alias("t_stat"),
        round_half_up(
            (se1 + se2) * (se1 + se2)
            / (se1 * se1 / (F.col("n1") - F.lit(1))
               + se2 * se2 / (F.col("n2") - F.lit(1))),
            6,
        ).alias("df_welch"),
    )


@query(
    "mann_whitney_u_events",
    category="aggregation",
    oracle=f"""
        WITH e AS (
            SELECT event_type, value FROM events
            WHERE event_type IN ('click', 'view')
        ),
        v AS (
            SELECT value,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'click')
                        AS BIGINT) AS c1,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'view')
                        AS BIGINT) AS c2,
                   CAST(COUNT(*) AS BIGINT) AS ct
            FROM e GROUP BY value
        ),
        r AS (
            SELECT c1, c2, ct,
                   CAST(COALESCE(SUM(ct) OVER (
                       ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before
            FROM v
        ),
        s AS (
            SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                   CAST(SUM(c2) AS BIGINT) AS n2,
                   CAST(SUM(c1 * (2 * cum_before + ct + 1)) AS BIGINT)
                       AS two_r1,
                   CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tie
            FROM r
        ),
        d AS (
            SELECT n1, n2,
                   CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
                   CAST(n1 * n2 AS DOUBLE) AS nn,
                   CAST(n1 + n2 AS DOUBLE) AS n,
                   CAST(tie AS DOUBLE) AS tie_d
            FROM s
        )
        SELECT n1, n2,
               {sql_round_half_up('u1', 6)} AS u_stat,
               {sql_round_half_up(
                   '(u1 - nn / 2.0)'
                   ' / sqrt(nn / 12.0 * ((n + 1.0) - tie_d / (n * (n - 1.0))))',
                   6)} AS z_stat
        FROM d
    """,
)
def mann_whitney_u_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test between two event types, with
    midrank tie handling and the tie-corrected normal approximation —
    the non-parametric two-sample companion to welch_ttest_acctbal.
    All rank arithmetic stays in integers: per-value counts replace
    per-row ranks (2×avg-midrank = 2×cum_before + ct + 1 is exact), so
    U and the tie term are BIGINT-exact and the only doubles are the
    final identical expression tree on both engines.

    Scale: ranking is two-phase, never global — values aggregate to
    (value, counts) rows, rank within ~16 value-range buckets in
    parallel, and add broadcast per-bucket offsets (the
    global_shuffle_positions pattern); because the bucket is a prefix
    of the value order, bucket-then-within IS the global rank. The one
    partition-less window runs over the bucket-count table (≤ range/32
    rows), not the fact table."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    g = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
        F.count("*").cast("bigint").alias("ct"),
    )
    g = g.withColumn("bucket", F.floor(F.col("value") / F.lit(32.0)).cast("bigint"))
    w_in = Window.partitionBy("bucket").orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    g2 = g.withColumn(
        "cum_in", F.coalesce(F.sum("ct").over(w_in), F.lit(0).cast("bigint"))
    )
    counts = g.groupBy("bucket").agg(F.sum("ct").alias("bn"))
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0)).cast("bigint").alias("off"),
    )
    j = g2.join(F.broadcast(offsets), "bucket").withColumn(
        "cum_before", F.col("off") + F.col("cum_in")
    )
    s = j.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(
            F.col("c1")
            * (F.lit(2) * F.col("cum_before") + F.col("ct") + F.lit(1))
        )
        .cast("bigint")
        .alias("two_r1"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("bigint")
        .alias("tie"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    d = s.select(
        "n1",
        "n2",
        ((F.col("two_r1") - n1 * (n1 + F.lit(1))).cast("double") / F.lit(2.0)).alias("u1"),
        (n1 * n2).cast("double").alias("nn"),
        (n1 + n2).cast("double").alias("n"),
        F.col("tie").cast("double").alias("tie_d"),
    )
    u1, nn, n, tie_d = (F.col(c) for c in ("u1", "nn", "n", "tie_d"))
    return d.select(
        "n1",
        "n2",
        round_half_up(u1, 6).alias("u_stat"),
        round_half_up(
            (u1 - nn / F.lit(2.0))
            / F.sqrt(
                nn / F.lit(12.0)
                * ((n + F.lit(1.0)) - tie_d / (n * (n - F.lit(1.0))))
            ),
            6,
        ).alias("z_stat"),
    )


@query(
    "cohens_kappa_quality",
    category="aggregation",
    oracle=f"""
        WITH lab AS (
            SELECT (n_chars >= 500) AS a,
                   (len(string_split(text, ' ')) >= 90) AS b
            FROM documents
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
                   CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
                   CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
                   CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
            FROM lab
        ),
        d AS (
            SELECT n, n11, n10, n01, n00,
                   CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
                   CAST((n11 + n10) * (n11 + n01)
                        + (n01 + n00) * (n10 + n00) AS DOUBLE)
                       / CAST(n * n AS DOUBLE) AS pe
            FROM s
        )
        SELECT n, n11, n10, n01, n00,
               {sql_round_half_up('po', 6)} AS p_observed,
               {sql_round_half_up('pe', 6)} AS p_expected,
               {sql_round_half_up('(po - pe) / (1.0 - pe)', 6)} AS kappa
        FROM d
    """,
)
def cohens_kappa_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa agreement between two cheap quality raters (a
    character-length gate and a token-count gate) — the calibration
    check a curation pipeline runs before trusting a heuristic filter
    as a stand-in for a more expensive one. The 2×2 confusion counts
    are BIGINT-exact from one conditional-aggregate scan; observed and
    chance agreement divide exact integer products in an identical
    double tree on both engines (kappa = (po-pe)/(1-pe)).

    Scale: single map-side-combine aggregate, O(1) state — the same
    shape at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    a = F.col("n_chars") >= 500
    b = F.size(F.split(F.col("text"), " ")) >= 90
    s = docs.select(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n11"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n01"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n00"),
    )
    n, n11, n10, n01, n00 = (F.col(c) for c in ("n", "n11", "n10", "n01", "n00"))
    d = s.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        ((n11 + n00).cast("double") / n.cast("double")).alias("po"),
        (
            ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)).cast("double")
            / (n * n).cast("double")
        ).alias("pe"),
    )
    po, pe = F.col("po"), F.col("pe")
    return d.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        round_half_up(po, 6).alias("p_observed"),
        round_half_up(pe, 6).alias("p_expected"),
        round_half_up((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


@query(
    "nearest_rank_percentiles",
    category="aggregation",
    oracle="""
        WITH r AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n,
               MAX(value) FILTER (WHERE rn = CAST(ceil(
                   CAST(0.50 AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT))
                   AS p50,
               MAX(value) FILTER (WHERE rn = CAST(ceil(
                   CAST(0.90 AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT))
                   AS p90,
               MAX(value) FILTER (WHERE rn = CAST(ceil(
                   CAST(0.95 AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT))
                   AS p95,
               MAX(value) FILTER (WHERE rn = CAST(ceil(
                   CAST(0.99 AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT))
                   AS p99
        FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def nearest_rank_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank percentiles (p50/p90/p95/p99) per event type
    — the latency-dashboard quantile family. Nearest-rank (value at
    row ceil(p·n)) has no interpolation formula for engines to
    disagree on: the only float op is ceil(p·n) on identical doubles
    (the percentile literals are CAST to DOUBLE in the oracle because
    DuckDB would otherwise fold 0.95·n in DECIMAL), and the selected
    values pass through untouched.

    Scale: ranks come from _event_type_value_ranks' bucketed two-phase
    form — a PARTITION BY event_type window alone would funnel the
    fact table into ~5 reducers (the 5.1x-at-x10 straggler ADVICE r4
    flagged); bucketing by value range restores full parallelism. A
    conditional MAX per percentile replaces any second scan. Compare
    approx_percentile_quantities for the sketch-based form at
    unbounded group cardinality."""
    ev = load_table(spark, sf_dir, "events")
    r = _event_type_value_ranks(ev)
    nd = F.col("n").cast("double")
    def at_p(p: float, name: str):
        target = F.ceil(F.lit(p) * nd).cast("bigint")
        return F.max(F.when(F.col("rn") == target, F.col("value"))).alias(name)
    return (
        r.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            at_p(0.50, "p50"),
            at_p(0.90, "p90"),
            at_p(0.95, "p95"),
            at_p(0.99, "p99"),
        )
        .orderBy("event_type")
    )


@query(
    "winsorized_mean_events",
    category="aggregation",
    oracle=f"""
        WITH r AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        thr AS (
            SELECT event_type,
                   MAX(value) FILTER (WHERE rn = CAST(ceil(
                       CAST(0.05 AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT))
                       AS lo,
                   MAX(value) FILTER (WHERE rn = CAST(ceil(
                       CAST(0.95 AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT))
                       AS hi
            FROM r GROUP BY event_type
        ),
        w AS (
            SELECT r.event_type,
                   CAST(CASE WHEN r.value < t.lo THEN t.lo
                             WHEN r.value > t.hi THEN t.hi
                             ELSE r.value END AS DECIMAL(12,2)) AS wv,
                   CAST(r.value AS DECIMAL(12,2)) AS v
            FROM r JOIN thr t ON t.event_type = r.event_type
        )
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               {sql_round_half_up('CAST(SUM(v) AS DOUBLE) / COUNT(*)', 6)}
                   AS raw_mean,
               {sql_round_half_up('CAST(SUM(wv) AS DOUBLE) / COUNT(*)', 6)}
                   AS winsorized_mean
        FROM w GROUP BY event_type ORDER BY event_type
    """,
)
def winsorized_mean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/95-winsorized mean per event type beside the raw mean — the
    robust location estimate that survives fat tails without dropping
    rows (clamp, don't trim). Thresholds are exact nearest-rank
    percentiles (no interpolation); clamped values are the data's own
    2-decimal values, so the DECIMAL sums stay exact and the only
    float op is one identical division.

    Scale: ranks come from _event_type_value_ranks' bucketed two-phase
    form (not a 5-reducer PARTITION BY event_type window — ADVICE r4);
    the thresholds then broadcast back onto the rows for one final
    combinable aggregate."""
    ev = load_table(spark, sf_dir, "events")
    r = _event_type_value_ranks(ev)
    nd = F.col("n").cast("double")
    thr = r.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.05) * nd).cast("bigint"),
                F.col("value"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.95) * nd).cast("bigint"),
                F.col("value"),
            )
        ).alias("hi"),
    )
    clamped = (
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
    )
    joined = r.join(F.broadcast(thr), "event_type").select(
        "event_type",
        clamped.cast("decimal(12,2)").alias("wv"),
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            round_half_up(
                F.sum("v").cast("double") / F.count(F.lit(1)), 6
            ).alias("raw_mean"),
            round_half_up(
                F.sum("wv").cast("double") / F.count(F.lit(1)), 6
            ).alias("winsorized_mean"),
        )
        .orderBy("event_type")
    )


@query(
    "mutual_information_source_lang",
    category="aggregation",
    oracle=f"""
        WITH cells AS (
            SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS nij
            FROM documents GROUP BY source, lang
        ),
        rows_ AS (SELECT source, CAST(SUM(nij) AS BIGINT) AS ni
                  FROM cells GROUP BY source),
        cols_ AS (SELECT lang, CAST(SUM(nij) AS BIGINT) AS nj
                  FROM cells GROUP BY lang),
        tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cells),
        mi_terms AS (
            SELECT CASE WHEN isfinite((CAST(c.nij AS DOUBLE) / CAST(t.n AS DOUBLE))
                       * ln(CAST(c.nij * t.n AS DOUBLE)
                            / CAST(r.ni * l.nj AS DOUBLE))) THEN floor(((CAST(c.nij AS DOUBLE) / CAST(t.n AS DOUBLE))
                       * ln(CAST(c.nij * t.n AS DOUBLE)
                            / CAST(r.ni * l.nj AS DOUBLE))) * 1000000000.0 + 0.5) / 1000000000.0 END AS term
            FROM cells c
            JOIN rows_ r ON r.source = c.source
            JOIN cols_ l ON l.lang = c.lang
            CROSS JOIN tot t
        ),
        hs_terms AS (
            SELECT CASE WHEN isfinite(-(CAST(ni AS DOUBLE) / CAST(t.n AS DOUBLE))
                       * ln(CAST(ni AS DOUBLE) / CAST(t.n AS DOUBLE))) THEN floor((-(CAST(ni AS DOUBLE) / CAST(t.n AS DOUBLE))
                       * ln(CAST(ni AS DOUBLE) / CAST(t.n AS DOUBLE))) * 1000000000.0 + 0.5) / 1000000000.0 END AS term
            FROM rows_ CROSS JOIN tot t
        ),
        hl_terms AS (
            SELECT CASE WHEN isfinite(-(CAST(nj AS DOUBLE) / CAST(t.n AS DOUBLE))
                       * ln(CAST(nj AS DOUBLE) / CAST(t.n AS DOUBLE))) THEN floor((-(CAST(nj AS DOUBLE) / CAST(t.n AS DOUBLE))
                       * ln(CAST(nj AS DOUBLE) / CAST(t.n AS DOUBLE))) * 1000000000.0 + 0.5) / 1000000000.0 END AS term
            FROM cols_ CROSS JOIN tot t
        ),
        s AS (
            SELECT (SELECT CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE)
                    FROM mi_terms) AS mi,
                   (SELECT CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE)
                    FROM hs_terms) AS hs,
                   (SELECT CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE)
                    FROM hl_terms) AS hl,
                   (SELECT n FROM tot) AS n
        )
        SELECT n,
               {sql_round_half_up('mi', 6)} AS mi_nats,
               {sql_round_half_up('hs', 6)} AS h_source,
               {sql_round_half_up('hl', 6)} AS h_lang,
               {sql_round_half_up('mi / sqrt(hs * hl)', 6)} AS nmi
        FROM s
    """,
)
def mutual_information_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between source and language (plus marginal
    entropies and sqrt-normalized NMI) — the information-theoretic
    companion to chi2_categorical_drift: how much knowing the source
    tells you about the language of a document, the association score
    mixture debugging reads first. Cross-engine order-independence
    uses the repo's proven recipe (bigram LM, char entropy): every
    ln term is rounded to 9 decimals and accumulated as
    DECIMAL(28,12), so the cell-sum order cannot matter; the operand
    of each ln is a ratio of exact BIGINT products. (Past ~1e9 docs
    the nij*n product wants the ln-difference form to dodge int64
    overflow — noted, not needed at fixture scale.)

    Scale: one conditional-count aggregate over the scan; everything
    after runs on vocabulary-sized cell tables with broadcast 1-row
    totals."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("nij")
    )
    rows_ = cells.groupBy("source").agg(F.sum("nij").cast("bigint").alias("ni"))
    cols_ = cells.groupBy("lang").agg(F.sum("nij").cast("bigint").alias("nj"))
    tot = cells.agg(F.sum("nij").cast("bigint").alias("n"))

    def _dec_sum(df, term_col):
        return df.agg(
            F.sum(round_half_up(term_col, 9).cast("decimal(28,12)"))
            .cast("double")
            .alias("v")
        )

    nd = F.col("n").cast("double")
    mi_cells = (
        cells.join(F.broadcast(rows_), "source")
        .join(F.broadcast(cols_), "lang")
        .crossJoin(F.broadcast(tot))
    )
    mi_term = (F.col("nij").cast("double") / nd) * F.log(
        (F.col("nij") * F.col("n")).cast("double")
        / (F.col("ni") * F.col("nj")).cast("double")
    )
    hs_term = -(F.col("ni").cast("double") / nd) * F.log(
        F.col("ni").cast("double") / nd
    )
    hl_term = -(F.col("nj").cast("double") / nd) * F.log(
        F.col("nj").cast("double") / nd
    )
    mi = _dec_sum(mi_cells, mi_term).withColumnRenamed("v", "mi")
    hs = _dec_sum(rows_.crossJoin(F.broadcast(tot)), hs_term).withColumnRenamed("v", "hs")
    hl = _dec_sum(cols_.crossJoin(F.broadcast(tot)), hl_term).withColumnRenamed("v", "hl")
    s = mi.crossJoin(F.broadcast(hs)).crossJoin(F.broadcast(hl)).crossJoin(
        F.broadcast(tot)
    )
    return s.select(
        "n",
        round_half_up(F.col("mi"), 6).alias("mi_nats"),
        round_half_up(F.col("hs"), 6).alias("h_source"),
        round_half_up(F.col("hl"), 6).alias("h_lang"),
        round_half_up(
            F.col("mi") / F.sqrt(F.col("hs") * F.col("hl")), 6
        ).alias("nmi"),
    )


@query(
    "wilson_ci_conversion",
    category="analytics",
    oracle=f"""
        WITH ud AS (
            SELECT date_trunc('day', ts) AS day, user_id,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS clicked,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS purchased
            FROM events GROUP BY day, user_id
        ),
        d AS (
            SELECT day,
                   CAST(SUM(clicked) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN clicked = 1 AND purchased = 1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS k
            FROM ud GROUP BY day
        ),
        w AS (
            SELECT day, n, k,
                   CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                   CAST(1.96 AS DOUBLE) AS z,
                   CAST(n AS DOUBLE) AS nd
            FROM d WHERE n > 0
        ),
        ci AS (
            SELECT day, n, k, p,
                   (p + z * z / (2.0 * nd)) / (1.0 + z * z / nd) AS center,
                   z * sqrt(p * (1.0 - p) / nd + z * z / (4.0 * nd * nd))
                       / (1.0 + z * z / nd) AS half
            FROM w
        )
        SELECT day, n, k,
               {sql_round_half_up('p', 6)} AS conversion,
               {sql_round_half_up('center - half', 6)} AS wilson_lo,
               {sql_round_half_up('center + half', 6)} AS wilson_hi
        FROM ci ORDER BY day
    """,
)
def wilson_ci_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily click→purchase conversion among clicking users with the
    Wilson 95% score interval — the uncertainty-honest way to report a
    small-sample rate (a plain ±1.96·SE interval misbehaves near 0/1;
    Wilson stays inside [0,1]). Counts are per-(day,user) flag
    aggregates, so repeated events don't inflate the rate; the interval
    evaluates as one identical double tree (the z literal is CAST to
    DOUBLE — a bare 1.96 folds in DECIMAL on DuckDB).

    Scale: two stacked combinable aggregates ((day,user) flags, then
    day), both riding one exchange keyed on day+user then day."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "clicked"
        ),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "purchased"
        ),
    )
    d = ud.groupBy("day").agg(
        F.sum("clicked").cast("bigint").alias("n"),
        F.sum(
            F.when((F.col("clicked") == 1) & (F.col("purchased") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("k"),
    ).filter(F.col("n") > 0)
    p = F.col("k").cast("double") / F.col("n").cast("double")
    z = F.lit(1.96)
    nd = F.col("n").cast("double")
    w = d.select("day", "n", "k", p.alias("p"), nd.alias("nd"))
    pc, ndc = F.col("p"), F.col("nd")
    center = (pc + z * z / (F.lit(2.0) * ndc)) / (F.lit(1.0) + z * z / ndc)
    half = (
        z
        * F.sqrt(pc * (F.lit(1.0) - pc) / ndc + z * z / (F.lit(4.0) * ndc * ndc))
        / (F.lit(1.0) + z * z / ndc)
    )
    return (
        w.select(
            "day",
            "n",
            "k",
            round_half_up(pc, 6).alias("conversion"),
            round_half_up(center - half, 6).alias("wilson_lo"),
            round_half_up(center + half, 6).alias("wilson_hi"),
        )
        .orderBy("day")
    )

_BENFORD_P = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


@query(
    "benford_digit_test",
    category="analytics",
    oracle=f"""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                               AS VARCHAR), 1, 1) AS BIGINT) AS d
            FROM orders WHERE o_totalprice >= 1.0
        ),
        c AS (
            SELECT d, CAST(COUNT(*) AS BIGINT) AS observed
            FROM digits GROUP BY d
        ),
        n AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM c)
        SELECT c.d AS digit, c.observed,
               {sql_round_half_up(
                   'CAST(n.n AS DOUBLE) * CASE c.d '
                   + " ".join(
                       f"WHEN {d} THEN CAST({p!r} AS DOUBLE)"
                       for d, p in _BENFORD_P.items())
                   + ' END', 6)} AS expected,
               {sql_round_half_up(
                   '(CAST(c.observed AS DOUBLE) - CAST(n.n AS DOUBLE)'
                   ' * CASE c.d '
                   + " ".join(
                       f"WHEN {d} THEN CAST({p!r} AS DOUBLE)"
                       for d, p in _BENFORD_P.items())
                   + ' END) * (CAST(c.observed AS DOUBLE)'
                   ' - CAST(n.n AS DOUBLE) * CASE c.d '
                   + " ".join(
                       f"WHEN {d} THEN CAST({p!r} AS DOUBLE)"
                       for d, p in _BENFORD_P.items())
                   + ' END) / (CAST(n.n AS DOUBLE) * CASE c.d '
                   + " ".join(
                       f"WHEN {d} THEN CAST({p!r} AS DOUBLE)"
                       for d, p in _BENFORD_P.items())
                   + ' END)', 6)} AS chi2_term
        FROM c CROSS JOIN n ORDER BY digit
    """,
)
def benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed
    leading-digit counts against n·log10(1+1/d) expectations with the
    per-digit chi-square contribution — the classic fabricated-data /
    corrupted-feed screen. The Benford probabilities are pre-folded
    Python literals embedded in both engines (the nDCG-discount
    trick), so no runtime log10 exists and every term is one identical
    double tree over exact BIGINT counts. Emitting per-digit terms
    (not their sum) keeps the output order-independent without any
    cross-row float addition.

    Scale: one map-side digit extraction + a 9-row aggregate."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1.0
    )
    d = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    c = orders.select(d.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("observed")
    )
    n_tbl = c.agg(F.sum("observed").cast("bigint").alias("n"))
    j = c.crossJoin(F.broadcast(n_tbl))
    p_expr = F.lit(None).cast("double")
    for digit, p in reversed(list(_BENFORD_P.items())):
        p_expr = F.when(F.col("d") == digit, F.lit(p)).otherwise(p_expr)
    expected = F.col("n").cast("double") * p_expr
    obs = F.col("observed").cast("double")
    return (
        j.select(
            F.col("d").alias("digit"),
            "observed",
            round_half_up(expected, 6).alias("expected"),
            round_half_up(
                (obs - expected) * (obs - expected) / expected, 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@query(
    "trimmed_mean_events",
    category="aggregation",
    oracle=f"""
        WITH r AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        kept AS (
            SELECT event_type, value
            FROM r
            WHERE rn > CAST(ceil(CAST(0.05 AS DOUBLE) * CAST(n AS DOUBLE))
                            AS BIGINT)
              AND rn <= CAST(ceil(CAST(0.95 AS DOUBLE) * CAST(n AS DOUBLE))
                             AS BIGINT)
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               {sql_round_half_up(
                   'CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)'
                   ' / COUNT(*)', 6)} AS trimmed_mean
        FROM kept GROUP BY event_type ORDER BY event_type
    """,
)
def trimmed_mean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/95 trimmed mean per event type — the drop-the-tails robust
    estimator beside winsorized_mean_events' clamp-the-tails (the two
    bracket how aggressively a robust pipeline discounts outliers).
    Row retention is an exact integer rank predicate (same ceil(p·n)
    nearest-rank arithmetic as the percentile family, literals CAST
    to DOUBLE), and the kept values sum in exact DECIMAL.

    Scale: the same bucketed two-phase rank as
    nearest_rank_percentiles (_event_type_value_ranks — no 5-reducer
    event_type window, ADVICE r4), then one combinable aggregate over
    the kept rows."""
    ev = load_table(spark, sf_dir, "events")
    r = _event_type_value_ranks(ev)
    nd = F.col("n").cast("double")
    lo = F.ceil(F.lit(0.05) * nd).cast("bigint")
    hi = F.ceil(F.lit(0.95) * nd).cast("bigint")
    kept = r.filter((F.col("rn") > lo) & (F.col("rn") <= hi))
    return (
        kept.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            round_half_up(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )


@query(
    "gini_revenue_concentration",
    category="analytics",
    oracle="""
        WITH rev AS (
            SELECT c.c_mktsegment AS segment, o.o_custkey AS custkey,
                   CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
                       AS BIGINT)) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2),
        r AS (
            SELECT segment, custkey, cents,
                   row_number() OVER (PARTITION BY segment
                                      ORDER BY cents, custkey) AS rn
            FROM rev),
        st AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(cents) AS BIGINT) AS total_cents,
                   CAST(SUM(rn * cents) AS BIGINT) AS a
            FROM r GROUP BY segment),
        top AS (
            SELECT r.segment, CAST(SUM(r.cents) AS BIGINT) AS top_cents
            FROM r JOIN st ON st.segment = r.segment
            WHERE r.rn > st.n_customers - (st.n_customers + 9) // 10
            GROUP BY r.segment)
        SELECT st.segment, st.n_customers, st.total_cents,
               CASE WHEN isfinite(CAST(2 * st.a - (st.n_customers + 1)
                        * st.total_cents AS DOUBLE)
                        / CAST(st.n_customers * st.total_cents AS DOUBLE))
                    THEN floor((CAST(2 * st.a - (st.n_customers + 1)
                        * st.total_cents AS DOUBLE)
                        / CAST(st.n_customers * st.total_cents AS DOUBLE))
                        * 1000000.0 + 0.5) / 1000000.0 END AS gini,
               CASE WHEN isfinite(CAST(top.top_cents AS DOUBLE)
                        / CAST(st.total_cents AS DOUBLE))
                    THEN floor((CAST(top.top_cents AS DOUBLE)
                        / CAST(st.total_cents AS DOUBLE))
                        * 1000000.0 + 0.5) / 1000000.0 END AS top_decile_share
        FROM st JOIN top ON top.segment = st.segment
        ORDER BY st.segment
    """,
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient + top-decile revenue share per market segment —
    the inequality/concentration diagnostic next to the HHI query
    (source_concentration_hhi measures across-group concentration; Gini
    measures WITHIN-group customer inequality). Uses the rank identity
    G = (2·Σ rn·x − (n+1)·Σx) / (n·Σx) over ascending-revenue ranks;
    ties permute equal values between equal weights, so any
    deterministic tiebreak (custkey) gives the same G.

    Determinism: revenue stays in exact integer CENTS (the RFM recipe)
    through rank-weighted BIGINT sums; the only doubles are the two
    final divisions — identical IEEE both engines, gate-hashed raw.

    Scale: per-customer revenue is one combinable agg. The per-segment
    ascending rank runs as a two-phase bucketed row_number (rank inside
    (segment, cents-range bucket) in parallel + broadcast per-bucket
    offsets) — no window ever sees a whole segment's customers in one
    task, unlike a naive PARTITION BY segment rank whose parallelism
    is the 5 segments."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rev = (
        orders.join(
            customer.select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("segment"),
            ),
            "o_custkey",
        )
        .groupBy("segment", F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    # two-phase rank: bucket is a monotone function of cents, so
    # (segment, bucket)-local ranks + per-segment broadcast offsets
    # equal the per-segment global rank
    b = rev.withColumn("_b", F.expr("cents div 1048576"))
    w_in = Window.partitionBy("segment", "_b").orderBy("cents", "custkey")
    within = b.withColumn("_rn_in", F.row_number().over(w_in))
    counts = b.groupBy("segment", "_b").agg(F.count(F.lit(1)).alias("_bn"))
    w_off = (
        Window.partitionBy("segment")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "segment", "_b", F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off")
    )
    r = (
        within.join(F.broadcast(offsets), ["segment", "_b"])
        .withColumn("rn", (F.col("_off") + F.col("_rn_in")).cast("bigint"))
        .drop("_b", "_rn_in", "_off")
    )
    st = r.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("rn") * F.col("cents")).cast("bigint").alias("a"),
    )
    top = (
        r.join(F.broadcast(st), "segment")
        .filter(
            F.col("rn")
            > F.col("n_customers") - F.expr("(n_customers + 9) div 10")
        )
        .groupBy("segment")
        .agg(F.sum("cents").cast("bigint").alias("top_cents"))
    )
    gini = (
        (
            F.lit(2) * F.col("a")
            - (F.col("n_customers") + 1) * F.col("total_cents")
        ).cast("double")
        / (F.col("n_customers") * F.col("total_cents")).cast("double")
    )
    share = F.col("top_cents").cast("double") / F.col("total_cents").cast("double")
    return (
        st.join(top, "segment")
        .select(
            "segment",
            "n_customers",
            "total_cents",
            round_half_up(gini, 6).alias("gini"),
            round_half_up(share, 6).alias("top_decile_share"),
        )
        .orderBy("segment")
    )


@query(
    "isotonic_regression_minimax",
    category="aggregation",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS cents
            FROM events GROUP BY 1, 2),
        seq AS (
            SELECT event_type, day, cents,
                   CAST(row_number() OVER (PARTITION BY event_type
                                           ORDER BY day) AS BIGINT) AS rn,
                   CAST(SUM(cents) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS p
            FROM daily),
        pairs AS (
            SELECT a.event_type, a.rn AS j, b.rn AS k,
                   CAST(b.p - (a.p - a.cents) AS DOUBLE)
                       / CAST(b.rn - a.rn + 1 AS DOUBLE) AS avg_jk
            FROM seq a JOIN seq b
              ON b.event_type = a.event_type AND a.rn <= b.rn),
        rm AS (
            SELECT event_type, j, k,
                   MIN(avg_jk) OVER (PARTITION BY event_type, j ORDER BY k DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS suffix_min
            FROM pairs),
        fit AS (
            SELECT event_type, k AS rn, MAX(suffix_min) AS iso
            FROM rm GROUP BY 1, 2)
        SELECT s.event_type, s.day,
               CAST(s.cents AS DOUBLE) / CAST(100.0 AS DOUBLE) AS actual,
               {sql_round_half_up('f.iso / 100.0', 6)} AS iso_fit
        FROM seq s JOIN fit f
          ON f.event_type = s.event_type AND f.rn = s.rn
        ORDER BY s.event_type, s.day
    """,
)
def isotonic_regression_minimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression of each event
    type's daily value total, via the minimax identity
    ŷ_i = max_{j≤i} min_{k≥i} mean(y_j..y_k) — the closed form of
    pool-adjacent-violators (Barlow et al. 1972), used for calibration
    curves (Platt/isotonic score calibration) and enforcing monotone
    metric baselines.

    The O(n³) minimax collapses to O(n²) rows + two window passes:
    pair averages mean(j..k) from BIGINT-cents prefix sums (each a
    single exact-int division — order-independent), a per-j suffix MIN
    over k (ORDER BY k DESC running min), then a per-k MAX over j≤k
    (plain groupBy — every pair row with k carries j≤k already).

    Determinism: cents are floor(x·100+0.5) BIGINTs, prefix sums exact,
    each avg one identical IEEE division; MIN/MAX never re-accumulate.

    Scale: quadratic only in DAYS PER SERIES (calendar-bounded),
    partitioned by event_type; the corpus-sized stage is the combinable
    daily roll-up. Windows are partitioned (event_type, j) — no global
    sorts."""
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    wseq = Window.partitionBy("event_type").orderBy("day")
    seq = daily.select(
        "event_type",
        "day",
        "cents",
        F.row_number().over(wseq).cast("bigint").alias("rn"),
        F.sum("cents")
        .over(wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("p"),
    )
    a, b = seq.alias("a"), seq.alias("b")
    pairs = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("a.rn") <= F.col("b.rn")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.rn").alias("j"),
        F.col("b.rn").alias("k"),
        (
            (F.col("b.p") - (F.col("a.p") - F.col("a.cents"))).cast("double")
            / (F.col("b.rn") - F.col("a.rn") + 1).cast("double")
        ).alias("avg_jk"),
    )
    wmin = (
        Window.partitionBy("event_type", "j")
        .orderBy(F.desc("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rm = pairs.select(
        "event_type", "j", "k", F.min("avg_jk").over(wmin).alias("suffix_min")
    )
    fit = rm.groupBy("event_type", F.col("k").alias("rn")).agg(
        F.max("suffix_min").alias("iso")
    )
    return (
        seq.join(fit, ["event_type", "rn"])
        .select(
            "event_type",
            "day",
            (F.col("cents").cast("double") / F.lit(100.0)).alias("actual"),
            round_half_up(F.col("iso") / F.lit(100.0), 6).alias("iso_fit"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "two_proportion_ztest",
    category="aggregation",
    oracle=f"""
        WITH seg AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(COUNT(*) FILTER (WHERE o.o_orderpriority = '1-URGENT')
                        AS BIGINT) AS x,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1),
        p AS (
            SELECT a.segment AS segment_a, b.segment AS segment_b,
                   a.x AS x_a, a.n AS n_a, b.x AS x_b, b.n AS n_b,
                   CAST(a.x AS DOUBLE) / CAST(a.n AS DOUBLE) AS p_a,
                   CAST(b.x AS DOUBLE) / CAST(b.n AS DOUBLE) AS p_b,
                   CAST(a.x + b.x AS DOUBLE) / CAST(a.n + b.n AS DOUBLE)
                       AS pool
            FROM seg a JOIN seg b ON a.segment < b.segment)
        SELECT segment_a, segment_b, x_a, n_a, x_b, n_b,
               {sql_round_half_up('p_a - p_b', 6)} AS diff,
               {sql_round_half_up(
                   '(p_a - p_b) / sqrt(pool * (1.0 - pool)'
                   ' * (1.0 / CAST(n_a AS DOUBLE)'
                   ' + 1.0 / CAST(n_b AS DOUBLE)))', 6)} AS z_stat
        FROM p
        ORDER BY segment_a, segment_b
    """,
)
def two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over every market-segment pair: does the
    urgent-order share differ between segments? The pooled-variance
    z = (p̂_a − p̂_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)) — the A/B-test
    primitive every experimentation pipeline runs on conversion-style
    binary outcomes.

    Determinism: successes/trials stay BIGINT through the shuffle; the
    proportions and z are one identical final double expression tree
    per engine (each operand an exact-integer cast).

    Scale: one combinable fact-table aggregation to |segments| rows,
    then a trivially tiny segment×segment self-join (broadcast); the
    customer dimension joins broadcast-side. Nothing pairwise ever
    touches fact rows."""
    seg = (
        load_table(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_mktsegment"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    a, b = seg.alias("a"), seg.alias("b")
    p = a.join(
        F.broadcast(b), F.col("a.segment") < F.col("b.segment")
    ).select(
        F.col("a.segment").alias("segment_a"),
        F.col("b.segment").alias("segment_b"),
        F.col("a.x").alias("x_a"),
        F.col("a.n").alias("n_a"),
        F.col("b.x").alias("x_b"),
        F.col("b.n").alias("n_b"),
        (F.col("a.x").cast("double") / F.col("a.n").cast("double")).alias(
            "p_a"
        ),
        (F.col("b.x").cast("double") / F.col("b.n").cast("double")).alias(
            "p_b"
        ),
        (
            (F.col("a.x") + F.col("b.x")).cast("double")
            / (F.col("a.n") + F.col("b.n")).cast("double")
        ).alias("pool"),
    )
    pool = F.col("pool")
    return p.select(
        "segment_a",
        "segment_b",
        "x_a",
        "n_a",
        "x_b",
        "n_b",
        round_half_up(F.col("p_a") - F.col("p_b"), 6).alias("diff"),
        round_half_up(
            (F.col("p_a") - F.col("p_b"))
            / F.sqrt(
                pool
                * (F.lit(1.0) - pool)
                * (
                    F.lit(1.0) / F.col("n_a").cast("double")
                    + F.lit(1.0) / F.col("n_b").cast("double")
                )
            ),
            6,
        ).alias("z_stat"),
    ).orderBy("segment_a", "segment_b")


@query(
    "ks_two_sample_acctbal",
    category="aggregation",
    oracle=f"""
        WITH hist AS (
            SELECT c_mktsegment AS seg,
                   CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS v,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM customer GROUP BY 1, 2),
        tot AS (
            SELECT seg, CAST(SUM(cnt) AS BIGINT) AS n
            FROM hist GROUP BY 1),
        segs AS (SELECT DISTINCT seg FROM hist),
        pairs AS (
            SELECT a.seg AS s1, b.seg AS s2
            FROM segs a JOIN segs b ON a.seg < b.seg),
        e AS (
            SELECT p.s1, p.s2, h.v, h.cnt AS a1, CAST(0 AS BIGINT) AS a2
            FROM pairs p JOIN hist h ON h.seg = p.s1
            UNION ALL
            SELECT p.s1, p.s2, h.v, CAST(0 AS BIGINT), h.cnt
            FROM pairs p JOIN hist h ON h.seg = p.s2),
        g AS (
            SELECT s1, s2, v,
                   CAST(SUM(a1) AS BIGINT) AS a1,
                   CAST(SUM(a2) AS BIGINT) AS a2
            FROM e GROUP BY 1, 2, 3),
        c AS (
            SELECT s1, s2,
                   CAST(SUM(a1) OVER w AS BIGINT) AS c1,
                   CAST(SUM(a2) OVER w AS BIGINT) AS c2
            FROM g
            WINDOW w AS (PARTITION BY s1, s2 ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        dnum AS (
            SELECT c.s1, c.s2, t1.n AS n1, t2.n AS n2,
                   CAST(MAX(abs(c.c1 * t2.n - c.c2 * t1.n)) AS BIGINT)
                       AS d_num
            FROM c
            JOIN tot t1 ON t1.seg = c.s1
            JOIN tot t2 ON t2.seg = c.s2
            GROUP BY 1, 2, 3, 4)
        SELECT s1, s2, n1, n2,
               {sql_round_half_up(
                   "CAST(d_num AS DOUBLE)"
                   " / CAST(n1 * n2 AS DOUBLE)", 6)} AS ks_d,
               {sql_round_half_up(
                   "(CAST(d_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE))"
                   " * sqrt(CAST(n1 * n2 AS DOUBLE)"
                   " / CAST(n1 + n2 AS DOUBLE))", 6)} AS ks_lambda
        FROM dnum ORDER BY s1, s2
    """,
)
def ks_two_sample_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between every pair of
    market segments' account-balance distributions: D = max_v
    |F1(v) - F2(v)| over the union of observed values, plus the scaled
    statistic lambda = D * sqrt(n1*n2/(n1+n2)) used for significance
    lookup — the classic "did these two cohorts draw from the same
    distribution?" gate for dataset drift and A/B sanity checks (the
    reference has no statistics surface).

    Determinism: balances become integer cents, per-(segment, value)
    counts are BIGINT, and D is maximized on the CROSS-MULTIPLIED
    integer form |c1*n2 - c2*n1| (exact), divided by n1*n2 exactly once
    at the end — no per-step float ECDFs to disagree on.

    Scale: the corpus-sized stage is a combinable (segment, cents)
    histogram; the ECDF walk is a cumulative window PARTITIONED BY
    SEGMENT PAIR over histogram rows (distinct values, not customers).
    Pair generation is an inequality self-join over the |segments|-row
    aggregate (5 rows) — fact rows never enter a non-equi join."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    hist = (
        cust.select(
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("c_acctbal").cast("double") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("v"),
        )
        .groupBy("seg", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = hist.groupBy("seg").agg(F.sum("cnt").cast("bigint").alias("n"))
    segs = hist.select("seg").distinct()
    pairs = (
        segs.alias("a")
        .join(segs.alias("b"), F.col("a.seg") < F.col("b.seg"))
        .select(F.col("a.seg").alias("s1"), F.col("b.seg").alias("s2"))
    )
    zero = F.lit(0).cast("bigint")
    e1 = pairs.join(F.broadcast(hist), F.col("seg") == F.col("s1")).select(
        "s1", "s2", "v", F.col("cnt").alias("a1"), zero.alias("a2")
    )
    e2 = pairs.join(F.broadcast(hist), F.col("seg") == F.col("s2")).select(
        "s1", "s2", "v", zero.alias("a1"), F.col("cnt").alias("a2")
    )
    g = (
        e1.unionAll(e2)
        .groupBy("s1", "s2", "v")
        .agg(
            F.sum("a1").cast("bigint").alias("a1"),
            F.sum("a2").cast("bigint").alias("a2"),
        )
    )
    w = (
        Window.partitionBy("s1", "s2")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = g.select(
        "s1",
        "s2",
        F.sum("a1").over(w).cast("bigint").alias("c1"),
        F.sum("a2").over(w).cast("bigint").alias("c2"),
    )
    t1 = tot.select(F.col("seg").alias("s1"), F.col("n").alias("n1"))
    t2 = tot.select(F.col("seg").alias("s2"), F.col("n").alias("n2"))
    dnum = (
        c.join(F.broadcast(t1), "s1")
        .join(F.broadcast(t2), "s2")
        .groupBy("s1", "s2", "n1", "n2")
        .agg(
            F.max(
                F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            )
            .cast("bigint")
            .alias("d_num")
        )
    )
    dn = F.col("d_num").cast("double")
    nn = (F.col("n1") * F.col("n2")).cast("double")
    ks_d = dn / nn
    return dnum.select(
        "s1",
        "s2",
        "n1",
        "n2",
        round_half_up(ks_d, 6).alias("ks_d"),
        round_half_up(
            ks_d
            * F.sqrt(nn / (F.col("n1") + F.col("n2")).cast("double")),
            6,
        ).alias("ks_lambda"),
    ).orderBy("s1", "s2")


@query(
    "kendall_tau_event_pairs",
    category="aggregation",
    oracle=f"""
        WITH daily AS (
            SELECT event_type AS et, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                       AS BIGINT) AS ds
            FROM events WHERE isfinite(value) GROUP BY 1, 2),
        j AS (
            SELECT p.et AS t1, q.et AS t2, p.day, p.ds AS x, q.ds AS y
            FROM daily p JOIN daily q
              ON q.day = p.day AND p.et < q.et),
        pr AS (
            SELECT a.t1, a.t2,
                   CASE WHEN b.x > a.x THEN 1
                        WHEN b.x < a.x THEN -1 ELSE 0 END AS sx,
                   CASE WHEN b.y > a.y THEN 1
                        WHEN b.y < a.y THEN -1 ELSE 0 END AS sy
            FROM j a JOIN j b
              ON b.t1 = a.t1 AND b.t2 = a.t2 AND a.day < b.day),
        agg AS (
            SELECT t1, t2,
                   CAST(COUNT(*) AS BIGINT) AS n0,
                   CAST(SUM(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS conc,
                   CAST(SUM(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS disc,
                   CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS tx,
                   CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS ty
            FROM pr GROUP BY 1, 2)
        SELECT t1, t2, n0, conc, disc,
               {sql_round_half_up(
                   "CAST(conc - disc AS DOUBLE)"
                   " / sqrt(CAST(n0 - tx AS DOUBLE)"
                   " * CAST(n0 - ty AS DOUBLE))", 6)} AS tau_b
        FROM agg ORDER BY t1, t2
    """,
)
def kendall_tau_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between every pair of event
    types' DAILY value totals on shared days: tau_b =
    (C - D) / sqrt((n0 - Tx)(n0 - Ty)) with C/D the concordant and
    discordant day pairs and Tx/Ty tie corrections — the
    outlier-robust "which metrics co-move?" complement to the existing
    Spearman query (rank correlation over pairwise ORDER relations
    rather than rank differences; the reference has no statistics
    surface).

    Determinism: day totals are exact BIGINT cents, so every pairwise
    comparison is integer; C, D, Tx, Ty, n0 stay BIGINT and the only
    double is one identical final expression per engine.

    Scale: the corpus-sized stage is the combinable (event_type, day)
    roll-up; pairing days is quadratic ONLY in the calendar length per
    type pair (equi-keyed on the pair, never corpus-quadratic), same
    shape the Mann-Kendall query already carries."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    finite = ~(
        F.isnan(v) | (v == F.lit(float("inf"))) | (v == F.lit(float("-inf")))
    )
    daily = (
        ev.filter(finite)
        .groupBy(
            F.col("event_type").alias("et"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(
            F.sum(F.floor(v * F.lit(100.0) + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("ds")
        )
    )
    p, q = daily.alias("p"), daily.alias("q")
    j = p.join(
        q,
        (F.col("q.day") == F.col("p.day")) & (F.col("p.et") < F.col("q.et")),
    ).select(
        F.col("p.et").alias("t1"),
        F.col("q.et").alias("t2"),
        F.col("p.day").alias("day"),
        F.col("p.ds").alias("x"),
        F.col("q.ds").alias("y"),
    )
    a, b = j.alias("a"), j.alias("b")
    sx = F.signum((F.col("b.x") - F.col("a.x")).cast("double")).cast("int")
    sy = F.signum((F.col("b.y") - F.col("a.y")).cast("double")).cast("int")
    pr = a.join(
        b,
        (F.col("b.t1") == F.col("a.t1"))
        & (F.col("b.t2") == F.col("a.t2"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.t1").alias("t1"),
        F.col("a.t2").alias("t2"),
        sx.alias("sx"),
        sy.alias("sy"),
    )
    one = F.lit(1)
    agg = pr.groupBy("t1", "t2").agg(
        F.count(one).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("sx") * F.col("sy") == 1, one).otherwise(0))
        .cast("bigint")
        .alias("conc"),
        F.sum(F.when(F.col("sx") * F.col("sy") == -1, one).otherwise(0))
        .cast("bigint")
        .alias("disc"),
        F.sum(F.when(F.col("sx") == 0, one).otherwise(0))
        .cast("bigint")
        .alias("tx"),
        F.sum(F.when(F.col("sy") == 0, one).otherwise(0))
        .cast("bigint")
        .alias("ty"),
    )
    return agg.select(
        "t1",
        "t2",
        "n0",
        "conc",
        "disc",
        round_half_up(
            (F.col("conc") - F.col("disc")).cast("double")
            / F.sqrt(
                (F.col("n0") - F.col("tx")).cast("double")
                * (F.col("n0") - F.col("ty")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    ).orderBy("t1", "t2")


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < CAST({c!r} AS DOUBLE) THEN {k}"
        for k, c in enumerate(_POIS1_CDF)
    )
    return f"CASE {branches} ELSE 7 END"


@query(
    "poisson_bootstrap_ci_acctbal",
    category="aggregation",
    oracle=f"""
        WITH base AS (
            SELECT c_mktsegment AS seg, c_custkey,
                   CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
            FROM customer),
        rep AS (
            SELECT b.seg, b.cents,
                   r.b,
                   {_pois_case_sql(
                       "CAST(CAST('0x' || substring(md5("
                       "CAST(b.c_custkey AS VARCHAR) || ':' ||"
                       " CAST(r.b AS VARCHAR)), 1, 15) AS BIGINT)"
                       " AS DOUBLE) / 1152921504606846976.0")} AS w
            FROM base b CROSS JOIN (
                SELECT CAST(unnest(range(32)) AS BIGINT) AS b) r),
        means AS (
            SELECT seg, b,
                   CAST(SUM(w * cents) AS DOUBLE)
                       / (CAST(SUM(w) AS DOUBLE) * 100.0) AS wm
            FROM rep GROUP BY 1, 2
            HAVING SUM(w) > 0),
        ranked AS (
            SELECT seg, wm,
                   row_number() OVER (PARTITION BY seg
                                      ORDER BY wm, b) AS rn
            FROM means),
        ci AS (
            SELECT seg,
                   MAX(CASE WHEN rn = 2 THEN wm END) AS lo,
                   MAX(CASE WHEN rn = 31 THEN wm END) AS hi
            FROM ranked GROUP BY 1),
        pt AS (
            SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS DOUBLE)
                       / (CAST(COUNT(*) AS DOUBLE) * 100.0) AS m
            FROM base GROUP BY 1)
        SELECT p.seg AS mktsegment, p.n,
               {sql_round_half_up("p.m", 6)} AS mean_bal,
               {sql_round_half_up("c.lo", 6)} AS ci_lo,
               {sql_round_half_up("c.hi", 6)} AS ci_hi
        FROM pt p JOIN ci c ON c.seg = p.seg
        ORDER BY mktsegment
    """,
)
def poisson_bootstrap_ci_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 90% confidence interval for the mean account
    balance per market segment: B=32 replicates where each customer's
    replicate weight is Poisson(1)-distributed — the single-pass,
    shuffle-free bootstrap used at web scale precisely BECAUSE true
    multinomial resampling needs the global row count up front
    (Chamandy et al., Google 2012). CI bounds are the 5th/95th
    nearest-rank replicate means.

    Determinism: weights come from the repo's md5->bigint->[0,1) hash
    of (custkey, replicate) pushed through a CASE ladder of exact
    Poisson(1) CDF literals (identical IEEE doubles both engines);
    replicate means divide exact BIGINT weighted-cent sums once;
    nearest ranks are integer row_numbers tie-broken by replicate id.

    Scale: the explode is a constant x32 of the dim table (weights are
    computed, never shuffled as state); replicate means are combinable
    aggregates; the final rank runs over 32 rows per segment. At 100 TB
    the same plan bootstraps a fact metric with B controlled
    independently of data size."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_mktsegment").alias("seg"),
        "c_custkey",
        F.floor(F.col("c_acctbal").cast("double") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    reps = base.select(
        "seg",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
        F.col("c_custkey"),
    ).withColumn(
        "u",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("c_custkey").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        .cast("double")
        / F.lit(1152921504606846976.0),
    )
    w = F.lit(7)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(F.col("u") < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    means = (
        reps.select("seg", "b", "cents", w.alias("w"))
        .groupBy("seg", "b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).cast("bigint").alias("swc"),
            F.sum("w").cast("bigint").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "seg",
            "b",
            (
                F.col("swc").cast("double")
                / (F.col("sw").cast("double") * F.lit(100.0))
            ).alias("wm"),
        )
    )
    w_rank = Window.partitionBy("seg").orderBy("wm", "b")
    ci = (
        means.select("seg", "wm", F.row_number().over(w_rank).alias("rn"))
        .groupBy("seg")
        .agg(
            F.max(F.when(F.col("rn") == 2, F.col("wm"))).alias("lo"),
            F.max(F.when(F.col("rn") == 31, F.col("wm"))).alias("hi"),
        )
    )
    pt = base.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum("cents").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(100.0))
        ).alias("m"),
    )
    return (
        pt.join(F.broadcast(ci), "seg")
        .select(
            F.col("seg").alias("mktsegment"),
            "n",
            round_half_up(F.col("m"), 6).alias("mean_bal"),
            round_half_up(F.col("lo"), 6).alias("ci_lo"),
            round_half_up(F.col("hi"), 6).alias("ci_hi"),
        )
        .orderBy("mktsegment")
    )


@query(
    "pca_2d_parts_by_brand",
    category="aggregation",
    oracle=f"""
        WITH agg AS (
            SELECT p_brand AS brand,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(p_retailprice * 100.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS sx,
                   CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS sy,
                   CAST(SUM(CAST(floor(p_retailprice * 100.0 + 0.5)
                       AS BIGINT) * CAST(floor(p_retailprice * 100.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS sxx,
                   CAST(SUM(CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT))
                       AS BIGINT) AS syy,
                   CAST(SUM(CAST(floor(p_retailprice * 100.0 + 0.5)
                       AS BIGINT) * CAST(p_size AS BIGINT)) AS BIGINT) AS sxy
            FROM part GROUP BY 1),
        v AS (
            SELECT brand, n,
                   CAST(n * sxx - sx * sx AS DOUBLE)
                       / (CAST(n * n AS DOUBLE) * 10000.0) AS vxx,
                   CAST(n * syy - sy * sy AS DOUBLE)
                       / CAST(n * n AS DOUBLE) AS vyy,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                       / (CAST(n * n AS DOUBLE) * 100.0) AS vxy
            FROM agg),
        eig AS (
            SELECT brand, n, vxx, vyy, vxy,
                   sqrt((vxx - vyy) * (vxx - vyy) + 4.0 * vxy * vxy)
                       AS disc
            FROM v)
        SELECT brand, n,
               {sql_round_half_up(
                   "0.5 * atan2(2.0 * vxy, vxx - vyy)", 6)} AS theta,
               {sql_round_half_up("(vxx + vyy + disc) / 2.0", 6)}
                   AS lambda1,
               {sql_round_half_up("(vxx + vyy - disc) / 2.0", 6)}
                   AS lambda2,
               {sql_round_half_up(
                   "((vxx + vyy + disc) / 2.0) / (vxx + vyy)", 6)} AS evr
        FROM eig ORDER BY brand
    """,
)
def pca_2d_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form 2-feature PCA of (retail price, size) per part
    brand: principal-axis angle theta = atan2(2*cov, varx - vary) / 2,
    both eigenvalues from the trace/discriminant identity, and the
    explained-variance ratio lambda1/(lambda1+lambda2) — the 2x2
    eigenproblem has an exact closed form, so the whole decomposition
    is ONE combinable aggregation pass with no iteration and no driver
    linear algebra (the pattern that generalizes to d-dimensional PCA
    via a d x d Gram-matrix aggregate; the reference has no linear
    algebra surface).

    Determinism: the five moment sums are BIGINT-exact in cents/size
    units (bounded ~1e16 < 2^63 at bench scale); covariances divide
    once into population-variance doubles; theta/eigenvalues/EVR are
    identical IEEE expression trees (atan2 and sqrt on equal inputs).

    Scale: a single map-side-combinable groupBy over the corpus — the
    canonical "moment sketch" shape; output is |brands| rows."""
    part = load_table(spark, sf_dir, "part")
    xc = F.floor(
        F.col("p_retailprice").cast("double") * F.lit(100.0) + F.lit(0.5)
    ).cast("bigint")
    yc = F.col("p_size").cast("bigint")
    agg = part.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xc).cast("bigint").alias("sx"),
        F.sum(yc).cast("bigint").alias("sy"),
        F.sum(xc * xc).cast("bigint").alias("sxx"),
        F.sum(yc * yc).cast("bigint").alias("syy"),
        F.sum(xc * yc).cast("bigint").alias("sxy"),
    )
    n = F.col("n")
    nn = (n * n).cast("double")
    v = agg.select(
        "brand",
        "n",
        ((n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
         / (nn * F.lit(10000.0))).alias("vxx"),
        ((n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
         / nn).alias("vyy"),
        ((n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
         / (nn * F.lit(100.0))).alias("vxy"),
    )
    vxx, vyy, vxy = F.col("vxx"), F.col("vyy"), F.col("vxy")
    disc = F.sqrt(
        (vxx - vyy) * (vxx - vyy) + F.lit(4.0) * vxy * vxy
    )
    eig = v.select("brand", "n", "vxx", "vyy", "vxy", disc.alias("disc"))
    l1 = (vxx + vyy + F.col("disc")) / F.lit(2.0)
    l2 = (vxx + vyy - F.col("disc")) / F.lit(2.0)
    return eig.select(
        "brand",
        "n",
        round_half_up(
            F.lit(0.5) * F.atan2(F.lit(2.0) * vxy, vxx - vyy), 6
        ).alias("theta"),
        round_half_up(l1, 6).alias("lambda1"),
        round_half_up(l2, 6).alias("lambda2"),
        round_half_up(l1 / (vxx + vyy), 6).alias("evr"),
    ).orderBy("brand")


@query(
    "permutation_test_mean_diff",
    category="aggregation",
    oracle=f"""
        WITH base AS (
            SELECT c_mktsegment AS seg, c_custkey,
                   CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
            FROM customer),
        tot AS (
            SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS s
            FROM base GROUP BY 1),
        segs AS (SELECT DISTINCT seg FROM base),
        pairs AS (
            SELECT a.seg AS s1, b.seg AS s2
            FROM segs a JOIN segs b ON a.seg < b.seg),
        obs AS (
            SELECT p.s1, p.s2, t1.n AS n1, t2.n AS n2,
                   CAST(t1.s AS DOUBLE) / (CAST(t1.n AS DOUBLE) * 100.0)
                   - CAST(t2.s AS DOUBLE) / (CAST(t2.n AS DOUBLE) * 100.0)
                       AS t_obs
            FROM pairs p
            JOIN tot t1 ON t1.seg = p.s1
            JOIN tot t2 ON t2.seg = p.s2),
        members AS (
            SELECT p.s1, p.s2, b.c_custkey, b.cents
            FROM pairs p JOIN base b ON b.seg = p.s1
            UNION ALL
            SELECT p.s1, p.s2, b.c_custkey, b.cents
            FROM pairs p JOIN base b ON b.seg = p.s2),
        flips AS (
            SELECT m.s1, m.s2, m.cents, r.b,
                   CASE WHEN CAST(CAST('0x' || substring(md5(
                       CAST(m.c_custkey AS VARCHAR) || ':' ||
                       CAST(r.b AS VARCHAR) || ':' || m.s1 || ':' || m.s2),
                       1, 15) AS BIGINT) AS DOUBLE)
                       / 1152921504606846976.0
                       < CAST(o.n1 AS DOUBLE)
                         / CAST(o.n1 + o.n2 AS DOUBLE)
                   THEN 1 ELSE 0 END AS side
            FROM members m
            JOIN obs o ON o.s1 = m.s1 AND o.s2 = m.s2
            CROSS JOIN (SELECT CAST(unnest(range(64)) AS BIGINT) AS b) r),
        null_t AS (
            SELECT s1, s2, b,
                   CAST(SUM(CASE WHEN side = 1 THEN cents END) AS DOUBLE)
                     / (CAST(SUM(side) AS DOUBLE) * 100.0)
                   - CAST(SUM(CASE WHEN side = 0 THEN cents END) AS DOUBLE)
                     / (CAST(SUM(1 - side) AS DOUBLE) * 100.0) AS t_b
            FROM flips GROUP BY 1, 2, 3
            HAVING SUM(side) > 0 AND SUM(1 - side) > 0),
        extreme AS (
            SELECT n.s1, n.s2,
                   CAST(COUNT(*) AS BIGINT) AS n_reps,
                   CAST(SUM(CASE WHEN abs(n.t_b) >= abs(o.t_obs)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
            FROM null_t n JOIN obs o ON o.s1 = n.s1 AND o.s2 = n.s2
            GROUP BY 1, 2)
        SELECT o.s1, o.s2, o.n1, o.n2,
               {sql_round_half_up("o.t_obs", 6)} AS t_obs,
               e.n_extreme,
               {sql_round_half_up(
                   "CAST(e.n_extreme + 1 AS DOUBLE)"
                   " / CAST(e.n_reps + 1 AS DOUBLE)", 6)} AS p_value
        FROM obs o JOIN extreme e ON e.s1 = o.s1 AND e.s2 = o.s2
        ORDER BY o.s1, o.s2
    """,
)
def permutation_test_mean_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monte-Carlo randomization test for the mean account-balance
    difference between every market-segment pair: B=64 deterministic
    random relabelings of the pooled customers (each customer joins
    side 1 with probability n1/(n1+n2), so null group sizes are
    binomial around the observed split), null statistic = difference
    of relabeled means, p = (1 + #{|T_b| >= |T_obs|}) / (B + 1) — the
    distribution-free significance gate that complements the
    parametric Welch t and the rank-based Mann-Whitney queries.

    Determinism: relabeling comes from the md5->bigint->[0,1) hash of
    (custkey, replicate, pair); all sums are BIGINT cents; each mean
    difference is the identical IEEE expression, so |T_b| >= |T_obs|
    compares bit-identical doubles on both engines.

    Scale: one combinable pass builds the pooled members; the x64
    replicate explosion carries (pair, cents, bit) only — weights are
    computed, never shuffled as state; per-replicate means are
    combinable aggregates, 64 rows per pair at the end. Pair
    generation is the whitelisted 5-row inequality self-join."""
    # r12 optimization (guide §2.5): the ×64 replicate explode and its
    # per-row md5 relabeling hash (the dominant ~3.5 s of this query,
    # measured r12 session 3) pipeline into the customer scan stage —
    # single-row-group fixture = one task. Fan-out spreads the md5 work;
    # bh_fdr_segment_tests composes this builder and inherits the win.
    cust = load_table(spark, sf_dir, "customer", fan_out=True)
    base = cust.select(
        F.col("c_mktsegment").alias("seg"),
        "c_custkey",
        F.floor(F.col("c_acctbal").cast("double") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    tot = base.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    segs = base.select("seg").distinct()
    pairs = (
        segs.alias("a")
        .join(segs.alias("b"), F.col("a.seg") < F.col("b.seg"))
        .select(F.col("a.seg").alias("s1"), F.col("b.seg").alias("s2"))
    )
    t1 = tot.select(
        F.col("seg").alias("s1"),
        F.col("n").alias("n1"),
        F.col("s").alias("sum1"),
    )
    t2 = tot.select(
        F.col("seg").alias("s2"),
        F.col("n").alias("n2"),
        F.col("s").alias("sum2"),
    )
    obs = (
        pairs.join(F.broadcast(t1), "s1")
        .join(F.broadcast(t2), "s2")
        .select(
            "s1",
            "s2",
            "n1",
            "n2",
            (
                F.col("sum1").cast("double")
                / (F.col("n1").cast("double") * F.lit(100.0))
                - F.col("sum2").cast("double")
                / (F.col("n2").cast("double") * F.lit(100.0))
            ).alias("t_obs"),
        )
    )
    # Broadcast the PAIRS side explicitly (guide §3.1): both sides are
    # byte-tiny, and left to itself the planner broadcast `base` and
    # streamed the 10-row pairs table — putting the ×64 replicate explode
    # and its per-row md5 (the query's dominant cost) downstream of a
    # 1-partition input, single-task. Broadcasting pairs streams `base`
    # (fanned out above), so the md5 work spreads over the cluster.
    m1 = F.broadcast(pairs).join(base, F.col("seg") == F.col("s1")).select(
        "s1", "s2", "c_custkey", "cents"
    )
    m2 = F.broadcast(pairs).join(base, F.col("seg") == F.col("s2")).select(
        "s1", "s2", "c_custkey", "cents"
    )
    members = m1.unionAll(m2)
    thresh = F.col("n1").cast("double") / (
        F.col("n1") + F.col("n2")
    ).cast("double")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("c_custkey").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("s1"),
                        F.lit(":"),
                        F.col("s2"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
        / F.lit(1152921504606846976.0)
    )
    flips = (
        members.join(
            F.broadcast(obs.select("s1", "s2", "n1", "n2")), ["s1", "s2"]
        )
        .select(
            "s1",
            "s2",
            "cents",
            "c_custkey",
            "n1",
            "n2",
            F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"),
        )
        .select(
            "s1",
            "s2",
            "cents",
            "b",
            F.when(u < thresh, F.lit(1)).otherwise(F.lit(0)).alias("side"),
        )
    )
    side = F.col("side")
    null_t = (
        flips.groupBy("s1", "s2", "b")
        .agg(
            F.sum(F.when(side == 1, F.col("cents"))).cast("bigint").alias("sa"),
            F.sum(side).cast("bigint").alias("na"),
            F.sum(F.when(side == 0, F.col("cents"))).cast("bigint").alias("sb"),
            F.sum(1 - side).cast("bigint").alias("nb"),
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            "s1",
            "s2",
            (
                F.col("sa").cast("double")
                / (F.col("na").cast("double") * F.lit(100.0))
                - F.col("sb").cast("double")
                / (F.col("nb").cast("double") * F.lit(100.0))
            ).alias("t_b"),
        )
    )
    extreme = (
        null_t.join(F.broadcast(obs.select("s1", "s2", "t_obs")), ["s1", "s2"])
        .groupBy("s1", "s2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reps"),
            F.sum(
                F.when(F.abs(F.col("t_b")) >= F.abs(F.col("t_obs")), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_extreme"),
        )
    )
    return (
        obs.join(F.broadcast(extreme), ["s1", "s2"])
        .select(
            "s1",
            "s2",
            "n1",
            "n2",
            round_half_up(F.col("t_obs"), 6).alias("t_obs"),
            "n_extreme",
            round_half_up(
                (F.col("n_extreme") + 1).cast("double")
                / (F.col("n_reps") + 1).cast("double"),
                6,
            ).alias("p_value"),
        )
        .orderBy("s1", "s2")
    )


@query(
    "logistic_regression_gd",
    category="aggregation",
    oracle="""
        WITH base AS MATERIALIZED (
            SELECT CAST(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)
                       AS DOUBLE) / 5000.0 AS x1,
                   CAST(CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT)
                       AS DOUBLE) / 1000.0 AS x2,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
            FROM lineitem),
        w0 AS (SELECT CAST(0.0 AS DOUBLE) AS a, CAST(0.0 AS DOUBLE) AS b,
                      CAST(0.0 AS DOUBLE) AS c),
        w1 AS MATERIALIZED (
            SELECT w0.a - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w0.a + w0.b * base.x1 + w0.c * base.x2))) - CAST(base.y AS DOUBLE))) THEN floor(((1.0 / (1.0 + exp(-(w0.a + w0.b * base.x1 + w0.c * base.x2))) - CAST(base.y AS DOUBLE))) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS a,
                   w0.b - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w0.a + w0.b * base.x1 + w0.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x1) THEN floor(((1.0 / (1.0 + exp(-(w0.a + w0.b * base.x1 + w0.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x1) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS b,
                   w0.c - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w0.a + w0.b * base.x1 + w0.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x2) THEN floor(((1.0 / (1.0 + exp(-(w0.a + w0.b * base.x1 + w0.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x2) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS c
            FROM base CROSS JOIN w0
            GROUP BY w0.a, w0.b, w0.c),
        w2 AS MATERIALIZED (
            SELECT w1.a - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w1.a + w1.b * base.x1 + w1.c * base.x2))) - CAST(base.y AS DOUBLE))) THEN floor(((1.0 / (1.0 + exp(-(w1.a + w1.b * base.x1 + w1.c * base.x2))) - CAST(base.y AS DOUBLE))) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS a,
                   w1.b - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w1.a + w1.b * base.x1 + w1.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x1) THEN floor(((1.0 / (1.0 + exp(-(w1.a + w1.b * base.x1 + w1.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x1) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS b,
                   w1.c - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w1.a + w1.b * base.x1 + w1.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x2) THEN floor(((1.0 / (1.0 + exp(-(w1.a + w1.b * base.x1 + w1.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x2) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS c
            FROM base CROSS JOIN w1
            GROUP BY w1.a, w1.b, w1.c),
        w3 AS MATERIALIZED (
            SELECT w2.a - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w2.a + w2.b * base.x1 + w2.c * base.x2))) - CAST(base.y AS DOUBLE))) THEN floor(((1.0 / (1.0 + exp(-(w2.a + w2.b * base.x1 + w2.c * base.x2))) - CAST(base.y AS DOUBLE))) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS a,
                   w2.b - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w2.a + w2.b * base.x1 + w2.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x1) THEN floor(((1.0 / (1.0 + exp(-(w2.a + w2.b * base.x1 + w2.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x1) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS b,
                   w2.c - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w2.a + w2.b * base.x1 + w2.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x2) THEN floor(((1.0 / (1.0 + exp(-(w2.a + w2.b * base.x1 + w2.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x2) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS c
            FROM base CROSS JOIN w2
            GROUP BY w2.a, w2.b, w2.c),
        w4 AS MATERIALIZED (
            SELECT w3.a - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w3.a + w3.b * base.x1 + w3.c * base.x2))) - CAST(base.y AS DOUBLE))) THEN floor(((1.0 / (1.0 + exp(-(w3.a + w3.b * base.x1 + w3.c * base.x2))) - CAST(base.y AS DOUBLE))) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS a,
                   w3.b - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w3.a + w3.b * base.x1 + w3.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x1) THEN floor(((1.0 / (1.0 + exp(-(w3.a + w3.b * base.x1 + w3.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x1) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS b,
                   w3.c - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w3.a + w3.b * base.x1 + w3.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x2) THEN floor(((1.0 / (1.0 + exp(-(w3.a + w3.b * base.x1 + w3.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x2) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS c
            FROM base CROSS JOIN w3
            GROUP BY w3.a, w3.b, w3.c),
        w5 AS MATERIALIZED (
            SELECT w4.a - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w4.a + w4.b * base.x1 + w4.c * base.x2))) - CAST(base.y AS DOUBLE))) THEN floor(((1.0 / (1.0 + exp(-(w4.a + w4.b * base.x1 + w4.c * base.x2))) - CAST(base.y AS DOUBLE))) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS a,
                   w4.b - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w4.a + w4.b * base.x1 + w4.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x1) THEN floor(((1.0 / (1.0 + exp(-(w4.a + w4.b * base.x1 + w4.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x1) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS b,
                   w4.c - 0.5 * (CAST(SUM(CAST(CASE WHEN isfinite((1.0 / (1.0 + exp(-(w4.a + w4.b * base.x1 + w4.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x2) THEN floor(((1.0 / (1.0 + exp(-(w4.a + w4.b * base.x1 + w4.c * base.x2))) - CAST(base.y AS DOUBLE)) * base.x2) * 1000000000.0 + 0.5) / 1000000000.0 END
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) AS c
            FROM base CROSS JOIN w4
            GROUP BY w4.a, w4.b, w4.c)
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CASE WHEN isfinite(w5.a) THEN floor((w5.a) * 1000000.0 + 0.5) / 1000000.0 END AS w0,
               CASE WHEN isfinite(w5.b) THEN floor((w5.b) * 1000000.0 + 0.5) / 1000000.0 END AS w1,
               CASE WHEN isfinite(w5.c) THEN floor((w5.c) * 1000000.0 + 0.5) / 1000000.0 END AS w2,
               CASE WHEN isfinite(CAST(SUM(CASE WHEN ((w5.a + w5.b * base.x1 + w5.c * base.x2) > 0.0) = (base.y = 1) THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) THEN floor((CAST(SUM(CASE WHEN ((w5.a + w5.b * base.x1 + w5.c * base.x2) > 0.0) = (base.y = 1) THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 END AS accuracy,
               CASE WHEN isfinite(CAST(SUM(CAST(CASE WHEN isfinite(-(CAST(base.y AS DOUBLE) * ln(1.0 / (1.0 + exp(-(w5.a + w5.b * base.x1 + w5.c * base.x2)))) + (1.0 - CAST(base.y AS DOUBLE)) * ln(1.0 - 1.0 / (1.0 + exp(-(w5.a + w5.b * base.x1 + w5.c * base.x2)))))) THEN floor((-(CAST(base.y AS DOUBLE) * ln(1.0 / (1.0 + exp(-(w5.a + w5.b * base.x1 + w5.c * base.x2)))) + (1.0 - CAST(base.y AS DOUBLE)) * ln(1.0 - 1.0 / (1.0 + exp(-(w5.a + w5.b * base.x1 + w5.c * base.x2)))))) * 1000000000.0 + 0.5) / 1000000000.0 END AS DECIMAL(28,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) THEN floor((CAST(SUM(CAST(CASE WHEN isfinite(-(CAST(base.y AS DOUBLE) * ln(1.0 / (1.0 + exp(-(w5.a + w5.b * base.x1 + w5.c * base.x2)))) + (1.0 - CAST(base.y AS DOUBLE)) * ln(1.0 - 1.0 / (1.0 + exp(-(w5.a + w5.b * base.x1 + w5.c * base.x2)))))) THEN floor((-(CAST(base.y AS DOUBLE) * ln(1.0 / (1.0 + exp(-(w5.a + w5.b * base.x1 + w5.c * base.x2)))) + (1.0 - CAST(base.y AS DOUBLE)) * ln(1.0 - 1.0 / (1.0 + exp(-(w5.a + w5.b * base.x1 + w5.c * base.x2)))))) * 1000000000.0 + 0.5) / 1000000000.0 END AS DECIMAL(28,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 END AS log_loss
        FROM base CROSS JOIN w5
        GROUP BY w5.a, w5.b, w5.c
""",
)
def logistic_regression_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression by five full-batch gradient
    steps: predict l_returnflag = 'R' from scaled quantity and
    discount, each step ONE combinable aggregate over the corpus with
    the 1-row model broadcast back — the canonical data-parallel GD
    shape (model state never shuffles; only d+1 gradient sums cross
    the wire per step), which is how any linear model trains at 100 TB
    without a parameter server.

    Determinism: features enter as exact integer cents/basis-points
    divided once; every per-row gradient term is 9-dp-rounded into
    DECIMAL(28,12) so the cross-partition sums are order-independent;
    the weight update and sigmoid are identical IEEE expression trees,
    replayed step-for-step by the oracle's five MATERIALIZED CTE
    levels. Final metrics (accuracy via the sign of the exact logit,
    mean log-loss) come from one more broadcast pass.

    Scale: 6 corpus passes total; each is map-side combinable with a
    3-double model broadcast. The fixture's D/A/N flags are nearly
    label-independent of these two features, so the fit converges to a
    weak but deterministic model — the point is the exact distributed
    training loop, not the AUC."""
    # r12 optimization (guide §2.5): every one of the 6 GD passes pipelines
    # its sigmoid + 9-dp decimal gradient terms into the lineitem scan
    # stage; the unsplittable single-row-group fixture serialized all six
    # passes onto one core (profiled 8.2 s). Fan-out spreads each pass.
    li = load_table(spark, sf_dir, "lineitem", fan_out=True)
    base = li.select(
        (
            F.floor(F.col("l_quantity").cast("double") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .cast("double")
            / F.lit(5000.0)
        ).alias("x1"),
        (
            F.floor(F.col("l_discount").cast("double") * F.lit(10000.0) + F.lit(0.5))
            .cast("bigint")
            .cast("double")
            / F.lit(1000.0)
        ).alias("x2"),
        F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    w = None  # 1-row (a, b, c) model DataFrame; starts at the origin
    for step in range(5):
        if w is None:
            joined = base.select(
                "x1", "x2", "y",
                F.lit(0.0).alias("a"), F.lit(0.0).alias("b"), F.lit(0.0).alias("c"),
            )
        else:
            joined = base.crossJoin(F.broadcast(w))
        p = F.lit(1.0) / (
            F.lit(1.0)
            + F.exp(-(F.col("a") + F.col("b") * F.col("x1") + F.col("c") * F.col("x2")))
        )
        err = p - F.col("y").cast("double")
        grads = joined.groupBy("a", "b", "c").agg(
            F.sum(round_half_up(err, 9).cast(_DEC)).cast("double").alias("g0"),
            F.sum(round_half_up(err * F.col("x1"), 9).cast(_DEC)).cast("double").alias("g1"),
            F.sum(round_half_up(err * F.col("x2"), 9).cast(_DEC)).cast("double").alias("g2"),
            F.count(F.lit(1)).cast("double").alias("nd"),
        )
        w = grads.select(
            (F.col("a") - F.lit(0.5) * (F.col("g0") / F.col("nd"))).alias("a"),
            (F.col("b") - F.lit(0.5) * (F.col("g1") / F.col("nd"))).alias("b"),
            (F.col("c") - F.lit(0.5) * (F.col("g2") / F.col("nd"))).alias("c"),
        )
    fin = base.crossJoin(F.broadcast(w))
    z = F.col("a") + F.col("b") * F.col("x1") + F.col("c") * F.col("x2")
    pf = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    yd = F.col("y").cast("double")
    ll = -(yd * F.log(pf) + (F.lit(1.0) - yd) * F.log(F.lit(1.0) - pf))
    return fin.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when((z > 0.0) == (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_right"),
        F.sum(round_half_up(ll, 9).cast(_DEC)).cast("double").alias("llsum"),
    ).select(
        "n",
        round_half_up(F.col("a"), 6).alias("w0"),
        round_half_up(F.col("b"), 6).alias("w1"),
        round_half_up(F.col("c"), 6).alias("w2"),
        round_half_up(
            F.col("n_right").cast("double") / F.col("n").cast("double"), 6
        ).alias("accuracy"),
        round_half_up(F.col("llsum") / F.col("n").cast("double"), 6).alias(
            "log_loss"
        ),
    )


@query(
    "sprt_ab_conversion",
    category="aggregation",
    oracle=f"""
        WITH ev AS (
            SELECT user_id % 2 AS v, ts, event_id,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events),
        walk AS (
            SELECT v, ts, event_id, y,
                   CAST(row_number() OVER w AS BIGINT) AS rn,
                   CAST(SUM(y) OVER (PARTITION BY v ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS k
            FROM ev
            WINDOW w AS (PARTITION BY v ORDER BY ts, event_id)),
        llr AS (
            SELECT v, rn, k,
                   k * CAST({_SPRT_C1_N} AS BIGINT)
                   + (rn - k) * CAST({_SPRT_C0_N} AS BIGINT) AS ln9
            FROM walk),
        crossed AS (
            SELECT v, rn, ln9,
                   CASE WHEN ln9 >= CAST({_SPRT_A_N} AS BIGINT)
                        THEN 'accept_h1'
                        WHEN ln9 <= CAST({_SPRT_B_N} AS BIGINT)
                        THEN 'accept_h0' END AS dec
            FROM llr),
        firstx AS (
            SELECT v, MIN(rn) AS rn_x
            FROM crossed WHERE dec IS NOT NULL GROUP BY 1),
        at_x AS (
            SELECT c.v, c.rn AS n_at_decision, c.dec AS decision,
                   c.ln9 AS lx9
            FROM crossed c JOIN firstx f ON f.v = c.v AND f.rn_x = c.rn),
        tot AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS n_total,
                   CAST(SUM(y) AS BIGINT) AS n_conv
            FROM ev GROUP BY 1)
        SELECT t.v AS variant, t.n_total, t.n_conv,
               {sql_round_half_up(
                   "CAST(t.n_conv * CAST(" + str(_SPRT_C1_N)
                   + " AS BIGINT) + (t.n_total - t.n_conv)"
                   " * CAST(" + str(_SPRT_C0_N)
                   + " AS BIGINT) AS DOUBLE) / 1000000000.0", 6)}
                   AS llr_final,
               COALESCE(a.decision, 'continue') AS decision,
               a.n_at_decision,
               {sql_round_half_up(
                   "CAST(a.lx9 AS DOUBLE) / 1000000000.0", 6)}
                   AS llr_at_decision
        FROM tot t LEFT JOIN at_x a ON a.v = t.v
        ORDER BY variant
    """,
)
def sprt_ab_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability ratio test on the purchase
    conversion rate of two deterministic variants (user_id parity):
    H0 p=0.18 vs H1 p=0.22 at alpha=beta=0.05, the log-likelihood walk
    llr_t = k_t*ln(p1/p0) + (t-k_t)*ln(q1/q0) monitored until it first
    crosses a Wald boundary — THE sequential A/B early-stopping test
    (Wald 1945), reporting where each variant's evidence walk first
    decided and where it ended.

    Determinism: increments and thresholds are pre-folded 9-dp
    literals held in integer NANO units, so llr is pure BIGINT
    arithmetic on the success counter — no runtime ln, no float
    accumulation, and no DECIMAL->double casts (whose last-ulp
    rounding differs between engines near half-way points — observed
    live on this query's first draft, llr_final -12.814667 vs
    -12.814668); the only doubles are the two final /1e9 displays.

    Scale: the cumulative (rn, k) walk uses the bucketed two-phase
    pattern (cum within (variant, day) + broadcast per-day offsets) —
    partitioning a 2-value key alone would funnel the fact table into
    2 tasks (the weighted_median lesson); this keeps day-level
    parallelism while the per-day offset table stays calendar-sized.
    The first-crossing is a combinable MIN + one equi-join back."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("v"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    )
    w_in = (
        Window.partitionBy("v", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = ev.select(
        "v",
        "day",
        F.count(F.lit(1)).over(w_in).cast("bigint").alias("rn_in"),
        F.sum("y").over(w_in).cast("bigint").alias("k_in"),
    )
    day_tot = ev.groupBy("v", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("dc"),
        F.sum("y").cast("bigint").alias("dk"),
    )
    w_off = (
        Window.partitionBy("v")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = day_tot.select(
        "v",
        "day",
        F.coalesce(F.sum("dc").over(w_off), F.lit(0)).cast("bigint").alias("oc"),
        F.coalesce(F.sum("dk").over(w_off), F.lit(0)).cast("bigint").alias("ok"),
    )
    c1 = F.lit(_SPRT_C1_N).cast("bigint")
    c0 = F.lit(_SPRT_C0_N).cast("bigint")
    walk = within.join(F.broadcast(offsets), ["v", "day"]).select(
        "v",
        (F.col("oc") + F.col("rn_in")).alias("rn"),
        (F.col("ok") + F.col("k_in")).alias("k"),
    )
    llr = walk.select(
        "v",
        "rn",
        (F.col("k") * c1 + (F.col("rn") - F.col("k")) * c0).alias("ln9"),
    )
    crossed = llr.select(
        "v",
        "rn",
        "ln9",
        F.when(F.col("ln9") >= F.lit(_SPRT_A_N), F.lit("accept_h1"))
        .when(F.col("ln9") <= F.lit(_SPRT_B_N), F.lit("accept_h0"))
        .alias("dec"),
    )
    firstx = (
        crossed.filter(F.col("dec").isNotNull())
        .groupBy("v")
        .agg(F.min("rn").alias("rn_x"))
        .select(F.col("v").alias("vx"), "rn_x")
    )
    at_x = crossed.join(
        F.broadcast(firstx),
        (F.col("rn") == F.col("rn_x")) & (F.col("v") == F.col("vx")),
    ).select(
        "vx",
        F.col("rn").alias("n_at_decision"),
        F.col("dec").alias("decision"),
        F.col("ln9").alias("lx9"),
    )
    tot = ev.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("y").cast("bigint").alias("n_conv"),
    )
    lfin9 = (
        F.col("n_conv") * c1 + (F.col("n_total") - F.col("n_conv")) * c0
    )
    return (
        tot.join(F.broadcast(at_x), tot["v"] == at_x["vx"], "left")
        .select(
            tot["v"].alias("variant"),
            "n_total",
            "n_conv",
            round_half_up(
                lfin9.cast("double") / F.lit(1000000000.0), 6
            ).alias("llr_final"),
            F.coalesce(F.col("decision"), F.lit("continue")).alias(
                "decision"
            ),
            "n_at_decision",
            round_half_up(
                F.col("lx9").cast("double") / F.lit(1000000000.0), 6
            ).alias("llr_at_decision"),
        )
        .orderBy("variant")
    )


@query(
    "target_encoding_kfold",
    category="aggregation",
    oracle=f"""
        WITH base AS (
            SELECT o_orderpriority AS cat,
                   o_orderkey % 5 AS fold,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders),
        per_fold AS (
            SELECT cat, fold,
                   CAST(COUNT(*) AS BIGINT) AS n_f,
                   CAST(SUM(y) AS BIGINT) AS s_f
            FROM base GROUP BY 1, 2),
        per_cat AS (
            SELECT cat, CAST(SUM(n_f) AS BIGINT) AS n_c,
                   CAST(SUM(s_f) AS BIGINT) AS s_c
            FROM per_fold GROUP BY 1)
        SELECT f.cat AS category, f.fold, f.n_f AS n_fold,
               {sql_round_half_up(
                   "CAST(c.s_c - f.s_f AS DOUBLE)"
                   " / CAST(c.n_c - f.n_f AS DOUBLE)", 6)} AS encoding,
               {sql_round_half_up(
                   "CAST(c.s_c AS DOUBLE) / CAST(c.n_c AS DOUBLE)", 6)}
                   AS full_rate
        FROM per_fold f JOIN per_cat c ON c.cat = f.cat
        ORDER BY category, fold
    """,
)
def target_encoding_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe K-fold target encoding of order priority against
    the finished-order rate: each (category, fold) cell gets the target
    mean computed from the OTHER four folds — the standard trick that
    lets a model consume high-cardinality categoricals without the
    row's own label leaking into its feature (Micci-Barreca 2001; every
    gradient-boosting pipeline's mean encoder).

    Determinism: folds are o_orderkey % 5 (key-deterministic), all
    sums BIGINT, each encoding one exact leave-fold-out division.

    Scale: one combinable (category, fold) aggregate over the corpus;
    the leave-one-out arithmetic runs on |categories| x K rows. The
    encoder TABLE is what ships to training — rows never shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderpriority").alias("cat"),
        (F.col("o_orderkey") % 5).alias("fold"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
    )
    per_fold = base.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_f"),
        F.sum("y").cast("bigint").alias("s_f"),
    )
    per_cat = per_fold.groupBy("cat").agg(
        F.sum("n_f").cast("bigint").alias("n_c"),
        F.sum("s_f").cast("bigint").alias("s_c"),
    )
    return (
        per_fold.join(F.broadcast(per_cat), "cat")
        .select(
            F.col("cat").alias("category"),
            "fold",
            F.col("n_f").alias("n_fold"),
            round_half_up(
                (F.col("s_c") - F.col("s_f")).cast("double")
                / (F.col("n_c") - F.col("n_f")).cast("double"),
                6,
            ).alias("encoding"),
            round_half_up(
                F.col("s_c").cast("double") / F.col("n_c").cast("double"), 6
            ).alias("full_rate"),
        )
        .orderBy("category", "fold")
    )


@query(
    "user_feature_matrix",
    category="aggregation",
    oracle=f"""
        WITH h AS (
            SELECT date_trunc('day', max(ts)) AS hday FROM events),
        ev AS (
            SELECT e.user_id, e.event_type,
                   date_trunc('day', e.ts) AS day,
                   date_diff('day', date_trunc('day', e.ts), h.hday)
                       AS age,
                   CASE WHEN isfinite(e.value)
                        THEN CAST(floor(e.value * 100.0 + 0.5) AS BIGINT)
                        ELSE 0 END AS cents,
                   CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END
                       AS is_p
            FROM events e CROSS JOIN h)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(is_p) AS BIGINT) AS n_purchases,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(COUNT(DISTINCT day) AS BIGINT) AS active_days,
               CAST(MIN(age) AS BIGINT) AS recency_days,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               {sql_round_half_up(
                   "CAST(SUM(cents) AS DOUBLE)"
                   " / (CAST(COUNT(*) AS DOUBLE) * 100.0)", 6)}
                   AS avg_value,
               CASE WHEN MIN(age) > 7 THEN 1 ELSE 0 END AS churned_7d
        FROM ev GROUP BY 1 ORDER BY user_id
    """,
)
def user_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature-engineering capstone: one wide per-user training
    row — event volume, purchase count, behavioral breadth (distinct
    types), tenure (active days), recency against the dataset horizon,
    monetary totals, and a 7-day-inactivity churn label — the exact
    table a churn model trains on, produced by ONE combinable
    aggregation (every feature is a sum/min/count-distinct, so
    map-side partials carry a constant-size state per user).

    Determinism: all features are BIGINT counts/cents/day-diffs
    against the broadcast horizon; the single ratio divides once.

    Scale: one hash exchange on user_id builds the whole matrix;
    count-distinct features ride the same exchange (Spark plans them
    as expand + two-level agg, still combinable)."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.agg(F.date_trunc("day", F.max("ts")).alias("hday"))
    v = F.col("value").cast("double")
    finite = ~(
        F.isnan(v) | (v == F.lit(float("inf"))) | (v == F.lit(float("-inf")))
    )
    base = ev.crossJoin(F.broadcast(h)).select(
        "user_id",
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.datediff(F.col("hday"), F.date_trunc("day", F.col("ts")))
        .cast("bigint")
        .alias("age"),
        F.when(
            finite, F.floor(v * F.lit(100.0) + F.lit(0.5)).cast("bigint")
        )
        .otherwise(F.lit(0))
        .alias("cents"),
        F.when(F.col("event_type") == "purchase", F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_p"),
    )
    return (
        base.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("is_p").cast("bigint").alias("n_purchases"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
            F.countDistinct("day").cast("bigint").alias("active_days"),
            F.min("age").cast("bigint").alias("recency_days"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            round_half_up(
                F.sum("cents").cast("double")
                / (F.count(F.lit(1)).cast("double") * F.lit(100.0)),
                6,
            ).alias("avg_value"),
            F.when(F.min("age") > 7, F.lit(1)).otherwise(F.lit(0)).alias(
                "churned_7d"
            ),
        )
        .orderBy("user_id")
    )


@query(
    "bh_fdr_segment_tests",
    category="aggregation",
    oracle=None,  # set immediately below: wraps the permutation oracle
)
def bh_fdr_segment_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control (alpha=0.05) over the ten
    segment-pair randomization tests: rank the Monte-Carlo p-values,
    find the largest k with p_(k) <= alpha*k/m, reject ranks 1..k —
    the multiple-testing step every metrics dashboard skips and then
    pays for in false alarms (Benjamini & Hochberg 1995). Composes the
    registered permutation test verbatim, so the p-values are the
    hash-deterministic ones the driver already checks.

    Determinism: p-values arrive as exact rationals rounded at 6 dp;
    the BH threshold alpha*k/m is the identical IEEE expression on
    both engines; the step-up max is integer rank arithmetic.

    Scale: everything after the (already scale-shaped) permutation
    test runs on m = C(|segments|, 2) rows; the ranking window is a
    10-row aggregate."""
    from pyspark.sql import Window

    pt = permutation_test_mean_diff(spark, sf_dir)
    m_df = pt.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    w = Window.orderBy("p_value", "s1", "s2")
    ranked = (
        pt.select("s1", "s2", "p_value")
        .crossJoin(F.broadcast(m_df))
        .select(
            "s1",
            "s2",
            "p_value",
            "m",
            F.row_number().over(w).cast("bigint").alias("k"),
        )
    )
    thresh = (
        F.col("k").cast("double") * F.lit(0.05) / F.col("m").cast("double")
    )
    flagged = ranked.select(
        "s1",
        "s2",
        "p_value",
        "k",
        "m",
        round_half_up(thresh, 6).alias("bh_threshold"),
        F.when(F.col("p_value") <= thresh, F.col("k"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("flag_k"),
    )
    kstar = flagged.agg(F.max("flag_k").cast("bigint").alias("k_star"))
    return (
        flagged.crossJoin(F.broadcast(kstar))
        .select(
            "s1",
            "s2",
            "p_value",
            "k",
            "bh_threshold",
            F.when(F.col("k") <= F.col("k_star"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("rejected"),
        )
        .orderBy("k")
    )


def _det3(m: list[list[str]]) -> str:
    """3x3 determinant as one SQL expression over entry expressions.

    The SAME string is executed by Spark (F.expr) and DuckDB, so both
    engines evaluate the identical IEEE expression tree — bit-equal
    results without any rounding recipe."""
    return (
        f"({m[0][0]}) * (({m[1][1]}) * ({m[2][2]}) - ({m[1][2]}) * ({m[2][1]}))"
        f" - ({m[0][1]}) * (({m[1][0]}) * ({m[2][2]}) - ({m[1][2]}) * ({m[2][0]}))"
        f" + ({m[0][2]}) * (({m[1][0]}) * ({m[2][1]}) - ({m[1][1]}) * ({m[2][0]}))"
    )


#: Shared SELECT fragment: the nine exact BIGINT moments cast to double
#: (int64→double is correctly rounded in both engines, hence identical),
#: then Cramer's rule for (X^T X + λI) β = X^T y over features
#: x = [1, quantity, discount_pct], y = price cents.
_RIDGE_M_PARTS = [
    f"CAST(n + {_RIDGE_LAMBDA} AS DOUBLE) AS a11",
    "CAST(sq AS DOUBLE) AS a12",
    "CAST(sd AS DOUBLE) AS a13",
    f"CAST(sq2 + {_RIDGE_LAMBDA} AS DOUBLE) AS a22",
    "CAST(sqd AS DOUBLE) AS a23",
    f"CAST(sd2 + {_RIDGE_LAMBDA} AS DOUBLE) AS a33",
    "CAST(sy AS DOUBLE) AS b1",
    "CAST(sqy AS DOUBLE) AS b2",
    "CAST(sdy AS DOUBLE) AS b3",
]
_RIDGE_M = ",\n        ".join(_RIDGE_M_PARTS)
_RIDGE_DET = _det3([["a11", "a12", "a13"], ["a12", "a22", "a23"], ["a13", "a23", "a33"]])
_RIDGE_DET1 = _det3([["b1", "a12", "a13"], ["b2", "a22", "a23"], ["b3", "a23", "a33"]])
_RIDGE_DET2 = _det3([["a11", "b1", "a13"], ["a12", "b2", "a23"], ["a13", "b3", "a33"]])
_RIDGE_DET3 = _det3([["a11", "a12", "b1"], ["a12", "a22", "b2"], ["a13", "a23", "b3"]])


@query(
    "ridge_regression_normal_eq",
    category="ml-train",
    oracle=f"""
        WITH sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
                   CAST(SUM(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS sd,
                   CAST(SUM(CAST(l_quantity AS BIGINT)
                            * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq2,
                   CAST(SUM(CAST(l_quantity AS BIGINT)
                            * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS sqd,
                   CAST(SUM(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
                            * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS sd2,
                   CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS sy,
                   CAST(SUM(CAST(l_quantity AS BIGINT)
                            * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS sqy,
                   CAST(SUM(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
                            * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS sdy
            FROM lineitem),
        m AS (SELECT n, {_RIDGE_M} FROM sums),
        solved AS (
            SELECT n,
                   ({_RIDGE_DET1}) / ({_RIDGE_DET}) AS beta_intercept,
                   ({_RIDGE_DET2}) / ({_RIDGE_DET}) AS beta_quantity,
                   ({_RIDGE_DET3}) / ({_RIDGE_DET}) AS beta_discount_pct
            FROM m)
        SELECT f.feature, CASE f.feature
                   WHEN 'intercept' THEN beta_intercept
                   WHEN 'quantity' THEN beta_quantity
                   ELSE beta_discount_pct END AS beta,
               n
        FROM solved,
             (SELECT unnest(['intercept', 'quantity', 'discount_pct'])
                  AS feature) f
        ORDER BY feature
    """,
)
def ridge_regression_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression fit IN ONE PASS via the normal equations —
    the closed-form counterpart of logistic_regression_gd's iterative
    trainer: accumulate the nine exact-integer moments of
    x = [1, l_quantity, discount_pct] against y = price cents as ONE
    map-combinable aggregate (the only corpus scan), then solve
    (X^T X + λI) β = X^T y in-plan with Cramer's rule over a 3x3
    system. λ = 1000 on all coefficients (intercept included — stated
    simplification).

    Cross-engine exactness without rounding recipes: every moment is a
    BIGINT (products ≤ ~3.3e14 at sf0.1, far inside int64), int64 →
    double casts are correctly rounded identically in Spark and DuckDB,
    and both engines execute the IDENTICAL determinant expression
    strings (_RIDGE_DET*), so the final divisions are the same IEEE
    ops. tests/test_ml_train.py checks β against a numpy lstsq replay.

    Scale: d features cost d(d+3)/2 combinable sums — one reduce of a
    constant-width row regardless of corpus size; no driver collect, no
    parameter server, no iteration. The same plan at d=64 is the
    gram_matrix_embeddings aggregate plus an off-plan solver."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias("d"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("y"),
    )
    sums = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sq2"),
        F.sum(F.col("q") * F.col("d")).cast("bigint").alias("sqd"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sd2"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("q") * F.col("y")).cast("bigint").alias("sqy"),
        F.sum(F.col("d") * F.col("y")).cast("bigint").alias("sdy"),
    )
    m = sums.selectExpr("n", *_RIDGE_M_PARTS)
    solved = m.selectExpr(
        "n",
        f"({_RIDGE_DET1}) / ({_RIDGE_DET}) AS beta_intercept",
        f"({_RIDGE_DET2}) / ({_RIDGE_DET}) AS beta_quantity",
        f"({_RIDGE_DET3}) / ({_RIDGE_DET}) AS beta_discount_pct",
    )
    return solved.selectExpr(
        "stack(3, 'intercept', beta_intercept, 'quantity', beta_quantity, "
        "'discount_pct', beta_discount_pct) AS (feature, beta)",
        "n",
    ).orderBy("feature")


#: Shared calibration fragments — identical expression text on both
#: engines so every double op matches bit-for-bit. p is the train-side
#: rate forecast; brier decomposes over integer test counts.
_CAL_P = "CAST(hits AS DOUBLE) / CAST(train_n AS DOUBLE) AS p_train"
_CAL_RATE = "CAST(pos AS DOUBLE) / CAST(test_n AS DOUBLE) AS rate_test"
_CAL_BRIER = (
    "(CAST(pos AS DOUBLE) * (1.0 - p_train) * (1.0 - p_train)"
    " + CAST(test_n - pos AS DOUBLE) * p_train * p_train)"
    " / CAST(test_n AS DOUBLE) AS brier"
)


@query(
    "calibration_brier_priority",
    category="ml-eval",
    oracle=f"""
        WITH lab AS (
            SELECT c.c_mktsegment AS seg,
                   o.o_orderkey % 2 = 0 AS is_train,
                   CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        tr AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS train_n,
                      CAST(SUM(y) AS BIGINT) AS hits
               FROM lab WHERE is_train GROUP BY 1),
        te AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS test_n,
                      CAST(SUM(y) AS BIGINT) AS pos
               FROM lab WHERE NOT is_train GROUP BY 1),
        j AS (SELECT tr.seg, tr.train_n, tr.hits, te.test_n, te.pos,
                     CAST((tr.hits * 10) // tr.train_n AS BIGINT) AS bin
              FROM tr JOIN te ON tr.seg = te.seg),
        p AS (SELECT seg, bin, train_n, hits, test_n, pos, {_CAL_P} FROM j)
        SELECT seg, bin, train_n, test_n, p_train, {_CAL_RATE}, {_CAL_BRIER}
        FROM p ORDER BY seg
    """,
)
def calibration_brier_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast calibration + Brier score — the model-EVALUATION row
    beside the trainers (logistic GD, NB, ridge): the train-half
    (even order keys) per-segment high-priority rate is the probability
    forecast, scored on the disjoint test half. Per segment: the
    integer calibration bin ((hits·10) DIV train_n — no float compare
    near bin edges), the forecast p, the realized test rate, and the
    Brier score decomposed over integer counts
    (pos·(1−p)² + neg·p²)/n — so both engines run the identical IEEE
    expressions on identical integers.

    Scale: two count aggregates over the fact join and a 5-row
    segment-level join — everything after the first groupBy is
    constant-width."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    lab = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("o_orderkey") % 2 == 0).alias("is_train"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("y"),
    )
    tr = lab.filter("is_train").groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("train_n"),
        F.sum("y").cast("bigint").alias("hits"),
    )
    te = lab.filter("NOT is_train").groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("test_n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    j = tr.join(te, "seg").selectExpr(
        "seg",
        "train_n",
        "hits",
        "test_n",
        "pos",
        "CAST((hits * 10) DIV train_n AS BIGINT) AS bin",
    )
    p = j.selectExpr("seg", "bin", "train_n", "hits", "test_n", "pos", _CAL_P)
    return p.selectExpr(
        "seg", "bin", "train_n", "test_n", "p_train", _CAL_RATE, _CAL_BRIER
    ).orderBy("seg")


@query(
    "decision_stump_totalprice",
    category="ml-train",
    oracle="""
        WITH buckets AS (
            SELECT CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS b,
                   CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                        AS BIGINT) AS pos
            FROM orders GROUP BY b
        ), cum AS (
            SELECT b,
                   SUM(cnt) OVER (ORDER BY b) AS n_left,
                   SUM(pos) OVER (ORDER BY b) AS pos_left,
                   SUM(cnt) OVER () AS n_total,
                   SUM(pos) OVER () AS pos_total
            FROM buckets
        ), scored AS (
            SELECT CAST((b + 1) * 1000 AS BIGINT) AS split_value,
                   CAST(n_left AS BIGINT) AS n_left,
                   CAST(n_total - n_left AS BIGINT) AS n_right,
                   CAST(greatest(
                        pos_left + (n_total - n_left) - (pos_total - pos_left),
                        (n_left - pos_left) + (pos_total - pos_left)
                   ) AS BIGINT) AS n_correct,
                   CAST(n_total AS BIGINT) AS n_total
            FROM cum
        )
        SELECT split_value, n_left, n_right, n_correct,
               CAST(n_correct AS DOUBLE) / CAST(n_total AS DOUBLE) AS accuracy
        FROM scored
        ORDER BY n_correct DESC, split_value ASC
        LIMIT 1
    """,
)
def decision_stump_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy-optimal decision stump: the best single threshold on
    ``o_totalprice`` predicting finished orders (``o_orderstatus='F'``)
    — the inner loop of tree learners (XGBoost-style split finding),
    done the distributed way: bucket the feature onto a bounded integer
    grid (1000-wide price bands, a few hundred buckets regardless of
    corpus size), aggregate (count, positives) per bucket map-side, then
    score EVERY candidate split from two cumulative sums over the tiny
    bucket table. The criterion stays all-BIGINT (correct = majority
    class per side), so cross-engine parity is exact; the single
    int64/int64 division at the end is the same IEEE op in both engines.
    The degenerate all-left split (threshold past the max) is a valid
    candidate and equals majority-class accuracy — kept, identically, in
    both engines; ties break toward the smallest threshold.

    Scale: the only corpus-sized stage is the bucket aggregate
    (combinable groupBy). The candidate scan is a ~700-row window —
    whitelisted bounded window — and the argmax is TakeOrderedAndProject
    (no global sort materialization)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    buckets = (
        orders.select(
            F.floor(F.col("o_totalprice") / 1000.0).cast("long").alias("b"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("y").cast("long").alias("pos"),
        )
    )
    w_cum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = buckets.select(
        "b",
        F.sum("cnt").over(w_cum).alias("n_left"),
        F.sum("pos").over(w_cum).alias("pos_left"),
        F.sum("cnt").over(w_all).alias("n_total"),
        F.sum("pos").over(w_all).alias("pos_total"),
    )
    neg_left = F.col("n_left") - F.col("pos_left")
    pos_right = F.col("pos_total") - F.col("pos_left")
    neg_right = (F.col("n_total") - F.col("n_left")) - pos_right
    scored = cum.select(
        ((F.col("b") + 1) * 1000).cast("long").alias("split_value"),
        F.col("n_left").cast("long").alias("n_left"),
        (F.col("n_total") - F.col("n_left")).cast("long").alias("n_right"),
        F.greatest(
            F.col("pos_left") + neg_right, neg_left + pos_right
        ).cast("long").alias("n_correct"),
        F.col("n_total").cast("long").alias("n_total"),
    )
    return scored.select(
        "split_value",
        "n_left",
        "n_right",
        "n_correct",
        (F.col("n_correct").cast("double") / F.col("n_total").cast("double")).alias(
            "accuracy"
        ),
    ).orderBy(F.col("n_correct").desc(), F.col("split_value").asc()).limit(1)
_RIDGE_CV_TRAIN_PARTS = [
    f"CAST(tot_n - n + {_RIDGE_LAMBDA} AS DOUBLE) AS a11",
    "CAST(tot_sq - sq AS DOUBLE) AS a12",
    "CAST(tot_sd - sd AS DOUBLE) AS a13",
    f"CAST(tot_sq2 - sq2 + {_RIDGE_LAMBDA} AS DOUBLE) AS a22",
    "CAST(tot_sqd - sqd AS DOUBLE) AS a23",
    f"CAST(tot_sd2 - sd2 + {_RIDGE_LAMBDA} AS DOUBLE) AS a33",
    "CAST(tot_sy - sy AS DOUBLE) AS b1",
    "CAST(tot_sqy - sqy AS DOUBLE) AS b2",
    "CAST(tot_sdy - sdy AS DOUBLE) AS b3",
]
_RIDGE_CV_TRAIN = ",\n            ".join(_RIDGE_CV_TRAIN_PARTS)
#: Per-row held-out squared residual in DOLLARS (cents / 100), scaled to
#: an exact integer micro-lattice: |resid| <= ~1e5 dollars, resid^2 <=
#: 1e10, * 1e6 <= 1e16 — safely inside both int64 and double-exactness.
_RIDGE_CV_R2 = (
    "((CAST(y AS DOUBLE)"
    " - (beta_intercept + beta_quantity * CAST(q AS DOUBLE)"
    " + beta_discount_pct * CAST(d AS DOUBLE))) / 100.0)"
    " * ((CAST(y AS DOUBLE)"
    " - (beta_intercept + beta_quantity * CAST(q AS DOUBLE)"
    " + beta_discount_pct * CAST(d AS DOUBLE))) / 100.0)"
)
_RIDGE_CV_MSE = (
    "CAST(s AS DOUBLE) / 1000000.0 / CAST(n_val AS DOUBLE) AS val_mse"
)


@query(
    "ridge_cv_one_pass",
    category="ml-train",
    oracle=f"""
        WITH rows_f AS (
            SELECT CAST(l_quantity AS BIGINT) AS q,
                   CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
                   CAST((l_orderkey * 31 + l_linenumber) % {_RIDGE_CV_FOLDS}
                        AS BIGINT) AS fold
            FROM lineitem),
        fold_sums AS (
            SELECT fold,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(q) AS BIGINT) AS sq,
                   CAST(SUM(d) AS BIGINT) AS sd,
                   CAST(SUM(q * q) AS BIGINT) AS sq2,
                   CAST(SUM(q * d) AS BIGINT) AS sqd,
                   CAST(SUM(d * d) AS BIGINT) AS sd2,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(q * y) AS BIGINT) AS sqy,
                   CAST(SUM(d * y) AS BIGINT) AS sdy
            FROM rows_f GROUP BY fold),
        totals AS (
            SELECT CAST(SUM(n) AS BIGINT) AS tot_n,
                   CAST(SUM(sq) AS BIGINT) AS tot_sq,
                   CAST(SUM(sd) AS BIGINT) AS tot_sd,
                   CAST(SUM(sq2) AS BIGINT) AS tot_sq2,
                   CAST(SUM(sqd) AS BIGINT) AS tot_sqd,
                   CAST(SUM(sd2) AS BIGINT) AS tot_sd2,
                   CAST(SUM(sy) AS BIGINT) AS tot_sy,
                   CAST(SUM(sqy) AS BIGINT) AS tot_sqy,
                   CAST(SUM(sdy) AS BIGINT) AS tot_sdy
            FROM fold_sums),
        m AS (
            SELECT fold, CAST(tot_n - n AS BIGINT) AS n_train,
                   n AS n_val,
                   {_RIDGE_CV_TRAIN}
            FROM fold_sums, totals),
        betas AS (
            SELECT fold, n_train, n_val,
                   ({_RIDGE_DET1}) / ({_RIDGE_DET}) AS beta_intercept,
                   ({_RIDGE_DET2}) / ({_RIDGE_DET}) AS beta_quantity,
                   ({_RIDGE_DET3}) / ({_RIDGE_DET}) AS beta_discount_pct
            FROM m),
        terms AS (
            SELECT b.fold, b.n_train, b.n_val,
                   b.beta_intercept, b.beta_quantity, b.beta_discount_pct,
                   CAST(CASE WHEN isfinite({_RIDGE_CV_R2})
                             THEN floor(({_RIDGE_CV_R2}) * 1000000.0 + 0.5)
                        END AS BIGINT) AS t
            FROM rows_f r JOIN betas b ON r.fold = b.fold),
        folded AS (
            SELECT fold, n_train, n_val,
                   beta_intercept, beta_quantity, beta_discount_pct,
                   CAST(SUM(t) AS DECIMAL(38,0)) AS s
            FROM terms
            GROUP BY fold, n_train, n_val,
                     beta_intercept, beta_quantity, beta_discount_pct)
        SELECT fold, n_train, n_val,
               beta_intercept, beta_quantity, beta_discount_pct,
               {_RIDGE_CV_MSE}
        FROM folded ORDER BY fold
    """,
)
def ridge_cv_one_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold ridge cross-validation from ONE corpus pass: accumulate
    the nine normal-equation moments PER FOLD (a combinable groupBy —
    the only fact-table aggregate), then each held-out fold's training
    moments are totals − fold, pure BIGINT subtraction. K models for
    the price of one scan — the distributed form of cross-validation,
    where the naive per-fold refit would re-read 100 TB K times. Each
    fold's (X'X + λI)β = X'y solves in-plan with the SAME Cramer
    fragments as ridge_regression_normal_eq; held-out MSE accumulates
    per-row squared residuals on an exact 1e-6 dollar² lattice (int64-
    safe), summed as integers — no float-sum order dependence anywhere.

    Scale: fold moments are one map-combinable reduce to K constant-
    width rows; the 1-row totals broadcast onto them (whitelisted BNLJ);
    the K-row beta table broadcasts back onto the fact table for the
    residual pass. Two corpus scans total (moments + evaluation),
    independent of K."""
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(l_quantity AS BIGINT) AS q",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y",
        f"CAST((l_orderkey * 31 + l_linenumber) % {_RIDGE_CV_FOLDS}"
        " AS BIGINT) AS fold",
    )
    fold_sums = li.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sq2"),
        F.sum(F.col("q") * F.col("d")).cast("bigint").alias("sqd"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sd2"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("q") * F.col("y")).cast("bigint").alias("sqy"),
        F.sum(F.col("d") * F.col("y")).cast("bigint").alias("sdy"),
    )
    totals = fold_sums.agg(
        F.sum("n").cast("bigint").alias("tot_n"),
        F.sum("sq").cast("bigint").alias("tot_sq"),
        F.sum("sd").cast("bigint").alias("tot_sd"),
        F.sum("sq2").cast("bigint").alias("tot_sq2"),
        F.sum("sqd").cast("bigint").alias("tot_sqd"),
        F.sum("sd2").cast("bigint").alias("tot_sd2"),
        F.sum("sy").cast("bigint").alias("tot_sy"),
        F.sum("sqy").cast("bigint").alias("tot_sqy"),
        F.sum("sdy").cast("bigint").alias("tot_sdy"),
    )
    m = fold_sums.crossJoin(F.broadcast(totals)).selectExpr(
        "fold",
        "CAST(tot_n - n AS BIGINT) AS n_train",
        "n AS n_val",
        *_RIDGE_CV_TRAIN_PARTS,
    )
    betas = m.selectExpr(
        "fold",
        "n_train",
        "n_val",
        f"({_RIDGE_DET1}) / ({_RIDGE_DET}) AS beta_intercept",
        f"({_RIDGE_DET2}) / ({_RIDGE_DET}) AS beta_quantity",
        f"({_RIDGE_DET3}) / ({_RIDGE_DET}) AS beta_discount_pct",
    )
    r2 = F.expr(_RIDGE_CV_R2)
    finite = ~F.isnan(r2) & (r2 != F.lit(float("inf"))) & (
        r2 != F.lit(float("-inf"))
    )
    terms = li.join(F.broadcast(betas), "fold").select(
        "fold",
        "n_train",
        "n_val",
        "beta_intercept",
        "beta_quantity",
        "beta_discount_pct",
        F.when(finite, F.floor(F.expr(f"({_RIDGE_CV_R2}) * 1000000.0 + 0.5")))
        .cast("bigint")
        .alias("t"),
    )
    folded = terms.groupBy(
        "fold",
        "n_train",
        "n_val",
        "beta_intercept",
        "beta_quantity",
        "beta_discount_pct",
    ).agg(F.sum(F.col("t").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s"))
    return folded.selectExpr(
        "fold",
        "n_train",
        "n_val",
        "beta_intercept",
        "beta_quantity",
        "beta_discount_pct",
        _RIDGE_CV_MSE,
    ).orderBy("fold")


# BH-FDR chains the permutation tests oracle as a CTE; both queries
# register above, so the oracle patch composes AFTER registration.
_REG["bh_fdr_segment_tests"] = _dc.replace(
    _REG["bh_fdr_segment_tests"],
    oracle=f"""
        WITH pt AS ({_REG["permutation_test_mean_diff"].oracle}),
        ranked AS (
            SELECT s1, s2, p_value,
                   CAST(row_number() OVER (ORDER BY p_value, s1, s2)
                       AS BIGINT) AS k,
                   CAST(COUNT(*) OVER () AS BIGINT) AS m
            FROM pt),
        flagged AS (
            SELECT s1, s2, p_value, k, m,
                   CASE WHEN isfinite(CAST(k AS DOUBLE) * CAST(0.05 AS DOUBLE)
                            / CAST(m AS DOUBLE))
                        THEN floor((CAST(k AS DOUBLE) * CAST(0.05 AS DOUBLE)
                            / CAST(m AS DOUBLE)) * 1000000.0 + 0.5)
                            / 1000000.0 END AS bh_threshold,
                   CASE WHEN p_value <= CAST(k AS DOUBLE)
                            * CAST(0.05 AS DOUBLE) / CAST(m AS DOUBLE)
                        THEN k ELSE 0 END AS flag_k
            FROM ranked),
        ks AS (SELECT CAST(MAX(flag_k) AS BIGINT) AS k_star FROM flagged)
        SELECT f.s1, f.s2, f.p_value, f.k, f.bh_threshold,
               CASE WHEN f.k <= ks.k_star THEN 1 ELSE 0 END AS rejected
        FROM flagged f CROSS JOIN ks
        ORDER BY f.k
    """,
)
