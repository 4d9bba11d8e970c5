"""Production-analytics operator pack: sketches, runtime prefilters,
dimensionality reduction, in-flight pipeline metrics, and data-quality
audits.

The reference's surface is a 4-operator relational demo
(/root/reference/src/executor/mod.rs:250-466); a 100 TB pipeline built
on it additionally needs the observability and approximation machinery
this module covers:

- ``cms_token_counts`` — a count-min sketch: the canonical fixed-memory
  frequency summary for unbounded key domains (heavy-hitter monitoring
  over token streams).
- ``bloom_prefilter_join`` — a Bloom-style membership prefilter applied
  map-side before a shuffle join, the manual form of Spark's runtime
  row-level filtering.
- ``random_projection_embeddings`` — Johnson-Lindenstrauss-style linear
  projection of embedding columns to a lower dimension.
- ``observe_quality_metrics`` — ``DataFrame.observe``: pipeline metrics
  collected on the side of a single pass, no second scan.
- ``crosstab_status_priority`` — ``df.stat.crosstab`` contingency table.
- ``time_bucket_ohlc`` — per-bucket open/high/low/close aggregation via
  argmin/argmax aggregates (one pass, no window sort).
- ``constraint_audit`` — dbt-style referential/nullability/uniqueness
  checks as one unioned metric table.

All hot paths are JVM expressions; the only driver-side values are
model-sized (an Observation's metric row, a 512-row projection matrix).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession

from pipeline_query_engine_demo_spark.functions.rounding import (
    round_half_up,
    sql_round_half_up,
)
from pipeline_query_engine_demo_spark.plans.registry import query
from pipeline_query_engine_demo_spark.sources.catalog import load_table

#: Exact accumulator for float sums (see plans.registry determinism
#: contract): scale 12 holds round(x, 9) terms exactly, precision 28
#: leaves 16 integer digits of headroom.
_DEC = "decimal(28,12)"

#: Count-min sketch geometry: _CMS_D independent hash rows of
#: _CMS_W buckets (the bucket key is the first 2 hex chars of a salted
#: md5, so w = 256). d*w cells total — fixed memory however large the
#: corpus.
_CMS_D = 4
_CMS_W_HEX = 2  # 16^2 = 256 buckets

#: Bloom prefilter geometry: k=2 salted hashes into 16^3 = 4096 buckets.
_BLOOM_HEX = 3

#: Random projection: embeddings are 64-d (FIXTURES.md); project to 8.
_PROJ_IN = 64
_PROJ_OUT = 8


def _cms_bucket(salt: str, token_col):
    """First ``_CMS_W_HEX`` hex chars of md5('{salt}|' + token)."""
    return F.substring(F.md5(F.concat(F.lit(salt + "|"), token_col)), 1, _CMS_W_HEX)


@query(
    "cms_token_counts",
    category="approx",
    oracle=f"""
        WITH toks AS (
            SELECT t.tok AS token
            FROM documents, unnest(string_split(text, ' ')) AS t(tok)
            WHERE t.tok <> ''
        ),
        exact AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt
            FROM toks GROUP BY token
        ),
        top AS (
            SELECT * FROM exact ORDER BY exact_cnt DESC, token LIMIT 20
        ),
        salts AS (
            SELECT 'cms' || CAST(s.j AS VARCHAR) AS salt
            FROM unnest(generate_series(0, {_CMS_D - 1})) AS s(j)
        ),
        cells AS (
            SELECT salt,
                   substr(md5(salt || '|' || token), 1, {_CMS_W_HEX}) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM toks CROSS JOIN salts
            GROUP BY salt, bucket
        )
        SELECT top.token, top.exact_cnt, CAST(MIN(cells.c) AS BIGINT) AS cms_est
        FROM top
        CROSS JOIN salts
        JOIN cells
          ON cells.salt = salts.salt
         AND cells.bucket = substr(md5(salts.salt || '|' || top.token), 1, {_CMS_W_HEX})
        GROUP BY top.token, top.exact_cnt
        ORDER BY exact_cnt DESC, token
    """,
)
def cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the document token stream, checked against
    exact counts for the top-20 tokens (the estimate is provably >= the
    exact count; the planted-collision test pins the overcount side).

    Scale shape: the sketch is a groupBy over (d=4 salts x 256 buckets)
    — map-side combinable partial counts into a table whose size is
    FIXED (<= 1024 rows) no matter the corpus, i.e. the mergeable-
    summary property that makes CMS work as a streaming/distributed
    frequency monitor. The probe side joins the broadcast sketch; no
    all-token state anywhere. The exact-count branch exists only to
    grade the estimate and would be absent in production.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    salts = [f"cms{j}" for j in range(_CMS_D)]

    cells = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("salt"),
                            _cms_bucket(s, F.col("token")).alias("bucket"),
                        )
                        for s in salts
                    ]
                )
            ).alias("sb")
        )
        .groupBy(F.col("sb.salt").alias("salt"), F.col("sb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )

    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "token")
        .limit(20)
    )
    probes = top.select(
        "token",
        "exact_cnt",
        F.explode(F.array(*[F.lit(s) for s in salts])).alias("salt"),
    ).withColumn(
        "bucket",
        F.substring(
            F.md5(F.concat(F.col("salt"), F.lit("|"), F.col("token"))), 1, _CMS_W_HEX
        ),
    )
    return (
        probes.join(F.broadcast(cells), ["salt", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
        .orderBy(F.desc("exact_cnt"), "token")
    )


@query(
    "bloom_prefilter_join",
    category="join",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-style membership prefilter ahead of a shuffle join: the
    selective build side (urgent finished orders) is hashed with k=2
    salted functions into 4096-bucket sets; the probe side drops every
    row whose buckets are not BOTH present before it ever reaches the
    join shuffle. False positives survive the prefilter and are removed
    by the exact join, so the result is bit-identical to the plain join
    — which is exactly what the oracle asserts.

    Scale shape: the two bucket sets are <= 4096 rows each regardless
    of build-side cardinality (broadcast left-semi joins, i.e. a
    hand-rolled form of Spark's runtime bloom-filter row filtering);
    the probe scan's survivors — not the whole fact table — pay the
    join shuffle. At 100 TB this is the difference between shuffling
    600 B rows and shuffling the ~1/5 that can possibly match.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    lineitem = load_table(spark, sf_dir, "lineitem")

    def bucket(salt: str, key):
        return F.substring(
            F.md5(F.concat(F.lit(salt + "|"), key.cast("string"))), 1, _BLOOM_HEX
        )

    bits0 = orders.select(bucket("bf0", F.col("o_orderkey")).alias("b0")).distinct()
    bits1 = orders.select(bucket("bf1", F.col("o_orderkey")).alias("b1")).distinct()
    pre = (
        lineitem.withColumn("b0", bucket("bf0", F.col("l_orderkey")))
        .withColumn("b1", bucket("bf1", F.col("l_orderkey")))
        .join(F.broadcast(bits0), "b0", "left_semi")
        .join(F.broadcast(bits1), "b1", "left_semi")
    )
    return (
        pre.join(orders, pre.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "random_projection_embeddings",
    category="llm-similarity",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, t.d AS dim, embedding[t.d]::DOUBLE AS val
            FROM embeddings, unnest(generate_series(1, {_PROJ_IN})) AS t(d)
        ),
        p AS (
            SELECT j.j AS j, t.d AS dim,
                   CAST(((7 * t.d + 11 * j.j) % 5) - 2 AS DOUBLE) AS w
            FROM unnest(generate_series(1, {_PROJ_OUT})) AS j(j),
                 unnest(generate_series(1, {_PROJ_IN})) AS t(d)
        )
        SELECT vec_id,
        """
    + ",\n".join(
        f"""CAST(SUM(CASE WHEN j = {jj}
                 THEN CAST(CASE WHEN isfinite(val * w) THEN floor((val * w) * 1000000000.0 + 0.5) / 1000000000.0 END AS DECIMAL(28,12)) END)
                 AS DOUBLE) AS y{jj}"""
        for jj in range(1, _PROJ_OUT + 1)
    )
    + """
        FROM e JOIN p USING (dim)
        GROUP BY vec_id
        ORDER BY vec_id
    """,
)
def random_projection_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss-style random projection 64-d -> 8-d: the
    standard cheap dimensionality reduction ahead of clustering / ANN
    (a sparse +/-2..-2 integer matrix here so both engines agree
    exactly; production would use seeded Gaussian weights — same plan).

    Scale shape: the projection matrix is model-sized (64 x 8 rows) and
    broadcasts; the corpus explodes to (id, dim, val), joins the matrix
    map-side, and one groupBy(vec_id) with DECIMAL-exact partial sums
    produces all 8 output components — a single shuffle of one row per
    (vec_id) however wide the input. Output is flattened to scalar
    columns y1..y8 (array-free by driver contract).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    proj = spark.createDataFrame(
        [
            (j, i, float((7 * i + 11 * j) % 5 - 2))
            for j in range(1, _PROJ_OUT + 1)
            for i in range(1, _PROJ_IN + 1)
        ],
        "j long, dim long, w double",
    )
    e = emb.select(
        "vec_id", F.posexplode("embedding").alias("_d0", "_vf")
    ).select(
        "vec_id",
        (F.col("_d0") + 1).alias("dim"),
        F.col("_vf").cast("double").alias("val"),
    )
    term = round_half_up(F.col("val") * F.col("w"), 9).cast(_DEC)
    return (
        e.join(F.broadcast(proj), "dim")
        .groupBy("vec_id")
        .agg(
            *[
                F.sum(F.when(F.col("j") == jj, term))
                .cast("double")
                .alias(f"y{jj}")
                for jj in range(1, _PROJ_OUT + 1)
            ]
        )
        .orderBy("vec_id")
    )


@query(
    "observe_quality_metrics",
    category="relational-misc",
    oracle="""
        SELECT 'n_heavy' AS metric,
               CAST(COUNT(*) FILTER (WHERE l_quantity > 45) AS DOUBLE) AS value
        FROM lineitem
        UNION ALL
        SELECT 'n_rows', CAST(COUNT(*) AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'sum_price',
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM lineitem
        ORDER BY metric
    """,
)
def observe_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.observe``: data-quality metrics accumulated ON THE
    SIDE of a single pass over the fact table — the production pattern
    for pipeline health counters (row counts, null rates, value sums)
    without a second scan of 100 TB. The observed pass here materializes
    to the noop sink (one full-table action, executor-side accumulators
    only); the returned DataFrame is the metric row itself, reshaped to
    (metric, value) rows. A batch query's Observation.get blocks until
    the action finishes — nothing corpus-sized reaches the driver.
    """
    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("quality")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).cast("double").alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        F.count(F.when(F.col("l_quantity") > 45, 1)).cast("double").alias("n_heavy"),
    )
    observed.write.mode("overwrite").format("noop").save()
    metrics = obs.get
    return spark.createDataFrame(
        sorted((k, float(v)) for k, v in metrics.items()),
        "metric string, value double",
    )


@query(
    "crosstab_status_priority",
    category="relational-misc",
    oracle="""
        SELECT o_orderstatus AS o_orderstatus_o_orderpriority,
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS "1-URGENT",
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS "2-HIGH",
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS "3-MEDIUM",
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS "4-NOT SPECIFIED",
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS "5-LOW"
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
)
def crosstab_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.stat.crosstab`` contingency table (status x priority):
    the pair-frequency matrix API. Internally one groupBy over the
    value pairs pivoted to columns — output is (distinct statuses) x
    (distinct priorities) cells, category-domain-sized, so the result
    is driver-safe at any corpus scale. Column order is normalized by
    sorting since crosstab emits value-columns in first-seen order.
    """
    orders = load_table(spark, sf_dir, "orders")
    ct = orders.stat.crosstab("o_orderstatus", "o_orderpriority")
    first = "o_orderstatus_o_orderpriority"
    value_cols = sorted(c for c in ct.columns if c != first)
    return ct.select(first, *value_cols).orderBy(first)


@query(
    "time_bucket_ohlc",
    category="window",
    oracle="""
        WITH b AS (
            SELECT event_type,
                   date_trunc('hour', ts) AS bucket_start,
                   value, ts, event_id,
                   first_value(value) OVER (
                       PARTITION BY event_type, date_trunc('hour', ts)
                       ORDER BY ts, event_id) AS open,
                   first_value(value) OVER (
                       PARTITION BY event_type, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC) AS close
            FROM events
        )
        SELECT event_type, bucket_start,
               ANY_VALUE(open) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               ANY_VALUE(close) AS close,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(CASE WHEN isfinite(value) THEN floor((value) * 1000000000.0 + 0.5) / 1000000000.0 END AS DECIMAL(28,12))) AS DOUBLE)
                   AS total_value
        FROM b
        GROUP BY event_type, bucket_start
        ORDER BY event_type, bucket_start
    """,
)
def time_bucket_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour OHLC (open/high/low/close) candles per event type — the
    classic time-series rollup. Spark side uses min_by/max_by on a
    (ts, event_id) struct: a ONE-PASS argmin/argmax aggregation that is
    partial-agg combinable (map-side combine, no window sort of the
    fact table); (ts, event_id) makes the extreme row unique so both
    engines pick the same open/close. The oracle spells the same thing
    with first_value windows since DuckDB's arg_min lacks struct keys.
    """
    ev = load_table(spark, sf_dir, "events")
    tiebreak = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket_start")
        )
        .agg(
            F.min_by("value", tiebreak).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", tiebreak).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(round_half_up(F.col("value"), 9).cast(_DEC)).cast("double").alias("total_value"),
        )
        .orderBy("event_type", "bucket_start")
    )


@query(
    "constraint_audit",
    category="relational-misc",
    oracle="""
        SELECT 'lineitem_null_orderkey' AS check_name,
               CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) AS violations
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_orphan_orderkey',
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem WHERE l_orderkey IS NOT NULL AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        UNION ALL
        SELECT 'orders_dup_orderkey',
               CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
        FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'orders_negative_totalprice',
               CAST(COUNT(*) FILTER (WHERE o_totalprice < 0) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders_orphan_custkey',
               CAST(COUNT(*) AS BIGINT)
        FROM orders WHERE NOT EXISTS (
            SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        ORDER BY check_name
    """,
)
def constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity / data-quality audit in the dbt-tests
    shape: nullability, FK orphans (anti joins), key uniqueness, and a
    range check, unioned into one (check_name, violations) table — the
    nightly contract a 100 TB ingest runs before publishing a
    partition. Each check is an independent aggregate (parallel
    stages); orphan checks broadcast the smaller key side; output is
    checks-count-sized. All-zero on the fixtures — the planted-
    violation unit test proves each check actually fires.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def metric(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("check_name"), F.col("violations"))

    checks = [
        metric(
            "lineitem_null_orderkey",
            lineitem.agg(
                F.count(F.when(F.col("l_orderkey").isNull(), 1)).alias("violations")
            ),
        ),
        metric(
            "lineitem_orphan_orderkey",
            # NULL keys are the nullability check's finding, not orphans
            # (dbt relationship-test semantics), so exclude them here.
            lineitem.filter(F.col("l_orderkey").isNotNull())
            .join(orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti")
            .agg(F.count(F.lit(1)).alias("violations")),
        ),
        metric(
            "orders_dup_orderkey",
            orders.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("violations")),
        ),
        metric(
            "orders_negative_totalprice",
            orders.agg(
                F.count(F.when(F.col("o_totalprice") < 0, 1)).alias("violations")
            ),
        ),
        metric(
            "orders_orphan_custkey",
            orders.join(
                customer, orders.o_custkey == customer.c_custkey, "left_anti"
            ).agg(F.count(F.lit(1)).alias("violations")),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out.orderBy("check_name")


def _pr_iter_sql(i: int, p: int) -> str:
    """One PageRank iteration as a DuckDB CTE (reads r{p}, defines
    r{i}). Rounding is ``floor(x*1e9 + 0.5)/1e9``, mirroring
    operators.graph._r9 — round() itself disagrees between engines by
    one ulp on boundary values (found by the sf0.1 sweep)."""
    return f"""
        r{i} AS (
            SELECT p.dst AS node,
                   floor((0.15 / ANY_VALUE(nn.n)
                          + 0.85 * CAST(SUM(CAST(
                                floor(r{p}.r / deg.outdeg * 1e9 + 0.5) / 1e9
                                AS DECIMAL(28,12))) AS DOUBLE))
                         * 1e9 + 0.5) / 1e9 AS r
            FROM pairs p
            JOIN r{p} ON r{p}.node = p.src
            JOIN deg ON deg.src = p.src
            CROSS JOIN nn
            GROUP BY p.dst
        )"""


@query(
    "pagerank_copurchase",
    category="graph",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        ),
        nodes AS (SELECT DISTINCT src AS node FROM pairs),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM pairs GROUP BY src),
        r0 AS (
            SELECT node, floor(1.0 / nn.n * 1e9 + 0.5) / 1e9 AS r
            FROM nodes CROSS JOIN nn
        ),
    """
    + _pr_iter_sql(1, 0)
    + ","
    + _pr_iter_sql(2, 1)
    + """
        SELECT CAST(node AS BIGINT) AS partkey, r AS pagerank
        FROM r2
        ORDER BY pagerank DESC, partkey
        LIMIT 50
    """,
)
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (parts are linked when
    they share an order) — 2 damped iterations via operators.graph:
    link analysis for item/domain importance ranking, the third
    iterative algorithm under the exact-hash gate (with connected
    components and k-means). The oracle replays both iterations as
    chained CTEs from the same DECIMAL-exact, 9-decimal-rounded
    accumulators, so all 50 top ranks match to the digit.

    Scale shape: edges come from a per-order self-join (quadratic only
    in ORDER SIZE, a small bounded constant — never corpus-quadratic);
    each iteration is one edge⋈rank shuffle join plus one groupBy(dst),
    the textbook distributed PageRank flow. The rank table is
    node-sized; nothing edge-sized reaches the driver.
    """
    from pipeline_query_engine_demo_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    ranks = pagerank(edges, iterations=2, damping=0.85, teleport=0.15)
    return (
        ranks.select(
            F.col("node").cast("bigint").alias("partkey"),
            F.col("pagerank"),
        )
        .orderBy(F.desc("pagerank"), "partkey")
        .limit(50)
    )


def _hex_digit_sql(h: str, i: int) -> str:
    """Value of hex digit ``i`` (1-based) of lowercase hex string ``h``."""
    a = f"ascii(substr({h}, {i}, 1))"
    return f"(CASE WHEN {a} <= 57 THEN {a} - 48 ELSE {a} - 87 END)"


def _hex_digit_col(h, i: int):
    a = F.ascii(F.substring(h, i, 1))
    return F.when(a <= 57, a - 48).otherwise(a - 87).cast("long")


#: 13 hex digits = 52 bits: the largest md5 prefix that converts to a
#: double-exact integer (< 2^53) for the uniform-variate trick below.
_U_HEX = 13
_U_DENOM = float(16**_U_HEX)


@query(
    "weighted_sample_docs",
    category="llm-sampling",
    oracle=(
        """
        WITH keyed AS (
            SELECT doc_id, source, n_chars,
                   md5(doc_id::VARCHAR || '|wsample-v1') AS h
            FROM documents
        ),
        u AS (
            SELECT doc_id, source, n_chars,
                   ("""
        + " + ".join(
            f"{_hex_digit_sql('h', i)} * CAST({16 ** (_U_HEX - i)} AS BIGINT)"
            for i in range(1, _U_HEX + 1)
        )
        + f""") / {_U_DENOM!r} AS u
            FROM keyed
        )
        SELECT doc_id, source, n_chars,
               CASE WHEN isfinite(CASE WHEN isfinite(ln(u)) THEN floor((ln(u)) * 1000000000.0 + 0.5) / 1000000000.0 END / n_chars) THEN floor((CASE WHEN isfinite(ln(u)) THEN floor((ln(u)) * 1000000000.0 + 0.5) / 1000000000.0 END / n_chars) * 1000000000000.0 + 0.5) / 1000000000000.0 END AS es_key
        FROM u
        ORDER BY es_key DESC, doc_id
        LIMIT 10
    """
    ),
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each doc gets key = ln(u)^(1/w) in log
    form ln(u)/w with u a content-hash uniform variate and w = n_chars;
    the global top-k by key IS a weighted sample — longer docs win
    proportionally more often, yet the draw is a pure function of
    doc_id (reproducible across re-runs, restarts, and cluster sizes,
    unlike rand()-based sampling).

    Scale shape: key computation is map-side scalar math on a 13-hex-
    digit md5 prefix (52 bits — double-exact in both engines); the only
    wide op is the global top-k, which Spark executes as per-partition
    TakeOrdered + merge, never a full sort. ln is rounded to 9 decimals
    before the division so both engines rank identical keys.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|wsample-v1")))
    keyed = docs.select("doc_id", "source", "n_chars", h.alias("h"))
    acc = None
    for i in range(1, _U_HEX + 1):
        term = _hex_digit_col(F.col("h"), i) * F.lit(16 ** (_U_HEX - i)).cast("long")
        acc = term if acc is None else acc + term
    u = (acc.cast("double") / F.lit(_U_DENOM)).alias("u")
    return (
        keyed.select(
            "doc_id",
            "source",
            "n_chars",
            round_half_up(round_half_up(F.log(u), 9) / F.col("n_chars"), 12).alias("es_key"),
        )
        .orderBy(F.desc("es_key"), "doc_id")
        .limit(10)
    )


#: Bits per dimension for the Z-order curve (8 -> 256x256 grid).
_Z_BITS = 8


@query(
    "zorder_curve_events",
    category="layout",
    oracle=(
        """
        WITH g AS (
            SELECT event_id,
                   user_id % 256 AS x,
                   CAST(extract(hour FROM ts) AS BIGINT) * 10 AS y
            FROM events
        )
        SELECT event_id, x, y,
               ("""
        + " + ".join(
            f"((x >> {i}) & 1) * {1 << (2 * i)} + ((y >> {i}) & 1) * {1 << (2 * i + 1)}"
            for i in range(_Z_BITS)
        )
        + """) AS zvalue
        FROM g
        ORDER BY event_id
    """
    ),
)
def zorder_curve_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve over two query dimensions (user bucket x
    scaled hour-of-day): interleaving the bits of both keys gives a
    single sort key under which a range-partitioned / sorted layout
    clusters BOTH dimensions at once — the standard multi-dimensional
    data-skipping layout (Delta OPTIMIZE ZORDER, Hudi z-ordering) that
    lets min/max footer stats prune files for predicates on either
    column. Writing is `repartitionByRange(zvalue) + sortWithinPartitions`
    (the already-covered write_sorted_layout path); this query verifies
    the curve itself — pure map-side bit arithmetic, zero shuffles
    before the presentation sort.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        "event_id",
        (F.col("user_id") % 256).alias("x"),
        (F.hour("ts").cast("long") * 10).alias("y"),
    )
    z = None
    for i in range(_Z_BITS):
        xbit = F.shiftright(F.col("x"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        ybit = F.shiftright(F.col("y"), i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i + 1)
        )
        term = xbit + ybit
        z = term if z is None else z + term
    return g.select("event_id", "x", "y", z.alias("zvalue")).orderBy("event_id")


#: Incremental-load cutoff: rows before it are the materialized "base"
#: aggregate, rows at/after it are the newly-arrived delta partition.
_INC_CUTOFF = "1999-01-01"


@query(
    "incremental_agg_merge",
    category="aggregation",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS revenue
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance by partial-aggregate merge: the
    running (status, count, DECIMAL revenue) aggregate over the
    already-loaded history is MERGED with the same aggregate over the
    newly arrived delta partition — count by summing counts, revenue by
    summing exact DECIMAL partials — instead of re-scanning history.
    The oracle computes the full-table aggregate directly; they match
    bit-for-bit because COUNT and DECIMAL SUM are associative monoids
    (this is the algebraic fact that makes incremental 100 TB pipelines
    sound, and float-SUM pipelines subtly unsound).

    Scale shape: each nightly run scans only the delta partition; the
    base is a tiny materialized aggregate (statuses x 2 columns). Here
    both branches derive from one fixture split on o_orderdate.
    """
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_INC_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionAll(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n").alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


_RHU_TRANSITIVITY = sql_round_half_up(
    "3.0 * CAST(tri.t AS DOUBLE) / CAST(wed.w AS DOUBLE)", 9
)


@query(
    "triangle_count_copurchase",
    category="graph",
    oracle=f"""
        WITH pairs AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        tri AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS t
            FROM pairs e1
            JOIN pairs e2 ON e2.u = e1.v
            JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS d
            FROM (
                SELECT u AS node FROM pairs
                UNION ALL
                SELECT v AS node FROM pairs
            )
            GROUP BY node
        ),
        wed AS (
            SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS w FROM deg
        )
        SELECT tri.t AS n_triangles,
               wed.w AS n_wedges,
               {_RHU_TRANSITIVITY} AS transitivity
        FROM tri CROSS JOIN wed
    """,
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count + transitivity of the part co-purchase
    graph — the standard graph-structure summary (community density,
    spam/bot detection in link graphs) alongside PageRank.

    Scale shape: edges are DEGREE-ORDERED — each undirected edge is
    oriented from its lower-(degree, id) endpoint to the higher — and
    triangles are enumerated as wedges at the lowest-ordered vertex
    closed by an oriented edge. Every triangle has exactly one lowest
    vertex, so each is counted once (the total provably equals the
    id-ordered count, which is what the oracle computes), and the
    wedge join's fan-out per vertex is bounded by its OUT-degree,
    which degree ordering caps at O(sqrt(edges)) even on power-law
    hubs — the standard hardening that makes distributed triangle
    counting survive a celebrity node. Wedge counts for transitivity
    stay on the undirected degrees (one map-side-combinable groupBy).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    # The distinct edge table feeds the degree count AND the orientation
    # join; the oriented table feeds THREE wedge-join branches. Without
    # checkpoints each alias re-runs the whole upstream pipeline (the r3
    # plan audit measured 34 exchanges from exactly that re-execution);
    # lazy localCheckpoints make each table compute once — the same
    # lineage-cut pattern as dedup's banded bucket table.
    pairs = pairs.localCheckpoint(eager=False)
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    ).localCheckpoint(eager=False)
    # Orient each edge low->high in the (degree, id) total order.
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    with_deg = pairs.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("du")).otherwise(F.col("dv")).alias("dsrc"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    ).localCheckpoint(eager=False)
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    # Wedge at the lowest vertex: two out-edges (src, b) and (src, c)
    # with ord(b) < ord(c); closed iff oriented edge (b, c) exists.
    wedge_order = (F.col("e1.ddst") < F.col("e2.ddst")) | (
        (F.col("e1.ddst") == F.col("e2.ddst"))
        & (F.col("e1.dst") < F.col("e2.dst"))
    )
    tri = (
        e1.join(e2, (F.col("e2.src") == F.col("e1.src")) & wedge_order)
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.dst"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    # Integer DIV, not float /: d*(d-1) is even so DIV 2 is exact, and
    # the double path would silently lose bits past 2^53 on hub nodes.
    wed = deg.agg(F.sum(F.expr("d * (d - 1) DIV 2")).cast("bigint").alias("w"))
    return tri.crossJoin(wed).select(
        F.col("t").alias("n_triangles"),
        F.col("w").alias("n_wedges"),
        round_half_up(
            F.lit(3.0) * F.col("t").cast("double") / F.col("w").cast("double"), 9
        ).alias("transitivity"),
    )


_RHU_LCC = sql_round_half_up(
    "2.0 * CAST(t.tri AS DOUBLE) / CAST(deg.d * (deg.d - 1) AS DOUBLE)", 6
)


@query(
    "local_clustering_coefficient",
    category="graph",
    oracle=f"""
        WITH pairs AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        tris AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM pairs e1
            JOIN pairs e2 ON e2.u = e1.v
            JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        credit AS (
            SELECT a AS node FROM tris
            UNION ALL SELECT b FROM tris
            UNION ALL SELECT c FROM tris
        ),
        t AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri
              FROM credit GROUP BY node),
        deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS d
            FROM (
                SELECT u AS node FROM pairs
                UNION ALL
                SELECT v AS node FROM pairs
            )
            GROUP BY node
        )
        SELECT deg.node, deg.d,
               COALESCE(t.tri, 0) AS n_triangles,
               {_RHU_LCC.replace("t.tri", "COALESCE(t.tri, 0)")} AS coeff
        FROM deg LEFT JOIN t ON t.node = deg.node
        WHERE deg.d >= 2
        ORDER BY coeff DESC, deg.node LIMIT 20
    """,
)
def local_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-NODE clustering coefficient of the part co-purchase graph —
    2·tri(v) / (d(v)·(d(v)−1)), the local-density companion of the
    global transitivity row (triangle_count_copurchase): link-spam and
    community detection read the per-node value, not the global one.
    Top 20 under the (coeff, node) total order both engines replay.

    Scale shape: triangles are enumerated ONCE via the same
    degree-oriented wedge join as the global count (fan-out capped at
    out-degree O(sqrt(E)) per vertex even on power-law hubs), then each
    triangle credits its three vertices through one explode + groupBy —
    a shuffle keyed by node id, combiner-reduced. Degrees come from one
    map-side-combinable count; the coefficient is one exact-int double
    division. The id-ordered oracle counts the same triangles because
    every triangle has exactly one lowest-ordered vertex in either
    ordering."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    ).localCheckpoint(eager=False)
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    ).localCheckpoint(eager=False)
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    with_deg = pairs.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("du")).otherwise(F.col("dv")).alias("dsrc"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    ).localCheckpoint(eager=False)
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    wedge_order = (F.col("e1.ddst") < F.col("e2.ddst")) | (
        (F.col("e1.ddst") == F.col("e2.ddst"))
        & (F.col("e1.dst") < F.col("e2.dst"))
    )
    tri_nodes = (
        e1.join(e2, (F.col("e2.src") == F.col("e1.src")) & wedge_order)
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.dst"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.explode(
                F.array(F.col("e1.src"), F.col("e1.dst"), F.col("e2.dst"))
            ).alias("node")
        )
    )
    t = tri_nodes.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("tri"))
    return (
        deg.filter(F.col("d") >= 2)
        .join(t, "node", "left")
        .select(
            "node",
            "d",
            F.coalesce(F.col("tri"), F.lit(0).cast("bigint")).alias("n_triangles"),
            round_half_up(
                F.lit(2.0)
                * F.coalesce(F.col("tri"), F.lit(0)).cast("double")
                / (F.col("d") * (F.col("d") - F.lit(1))).cast("double"),
                6,
            ).alias("coeff"),
        )
        .orderBy(F.col("coeff").desc(), "node")
        .limit(20)
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
    "cohort_retention_orders",
    category="window",
    oracle="""
        WITH firsts AS (
            SELECT o_custkey,
                   MIN(date_trunc('month', o_orderdate)) AS cohort_month
            FROM orders GROUP BY o_custkey
        ),
        activity AS (
            SELECT DISTINCT o.o_custkey, f.cohort_month,
                   date_diff('month', f.cohort_month,
                             date_trunc('month', o.o_orderdate)) AS months_since
            FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
        )
        SELECT CAST(cohort_month AS TIMESTAMP) AS cohort_month,
               CAST(months_since AS BIGINT) AS months_since,
               CAST(COUNT(*) AS BIGINT) AS active_customers
        FROM activity
        GROUP BY cohort_month, months_since
        ORDER BY cohort_month, months_since
    """,
)
def cohort_retention_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the canonical product-analytics matrix: each
    customer joins the cohort of their first order month; each later
    active month increments that cohort's months-since-acquisition
    cell. Two aggregations (first-month per customer, then cohort x
    offset counts) and one join.

    Scale shape: the firsts table is customer-sized and re-joins on
    the customer key (AQE picks broadcast vs shuffle by its actual
    size); the distinct + count are map-side-combinable. The month
    arithmetic is integer (year*12+month), identical in both engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    firsts = orders.groupBy("o_custkey").agg(F.min(month).alias("cohort_month"))
    months_since = (
        (F.year("o_orderdate") - F.year("cohort_month")) * 12
        + (F.month("o_orderdate") - F.month("cohort_month"))
    ).cast("bigint")
    activity = (
        orders.join(firsts, "o_custkey")
        .select("o_custkey", "cohort_month", months_since.alias("months_since"))
        .distinct()
    )
    return (
        activity.groupBy("cohort_month", "months_since")
        .agg(F.count(F.lit(1)).cast("bigint").alias("active_customers"))
        .orderBy("cohort_month", "months_since")
    )


_RHU_YOY = sql_round_half_up(
    "revenue / lag(revenue, 12) OVER (ORDER BY month) - 1.0", 6
)


@query(
    "yoy_growth_by_month",
    category="window",
    oracle=f"""
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS revenue
            FROM orders GROUP BY month
        )
        SELECT CAST(month AS TIMESTAMP) AS month, revenue,
               lag(revenue, 12) OVER (ORDER BY month) AS revenue_prior_year,
               {_RHU_YOY} AS yoy_growth
        FROM monthly
        ORDER BY month
    """,
)
def yoy_growth_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth — the decision-support staple: aggregate
    to months (exact DECIMAL revenue so both engines agree to the
    cent), then a 12-step lag over the month series and a ratio.

    Scale shape: the window runs over the AGGREGATED series (months,
    not orders) — a single tiny partition by construction, which is
    the correct place for an unpartitioned window; the heavy data only
    ever sees the map-side-combinable monthly groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    monthly = (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w = W.orderBy("month")
    prior = F.lag("revenue", 12).over(w)
    return (
        monthly.select(
            "month",
            "revenue",
            prior.alias("revenue_prior_year"),
            round_half_up(F.col("revenue") / prior - 1.0, 6).alias("yoy_growth"),
        )
        .orderBy("month")
    )


#: Snapshot-diff cutoff: rows strictly before = the "old" snapshot;
#: the "new" snapshot additionally mutates a deterministic slice so
#: every diff class (added / removed / changed) is non-empty.
_DIFF_CUTOFF = "1997-01-01"


@query(
    "snapshot_diff_orders",
    category="ops",
    oracle=f"""
        WITH old AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderdate < TIMESTAMP '{_DIFF_CUTOFF}'
        ),
        new AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END
                       AS o_orderstatus,
                   o_totalprice
            FROM orders
            WHERE o_orderdate < TIMESTAMP '{_DIFF_CUTOFF}' OR o_orderkey % 5 = 0
        ),
        classified AS (
            SELECT
                CASE WHEN old.o_orderkey IS NULL THEN 'added'
                     WHEN new.o_orderkey IS NULL THEN 'removed'
                     WHEN old.o_orderstatus <> new.o_orderstatus
                          OR old.o_totalprice <> new.o_totalprice THEN 'changed'
                     ELSE 'unchanged' END AS diff_class
            FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
        )
        SELECT diff_class, CAST(COUNT(*) AS BIGINT) AS n
        FROM classified
        GROUP BY diff_class ORDER BY diff_class
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the dataset-versioning audit (what changed
    between yesterday's and today's table): full outer join on the key
    classifies every row as added / removed / changed / unchanged.
    The fixture derives both snapshots from one table (date cutoff +
    deterministic mutations) so all four classes are non-empty.

    Scale shape: one co-partitioned full outer join on the key (SMJ;
    bucketing both snapshots on the key makes it exchange-free — see
    bucketed_join_colocated) plus a tiny class count. Comparing row
    HASHES instead of column lists (doc_fingerprints) generalizes to
    wide tables with the same plan."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_DIFF_CUTOFF).cast("timestamp")
    old = orders.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = (
        orders.filter(
            (F.col("o_orderdate") < cutoff) | (F.col("o_orderkey") % 5 == 0)
        )
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 97 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            "o_totalprice",
        )
    )
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    diff_class = (
        F.when(F.col("o.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("n.o_orderkey").isNull(), F.lit("removed"))
        .when(
            (F.col("o.o_orderstatus") != F.col("n.o_orderstatus"))
            | (F.col("o.o_totalprice") != F.col("n.o_totalprice")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(diff_class.alias("diff_class"))
        .groupBy("diff_class")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("diff_class")
    )


#: Columns profiled by dataset_profile_orders (name -> cast for the
#: min/max string rendering; DECIMAL(18,2) prints identically in both
#: engines where raw DOUBLE text formatting would not).
_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


@query(
    "dataset_profile_orders",
    category="ops",
    oracle="""
        """
    + "\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders
        """
        for c in _PROFILE_COLS
    )
    + """
        ORDER BY column_name
    """,
)
def dataset_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling pass — the describe()/dbt-docs shape every
    ingest runs before trusting a new drop: per-column null count,
    distinct count, and min/max rendered as strings so one long-format
    table covers heterogeneous column types.

    Scale shape: ONE scan computes all columns' aggregates side by side
    (count/min/max combine map-side; countDistinct plans its own
    expand), then the wide row unpivots to long format via a generator
    — no per-column rescans, which is what separates a profiler that
    works at 100 TB from a loop over columns. Production swaps
    countDistinct for approx_count_distinct past memory limits;
    exactness here keeps the oracle exact."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__nulls"),
            F.countDistinct(c).cast("bigint").alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return (
        wide.select(
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
                "(column_name, n_nulls, n_distinct, min_value, max_value)"
            )
        )
        .orderBy("column_name")
    )


@query(
    "approx_top_k_tokens",
    category="approx",
    oracle="""
        WITH toks AS (
            SELECT t.tok AS token
            FROM documents, unnest(string_split(text, ' ')) AS t(tok)
            WHERE t.tok <> ''
        ),
        exact AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS est_count
            FROM toks GROUP BY token
        )
        SELECT CAST(row_number() OVER (ORDER BY est_count DESC, token)
                    AS INTEGER) AS rank,
               token, est_count
        FROM exact
        ORDER BY est_count DESC, token
        LIMIT 5
    """,
)
def approx_top_k_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` (Spark 4's heavy-hitter sketch aggregate) over
    the token stream — the built-in counterpart of the hand-rolled
    count-min sketch (cms_token_counts): one mergeable fixed-memory
    sketch per partition, combined map-side, top-k extracted at the
    end. On this bounded vocabulary the sketch tracks every item, so
    its counts are exact and the oracle is the exact top-5 (k=5 keeps
    the cut above the first tied count, where item order would be
    sketch-internal).

    Scale: the shuffle carries one sketch per partition instead of the
    token multiset — the same mergeable-summary contract that makes
    approx_count_distinct and approx_percentile the 100 TB forms."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    return (
        toks.selectExpr("approx_top_k(token, 5) AS t")
        .select(F.posexplode("t").alias("pos", "entry"))
        .select(
            (F.col("pos") + 1).cast("int").alias("rank"),
            F.col("entry.item").alias("token"),
            F.col("entry.count").cast("bigint").alias("est_count"),
        )
        .orderBy(F.desc("est_count"), "token")
    )


# --------------------------------------------------------------------------
# Dataset drift monitoring
# --------------------------------------------------------------------------

#: Drift cutoff: orders strictly before = the reference window, on/after
#: = the current window (fixture dates span 1995..2001, so both windows
#: are well-populated at every SF).
_DRIFT_CUTOFF = "1998-01-01"

#: Fixed-width price bins: floor(p/50k) capped at 9 — 10 deterministic
#: buckets over the fixture's [1e3, 5e5] o_totalprice range. Fixed edges
#: (not quantiles) keep the binning engine-independent and mergeable.
_PSI_BIN_WIDTH = 50000.0
_PSI_EPS = "0.000001"


@query(
    "dataset_drift_psi",
    category="ops",
    oracle=f"""
        WITH binned AS (
            SELECT LEAST(9, CAST(FLOOR(o_totalprice / {_PSI_BIN_WIDTH!r}) AS INT)) AS bin,
                   CAST(SUM(CASE WHEN o_orderdate <  TIMESTAMP '{_DRIFT_CUTOFF}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
                   CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_DRIFT_CUTOFF}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS cur_cnt
            FROM orders GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(ref_cnt) AS DOUBLE) AS ref_total,
                   CAST(SUM(cur_cnt) AS DOUBLE) AS cur_total
            FROM binned
        ),
        frac AS (
            SELECT bin, ref_cnt, cur_cnt,
                   GREATEST(CAST(ref_cnt AS DOUBLE) / ref_total, {_PSI_EPS}) AS ref_e,
                   GREATEST(CAST(cur_cnt AS DOUBLE) / cur_total, {_PSI_EPS}) AS cur_e
            FROM binned CROSS JOIN tot
        )
        SELECT bin, ref_cnt, cur_cnt,
               {sql_round_half_up('ref_e', 6)} AS ref_frac,
               {sql_round_half_up('cur_e', 6)} AS cur_frac,
               {sql_round_half_up('(cur_e - ref_e) * ln(cur_e / ref_e)', 6)} AS psi_term
        FROM frac ORDER BY bin
    """,
)
def dataset_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two date-window snapshots of
    ``orders`` — the standard production drift monitor a training-data
    platform runs between yesterday's and today's drop before retraining
    on it: bin the metric into fixed-edge buckets, compare the bucket
    mass fractions, PSI term = (cur - ref) * ln(cur / ref) per bucket
    (sum > 0.2 conventionally = significant drift).

    Scale shape: ONE map-side-combinable groupBy over 10 fixed bins
    (conditional-sum counts for both windows in the same pass — the
    table is scanned once, not once per window), then a broadcast cross
    join of the 1-row totals. Output is bin-count-sized regardless of
    corpus size — the mergeable-summary contract. Epsilon-guarded
    fractions keep ln finite when a bucket is empty on one side.
    Both engines derive fractions from identical integer counts, so the
    doubles entering ln are bit-identical.
    """
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_DRIFT_CUTOFF).cast("timestamp")
    binned = (
        orders.select(
            F.least(
                F.lit(9), F.floor(F.col("o_totalprice") / F.lit(_PSI_BIN_WIDTH)).cast("int")
            ).alias("bin"),
            (F.col("o_orderdate") < cutoff).alias("is_ref"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).cast("bigint").alias("ref_cnt"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).cast("bigint").alias("cur_cnt"),
        )
    )
    tot = F.broadcast(
        binned.agg(
            F.sum("ref_cnt").cast("double").alias("ref_total"),
            F.sum("cur_cnt").cast("double").alias("cur_total"),
        )
    )
    eps = F.lit(float(_PSI_EPS))
    frac = binned.crossJoin(tot).select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        F.greatest(F.col("ref_cnt").cast("double") / F.col("ref_total"), eps).alias("ref_e"),
        F.greatest(F.col("cur_cnt").cast("double") / F.col("cur_total"), eps).alias("cur_e"),
    )
    return frac.select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        round_half_up(F.col("ref_e"), 6).alias("ref_frac"),
        round_half_up(F.col("cur_e"), 6).alias("cur_frac"),
        round_half_up(
            (F.col("cur_e") - F.col("ref_e")) * F.log(F.col("cur_e") / F.col("ref_e")), 6
        ).alias("psi_term"),
    ).orderBy("bin")


@query(
    "embedding_drift_centroid",
    category="ops",
    oracle=f"""
        WITH ex AS (
            SELECT vec_id % 2 = 0 AS is_ref, t.d AS dim,
                   CAST({sql_round_half_up('CAST(embedding[t.d] AS DOUBLE)', 9)}
                        AS DECIMAL(28,12)) AS val
            FROM embeddings, unnest(generate_series(1, 64)) AS t(d)
        ),
        per AS (
            SELECT dim,
                   CAST(SUM(CASE WHEN is_ref THEN val END) AS DOUBLE)
                       / SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS ref_m,
                   CAST(SUM(CASE WHEN NOT is_ref THEN val END) AS DOUBLE)
                       / SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS cur_m
            FROM ex GROUP BY dim
        )
        SELECT CAST(dim AS INTEGER) AS dim,
               {sql_round_half_up('ref_m', 6)} AS ref_mean,
               {sql_round_half_up('cur_m', 6)} AS cur_mean,
               {sql_round_half_up('abs(ref_m - cur_m)', 6)} AS abs_shift
        FROM per ORDER BY dim
    """,
)
def embedding_drift_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift between two cohorts (even vs odd vec_id,
    standing in for last-week vs this-week encoder output): per-dimension
    centroid means and their absolute shift. A large shift on any axis
    means the encoder or the corpus moved — the cheap early-warning check
    run before re-indexing an ANN store or retraining on new embeddings.

    Scale shape: posexplode to (dim, value) long format, ONE combinable
    groupBy over 64 fixed dims with conditional DECIMAL sums (both
    cohorts in the same pass), output dim-count-sized. The dim-fan-out
    shuffle that makes long format wrong for ITERATIVE k-means
    (SCALE.md) is fine here: a single pass, and the shuffle rows carry
    one decimal each. DECIMAL(28,12) sums of 1e-9-rounded values make
    the means order-independent and bit-identical across engines.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        (F.col("vec_id") % 2 == 0).alias("is_ref"),
        F.posexplode("embedding").alias("dim0", "v"),
    ).select(
        "is_ref",
        (F.col("dim0") + 1).cast("int").alias("dim"),
        round_half_up(F.col("v").cast("double"), 9).cast(_DEC).alias("val"),
    )
    per = ex.groupBy("dim").agg(
        (
            F.sum(F.when(F.col("is_ref"), F.col("val"))).cast("double")
            / F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
        ).alias("ref_m"),
        (
            F.sum(F.when(~F.col("is_ref"), F.col("val"))).cast("double")
            / F.sum(F.when(~F.col("is_ref"), 1).otherwise(0))
        ).alias("cur_m"),
    )
    return per.select(
        "dim",
        round_half_up(F.col("ref_m"), 6).alias("ref_mean"),
        round_half_up(F.col("cur_m"), 6).alias("cur_mean"),
        round_half_up(F.abs(F.col("ref_m") - F.col("cur_m")), 6).alias("abs_shift"),
    ).orderBy("dim")


@query(
    "key_skew_profile",
    category="ops",
    oracle="""
        WITH per_key AS (
            SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY l_partkey
        ),
        bucketed AS (
            SELECT CAST(FLOOR(LN(cnt) / LN(2) + 0.000000001) AS INT) AS log2_bucket,
                   cnt
            FROM per_key
        )
        SELECT log2_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(MAX(cnt) AS BIGINT) AS max_key_rows
        FROM bucketed
        GROUP BY log2_bucket ORDER BY log2_bucket
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the profile run BEFORE shuffling 100 TB
    on a key, to decide between a plain shuffle join, AQE skew splitting,
    or explicit salting (salted_join_skewed): a frequency-of-frequencies
    histogram of rows-per-key in log2 buckets. A long tail of high
    buckets = hot keys that will straggle any hash-partitioned stage.

    Scale shape: groupBy key (the one real shuffle — map-side combinable
    counts), then a re-aggregation onto <= ~40 log2 buckets. No global
    sort, no rank: Gini-style exact rank statistics would need a
    partition-less window over every distinct key, which is exactly the
    single-reducer shape this engine bans; the histogram answers the
    same operational question with combinable aggregates only. The
    +1e-9 nudge inside floor absorbs libm's one-ulp log error on exact
    powers of two (error ~1e-15 at these magnitudes, far below the
    nudge; both engines compute ln via libm on identical integers).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_key = lineitem.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    bucketed = per_key.select(
        F.floor(F.log(F.col("cnt")) / F.log(F.lit(2.0)) + F.lit(1e-9))
        .cast("int")
        .alias("log2_bucket"),
        "cnt",
    )
    return (
        bucketed.groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.max("cnt").cast("bigint").alias("max_key_rows"),
        )
        .orderBy("log2_bucket")
    )


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
    dev = r.join(med.select("event_type", "median_value"), "event_type").select(
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
        dev.join(mad, "event_type")
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
    "interval_sweep_concurrency",
    category="analytics",
    oracle="""
        WITH pts AS (
            SELECT event_type, ts AS t, 1 AS delta FROM events
            UNION ALL
            SELECT event_type, ts + INTERVAL 1 HOUR AS t, -1 AS delta
            FROM events
        ),
        run AS (
            SELECT event_type, delta,
                   SUM(delta) OVER (PARTITION BY event_type
                                    ORDER BY t, delta) AS running
            FROM pts
        )
        SELECT event_type,
               CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_intervals,
               CAST(MAX(running) AS BIGINT) AS max_concurrent
        FROM run GROUP BY event_type ORDER BY event_type
    """,
)
def interval_sweep_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum concurrency of half-open 1-hour intervals per event
    type, by the classic sweep line: every interval contributes a +1
    endpoint at its start and a -1 at its end, and the peak of the
    running endpoint sum is the max overlap. Ordering ends (-1) before
    starts (+1) at equal timestamps gives exact half-open semantics —
    an interval ending at T never overlaps one starting at T. The
    running sum uses the default RANGE frame, so all peer rows at one
    (t, delta) key are summed together and the per-type max is
    order-independent under ties.

    Scale: endpoints double the row count but carry 3 narrow columns;
    one hash exchange on the sweep key (event_type) followed by an
    in-partition sort — the same plan at any fact size. Skewed sweep
    keys would range-partition the time axis and carry per-split open
    counts, the standard distributed-sweep refinement."""
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionAll(ends)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("t", "delta")
    run = pts.select("event_type", "delta", F.sum("delta").over(w).alias("running"))
    return (
        run.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_intervals"),
            F.max("running").cast("bigint").alias("max_concurrent"),
        )
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
    "assoc_rules_copurchase",
    category="analytics",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
            FROM lineitem
        ),
        n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders
              FROM items),
        supp AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS s
                 FROM items GROUP BY part),
        pairs AS (
            SELECT a.part AS p1, b.part AS p2,
                   CAST(COUNT(*) AS BIGINT) AS sp
            FROM items a JOIN items b
              ON a.okey = b.okey AND a.part < b.part
            GROUP BY a.part, b.part
        ),
        scored AS (
            SELECT p.p1, p.p2, p.sp,
                   CAST(p.sp AS DOUBLE) / CAST(s1.s AS DOUBLE) AS conf_12,
                   CAST(p.sp AS DOUBLE) / CAST(s2.s AS DOUBLE) AS conf_21,
                   CAST(n.n_orders * p.sp AS DOUBLE)
                       / CAST(s1.s * s2.s AS DOUBLE) AS lift_raw
            FROM pairs p
            JOIN supp s1 ON s1.part = p.p1
            JOIN supp s2 ON s2.part = p.p2
            CROSS JOIN n
            WHERE p.sp >= 2
        )
        SELECT p1, p2, sp AS pair_support,
               {sql_round_half_up('conf_12', 6)} AS conf_12,
               {sql_round_half_up('conf_21', 6)} AS conf_21,
               {sql_round_half_up('lift_raw', 6)} AS lift
        FROM scored
        ORDER BY lift DESC, p1, p2 LIMIT 20
    """,
)
def assoc_rules_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over co-purchased parts: pair support from the
    basket self-join (a.part < b.part orients each pair once),
    per-part support, and the top rules by lift with confidence in
    both directions. All supports are BIGINT counts; confidence and
    lift divide exact integer products cast to double in one identical
    expression, rounded half-up to 6.

    Scale: the same oriented basket self-join shape as
    triangle_count_copurchase — quadratic only in per-basket size, so
    a degenerate mega-basket wants the degree-cap/salting treatment
    documented there; supports join back by part key (hash exchanges
    on bounded item vocabulary) and the 1-row basket total broadcasts.
    The support>=2 floor prunes the long random-pair tail before the
    support joins — at 100 TB that floor is what keeps rule mining
    tractable (classic a-priori pruning)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    items = lineitem.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    n = items.agg(F.countDistinct("okey").cast("bigint").alias("n_orders"))
    supp = items.groupBy("part").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.part") < F.col("b.part")),
        )
        .groupBy(
            F.col("a.part").alias("p1"), F.col("b.part").alias("p2")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("sp"))
        .filter(F.col("sp") >= 2)
    )
    s1 = supp.select(F.col("part").alias("p1"), F.col("s").alias("s1"))
    s2 = supp.select(F.col("part").alias("p2"), F.col("s").alias("s2"))
    scored = (
        pairs.join(s1, "p1")
        .join(s2, "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            F.col("sp").alias("pair_support"),
            round_half_up(
                F.col("sp").cast("double") / F.col("s1").cast("double"), 6
            ).alias("conf_12"),
            round_half_up(
                F.col("sp").cast("double") / F.col("s2").cast("double"), 6
            ).alias("conf_21"),
            round_half_up(
                (F.col("n_orders") * F.col("sp")).cast("double")
                / (F.col("s1") * F.col("s2")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("lift").desc(), "p1", "p2").limit(20)


@query(
    "event_transition_matrix",
    category="analytics",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events
        ),
        t AS (
            SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM seq WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type
        ),
        tot AS (
            SELECT from_type, CAST(SUM(n) AS BIGINT) AS total_from
            FROM t GROUP BY from_type
        )
        SELECT t.from_type, t.to_type, t.n,
               {sql_round_half_up(
                   'CAST(t.n AS DOUBLE) / CAST(tt.total_from AS DOUBLE)', 6)}
                   AS prob
        FROM t JOIN tot tt ON tt.from_type = t.from_type
        ORDER BY t.from_type, t.to_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    stream: lead() pairs each event with the user's next event, counts
    aggregate per (from, to), and probabilities row-normalize by the
    from-state total — exact integer ratios, one identical double
    division. The behavioral-model summary every product-analytics
    pipeline derives from its event log.

    Scale: one hash exchange on user_id for the lead window, then a
    combinable count aggregate on the (from, to) vocabulary (|types|²
    rows at most); the normalization join runs on the vocabulary-sized
    aggregate, never the fact table."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    t = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = t.groupBy("from_type").agg(F.sum("n").cast("bigint").alias("total_from"))
    return (
        t.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            round_half_up(
                F.col("n").cast("double") / F.col("total_from").cast("double"), 6
            ).alias("prob"),
        )
        .orderBy("from_type", "to_type")
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
    "source_concentration_hhi",
    category="aggregation",
    oracle=f"""
        WITH c AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
            FROM documents GROUP BY source
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
                   CAST(SUM(docs) AS BIGINT) AS nd,
                   CAST(SUM(toks) AS BIGINT) AS nt,
                   CAST(SUM(docs * docs) AS BIGINT) AS sd2,
                   CAST(SUM(toks * toks) AS BIGINT) AS st2
            FROM c
        )
        SELECT n_sources,
               {sql_round_half_up(
                   'CAST(sd2 AS DOUBLE) / CAST(nd * nd AS DOUBLE)', 9)}
                   AS hhi_docs,
               {sql_round_half_up(
                   'CAST(nd * nd AS DOUBLE) / CAST(sd2 AS DOUBLE)', 6)}
                   AS effective_sources_docs,
               {sql_round_half_up(
                   'CAST(st2 AS DOUBLE) / CAST(nt * nt AS DOUBLE)', 9)}
                   AS hhi_tokens,
               {sql_round_half_up(
                   'CAST(nt * nt AS DOUBLE) / CAST(st2 AS DOUBLE)', 6)}
                   AS effective_sources_tokens
        FROM s
    """,
)
def source_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of the training mixture by
    source, on both document and token counts, plus the effective
    number of sources (1/HHI, the Simpson-diversity inverse) — the
    one-number diversity summary for a mixture report. HHI = Σ share²
    is computed as Σ cnt² / (Σ cnt)²: both sums are BIGINT-exact
    combinable aggregates, so no double addition ever happens across
    cells and the result is order-independent by construction.

    Scale: two stacked combinable aggregates (per-source, then 1-row);
    token counts ride the same scan. At 2^63 the cnt² sums bound the
    per-source count at ~3e9 × sources — beyond any real mixture; past
    that, normalize shares to ppm integers first."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("toks"),
    )
    s = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.sum("docs").cast("bigint").alias("nd"),
        F.sum("toks").cast("bigint").alias("nt"),
        F.sum(F.col("docs") * F.col("docs")).cast("bigint").alias("sd2"),
        F.sum(F.col("toks") * F.col("toks")).cast("bigint").alias("st2"),
    )
    nd, nt = F.col("nd"), F.col("nt")
    sd2, st2 = F.col("sd2"), F.col("st2")
    return s.select(
        "n_sources",
        round_half_up(sd2.cast("double") / (nd * nd).cast("double"), 9).alias(
            "hhi_docs"
        ),
        round_half_up((nd * nd).cast("double") / sd2.cast("double"), 6).alias(
            "effective_sources_docs"
        ),
        round_half_up(st2.cast("double") / (nt * nt).cast("double"), 9).alias(
            "hhi_tokens"
        ),
        round_half_up((nt * nt).cast("double") / st2.cast("double"), 6).alias(
            "effective_sources_tokens"
        ),
    )


@query(
    "bfs_reachability_copurchase",
    category="graph",
    oracle="""
        WITH RECURSIVE pairs AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        ),
        seed AS (SELECT CAST(MIN(l_partkey) AS BIGINT) AS node
                 FROM lineitem),
        walk AS (
            SELECT node, 0 AS dist FROM seed
          UNION
            SELECT p.dst AS node, w.dist + 1 AS dist
            FROM walk w JOIN pairs p ON p.src = w.node
            WHERE w.dist < 3
        ),
        d AS (SELECT node, MIN(dist) AS dist FROM walk GROUP BY node)
        SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               MIN(node) AS min_partkey, MAX(node) AS max_partkey
        FROM d GROUP BY dist ORDER BY dist
    """,
)
def bfs_reachability_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop-distance profile from the smallest part over the
    co-purchase graph, bounded at 3 hops (operators.graph.
    bfs_distances): the reachability probe behind 'related items
    within k hops' and graph-radius diagnostics — the fourth iterative
    algorithm under the exact-hash gate (after PageRank, connected
    components, k-means). Integer-only state, so no rounding is needed
    anywhere; the DuckDB oracle replays the walk as a recursive CTE
    with MIN(dist) collapsing revisits, which equals BFS first-visit
    labeling.

    Scale: per hop one frontier⋈edges shuffle + distinct with
    node-sized state; the profile aggregate is 4 rows. The seed is a
    broadcast 1-row MIN aggregate — no driver collect."""
    from pipeline_query_engine_demo_spark.operators.graph import bfs_distances

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    seed = li.agg(F.min("l_partkey").cast("bigint").alias("node"))
    vis = bfs_distances(pairs, seed, max_hops=3)
    return (
        vis.groupBy("dist")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.min("node").alias("min_partkey"),
            F.max("node").alias("max_partkey"),
        )
        .orderBy("dist")
    )


def _bf_iter_sql(i: int, p: int) -> str:
    """One Bellman-Ford relaxation round as a DuckDB CTE (reads d{p},
    defines d{i}): keep every known distance, add every one-edge
    extension, take the min per node. Integer-only state."""
    return f"""
        d{i} AS (
            SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d{p}
                UNION ALL
                SELECT p.dst AS node, d.dist + p.w AS dist
                FROM d{p} d JOIN pairs p ON p.src = d.node
            ) GROUP BY node
        )"""


@query(
    "shortest_path_weighted_copurchase",
    category="graph",
    oracle="""
        WITH pairs AS (
            SELECT a.l_partkey AS src, b.l_partkey AS dst,
                   GREATEST(1, 6 - COUNT(DISTINCT a.l_orderkey)) AS w
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
            GROUP BY a.l_partkey, b.l_partkey
        ),
        seed AS (SELECT CAST(MIN(l_partkey) AS BIGINT) AS node
                 FROM lineitem),
        d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM seed),
    """
    + _bf_iter_sql(1, 0)
    + ","
    + _bf_iter_sql(2, 1)
    + ","
    + _bf_iter_sql(3, 2)
    + """
        SELECT CAST(node AS BIGINT) AS partkey, CAST(dist AS BIGINT) AS dist
        FROM d3 ORDER BY dist, partkey LIMIT 100
    """,
)
def shortest_path_weighted_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths over the part co-purchase
    graph (operators.graph.sssp_distances) — Bellman-Ford, the weighted
    sibling of bfs_reachability_copurchase. Edge weight = GREATEST(1,
    6 - shared_orders): strongly co-purchased parts are 'closer', the
    affinity metric behind related-item distance at catalog scale. The
    100 nearest parts after 3 relaxation rounds, i.e. exact min cost
    over <= 3-edge paths — the Bellman-Ford invariant the 3 unrolled
    oracle CTEs replay with pure-integer state (no rounding anywhere).

    Scale: frontier-driven — only nodes improved last round relax out-
    edges, so settled regions stop paying per-round cost; per round one
    frontier⋈edges shuffle + node-keyed min and merge, all node-sized
    state, lineage cut per round."""
    from pipeline_query_engine_demo_spark.operators.graph import sssp_distances

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.countDistinct("a.l_orderkey").alias("cnt"))
        .select(
            "src",
            "dst",
            F.greatest(F.lit(1), F.lit(6) - F.col("cnt")).cast("bigint").alias("w"),
        )
    )
    seed = li.agg(F.min("l_partkey").cast("bigint").alias("node"))
    dist = sssp_distances(edges, seed, rounds=3)
    return (
        dist.select(
            F.col("node").cast("bigint").alias("partkey"),
            F.col("dist").cast("bigint").alias("dist"),
        )
        .orderBy("dist", "partkey")
        .limit(100)
    )


@query(
    "skyline_parts_price_size",
    category="analytics",
    oracle="""
        WITH pt AS (SELECT CAST(p_partkey AS BIGINT) AS partkey,
                           CAST(p_retailprice AS DOUBLE) AS retailprice,
                           CAST(p_size AS BIGINT) AS size
                    FROM part)
        SELECT me.partkey, me.retailprice, me.size
        FROM pt me
        WHERE NOT EXISTS (
            SELECT 1 FROM pt q
            WHERE q.retailprice <= me.retailprice AND q.size >= me.size
              AND (q.retailprice < me.retailprice OR q.size > me.size)
        )
        ORDER BY retailprice, partkey
    """,
)
def skyline_parts_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts under (retailprice minimized, size
    maximized) — the skyline operator (operators.skyline.skyline_2d,
    Börzsönyi et al. ICDE'01): 'the cheapest part at every size level',
    a multi-criteria frontier no single ORDER BY expresses. The oracle
    is the literal NOT EXISTS dominance definition over all parts, so
    the gate proves the two-phase plan (exact per-bucket prune via one
    vectorized applyInPandas, then a broadcast dominance anti-join over
    the skyline-sized candidate set) equals the quadratic semantics.
    DECIMAL(15,2) money and the 1..50 size are float64-exact, so the
    local prune's double comparisons introduce no boundary error."""
    from pipeline_query_engine_demo_spark.operators.skyline import skyline_2d

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("bigint").alias("partkey"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    return skyline_2d(
        part, "partkey", "retailprice", "size", maximize_y=True
    ).orderBy("retailprice", "partkey")


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


#: CUSUM parameters in integer cents: drift allowance k and alarm
#: threshold h. Integer state keeps the whole recursion exact — no
#: float ever enters the loop.
_CUSUM_K = 15000
_CUSUM_H = 50000


@query(
    "cusum_change_detection",
    category="analytics",
    oracle=f"""
        WITH RECURSIVE e AS (
            SELECT user_id,
                   CAST(CASE WHEN isfinite(value)
                        THEN floor((value) * 100.0 + 0.5) END AS BIGINT)
                       AS x,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events WHERE isfinite(value)
        ),
        steps AS (
            SELECT user_id, rn,
                   greatest(CAST(0 AS BIGINT), x - {_CUSUM_K}) AS s,
                   greatest(CAST(0 AS BIGINT), x - {_CUSUM_K}) AS mx,
                   CAST(CASE WHEN greatest(CAST(0 AS BIGINT), x - {_CUSUM_K})
                                  >= {_CUSUM_H} THEN 1 ELSE 0 END AS BIGINT)
                       AS alarms
            FROM e WHERE rn = 1
          UNION ALL
            SELECT e.user_id, e.rn,
                   greatest(CAST(0 AS BIGINT), st.s + e.x - {_CUSUM_K}),
                   greatest(st.mx,
                            greatest(CAST(0 AS BIGINT), st.s + e.x - {_CUSUM_K})),
                   st.alarms + CASE WHEN greatest(CAST(0 AS BIGINT),
                                                  st.s + e.x - {_CUSUM_K})
                                        >= {_CUSUM_H} THEN 1 ELSE 0 END
            FROM steps st JOIN e
              ON e.user_id = st.user_id AND e.rn = st.rn + 1
        ),
        last AS (
            SELECT user_id, rn, s, mx, alarms,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY rn DESC) AS rr
            FROM steps
        )
        SELECT user_id, CAST(rn AS BIGINT) AS n_events,
               s AS final_cusum, mx AS max_cusum, alarms AS n_alarms
        FROM last WHERE rr = 1 ORDER BY user_id
    """,
)
def cusum_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per user stream: the state
    s_t = max(0, s_(t-1) + x_t - k) accumulates evidence that the
    process mean exceeds the allowance k, alarming when s crosses h —
    the classic sequential change detector. Values scale to integer
    cents with the shared floor-half-up form, so the ENTIRE recursion
    is integer arithmetic: no float enters the loop on either engine,
    and parity is structural rather than ulp-lucky.

    The recurrence LOOKS order-dependent, but the one-sided max(0, .)
    reset has a closed form (Lindley's recursion / reflected random
    walk): with y_t = x_t - k and prefix sum P_t = sum_{i<=t} y_i,
        s_t = P_t - min(0, min_{i<=t} P_i),
    because the running minimum of the prefix sum (clamped at the
    initial 0) is exactly the amount the reflecting barrier has
    absorbed. That turns the whole detector into two cumulative
    window frames — a running SUM and a running MIN over the same
    (user_id, ts, event_id) ordering — followed by one combinable
    group-by: n_events = count, final_cusum = s at the last row,
    max_cusum = max(s), n_alarms = count of s >= h. Everything stays
    integer and JVM-side (whole-stage codegen; no Python eval node).
    The oracle replays the recurrence as a recursive CTE advancing
    every user one event per iteration; tests/test_stats_ext3.py
    additionally replays it as a literal Python scan, so the window
    identity is proven against the sequential form, not assumed.

    Scale: ONE hash exchange on user_id followed by an in-partition
    sort; both frames and the final aggregate ride the same exchange;
    per-user state is O(1) columns, never a per-group Python worker."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    c = F.col("value").cast("double")
    finite = ~(
        F.isnan(c) | (c == F.lit(float("inf"))) | (c == F.lit(float("-inf")))
    )
    x = F.when(finite, F.floor(c * F.lit(100.0) + F.lit(0.5)))
    # Non-finite values are EXCLUDED on both engines (the oracle filters
    # isfinite too): without the filter, DuckDB's greatest(0, NULL)
    # folds the NULL away while the pandas loop would crash on NaN —
    # "skip the row" is the one semantics both sides state identically.
    rows = ev.filter(finite).select(
        "user_id", "ts", "event_id", x.cast("bigint").alias("x")
    )

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stepped = rows.select(
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.sum(F.col("x") - F.lit(_CUSUM_K)).over(cum).alias("p"),
    )
    cum2 = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = F.col("p") - F.least(F.lit(0).cast("bigint"), F.min("p").over(cum2))
    per_row = stepped.select("user_id", "rn", s.alias("s"))
    return (
        per_row.groupBy("user_id")
        .agg(
            F.max("rn").cast("bigint").alias("n_events"),
            F.max_by("s", "rn").alias("final_cusum"),
            F.max("s").alias("max_cusum"),
            F.sum(
                F.when(F.col("s") >= F.lit(_CUSUM_H), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_alarms"),
        )
        .orderBy("user_id")
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


@query(
    "signup_to_purchase_latency",
    category="analytics",
    oracle=f"""
        WITH s AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts
            FROM events GROUP BY user_id
        ),
        p AS (
            SELECT e.user_id,
                   MIN(e.ts) AS first_purchase_ts
            FROM events e JOIN s ON s.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND s.signup_ts IS NOT NULL
              AND e.ts >= s.signup_ts
            GROUP BY e.user_id
        ),
        lat AS (
            SELECT p.user_id,
                   epoch_us(p.first_purchase_ts) - epoch_us(s.signup_ts)
                       AS micros
            FROM p JOIN s ON s.user_id = p.user_id
        ),
        r AS (
            SELECT user_id, micros,
                   row_number() OVER (ORDER BY micros, user_id) AS rn,
                   COUNT(*) OVER () AS n
            FROM lat
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
               {sql_round_half_up(
                   "SUM(CASE WHEN 2 * rn = n OR 2 * rn = n + 1"
                   " OR 2 * rn = n + 2 THEN micros END)"
                   " / COUNT(CASE WHEN 2 * rn = n OR 2 * rn = n + 1"
                   " OR 2 * rn = n + 2 THEN 1 END) / 1000000.0", 6)}
                   AS median_latency_sec,
               {sql_round_half_up(
                   "MAX(CASE WHEN rn = CAST(ceil(CAST(0.90 AS DOUBLE)"
                   " * CAST(n AS DOUBLE)) AS BIGINT)"
                   " THEN micros END) / 1000000.0", 6)} AS p90_latency_sec
        FROM r
    """,
)
def signup_to_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time from signup to first subsequent purchase per user, reduced
    to the median and nearest-rank p90 — the activation-funnel latency
    metric. Latencies are exact integer microseconds; the median uses
    the integer predicate 2·rn ∈ {n, n+1, n+2} (mad_robust_outliers'
    no-interpolation trick) and p90 the nearest-rank predicate, so the
    only float op is the final µs→s division.

    Scale note: the global rank over CONVERTED users runs partition-
    less here (converted users ≪ events; still user-scaled at 100 TB —
    swap in the bucketed two-phase rank of mann_whitney_u_events when
    that matters); flagged to the plan auditor whitelist with that
    justification. The events⋈signups join is deliberately UNhinted
    (ADVICE r4): s is a per-user aggregate — even filtered to
    signed-up users it is user-cardinality, and a forced broadcast of
    a user-grain table OOMs the driver at large user counts. AQE
    broadcasts it while it fits and falls back to shuffle when it
    doesn't; signup_ts rides the groupBy (functionally dependent on
    user_id) so no second join is needed at all."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "signup_ts"
        )
    ).filter(F.col("signup_ts").isNotNull())
    p = (
        ev.join(s, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.col("signup_ts"))
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    lat = p.select(
        "user_id",
        (
            F.unix_micros(F.col("first_purchase_ts"))
            - F.unix_micros(F.col("signup_ts"))
        ).alias("micros"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("micros", "user_id")
    r = lat.select(
        "micros",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    mid = (
        (F.lit(2) * F.col("rn") == F.col("n"))
        | (F.lit(2) * F.col("rn") == F.col("n") + F.lit(1))
        | (F.lit(2) * F.col("rn") == F.col("n") + F.lit(2))
    )
    p90_rn = F.ceil(F.lit(0.90) * F.col("n").cast("double")).cast("bigint")
    return r.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        round_half_up(
            F.sum(F.when(mid, F.col("micros")))
            / F.count(F.when(mid, F.lit(1)))
            / F.lit(1000000.0),
            6,
        ).alias("median_latency_sec"),
        round_half_up(
            F.max(F.when(F.col("rn") == p90_rn, F.col("micros")))
            / F.lit(1000000.0),
            6,
        ).alias("p90_latency_sec"),
    )


def _bucketed_row_number(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    bucket_expr: F.Column,
    out_col: str,
) -> DataFrame:
    """Global dense row_number in (value, tiebreak) order WITHOUT a
    partition-less window over the input: rows rank inside value-range
    buckets in parallel, and broadcast per-bucket cumulative counts
    supply the offsets — because the bucket is a monotone function of
    the value, bucket-then-within IS the global order. The same
    two-phase shape as llm._shuffle_positions (hash buckets) and
    mann_whitney_u_events (value buckets); the only partition-less
    window runs over the bucket-count table.

    NULL values get the sentinel bucket -(2^62): it sorts before every
    real bucket, so NULL rows rank FIRST — exactly Spark's default
    NULLS FIRST window order — instead of being silently dropped by a
    null-unsafe equi-join on a NULL bucket (ADVICE r5). If a fixture
    ever ships NULL values, DuckDB oracles must say NULLS FIRST
    explicitly (DuckDB defaults to NULLS LAST)."""
    from pyspark.sql import Window

    b = df.withColumn(
        "_b", F.coalesce(bucket_expr.cast("bigint"), F.lit(-(1 << 62)))
    )
    w_in = Window.partitionBy("_b").orderBy(value_col, tiebreak_col)
    within = b.withColumn("_rn_in", F.row_number().over(w_in))
    counts = b.groupBy("_b").agg(F.count(F.lit(1)).alias("_bn"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        within.join(F.broadcast(offsets), "_b")
        .withColumn(out_col, (F.col("_off") + F.col("_rn_in")).cast("bigint"))
        .drop("_b", "_rn_in", "_off")
    )


def _event_type_value_ranks(ev: DataFrame) -> DataFrame:
    """(event_type, value, rn, n): within-event_type row_number in
    (value, event_id) order plus the group count, computed WITHOUT a
    per-event_type window over the fact table. With ~5 event types a
    plain PARTITION BY event_type rank funnels the whole events table
    into 5 reducer tasks — the exact low-cardinality straggler
    weighted_median_price measured at 5.1x wall at x10 data (ADVICE
    r4). Rows rank inside (event_type, value-range bucket) in parallel
    instead: the bucket floor(value/10) is a monotone function of
    value, so bucket-then-within IS the per-type (value, event_id)
    order once broadcast per-bucket cumulative offsets are added. The
    only remaining windows run over the tiny (event_type, bucket)
    count table (~280 rows at any SF: value spans [0, ~560]).

    Shared by nearest_rank_percentiles, winsorized_mean_events and
    trimmed_mean_events, whose oracles all rank with the plain
    PARTITION BY event_type window — equality of the two forms is
    exactly the monotone-bucket argument above, and is additionally
    pinned by an independent pytest comparing this helper to a bare
    Window rank row-for-row."""
    from pyspark.sql import Window

    # NULL/NaN values bucket to the -(2^62) sentinel so they rank FIRST
    # (Spark's default NULLS FIRST window order) rather than vanishing
    # through a null-unsafe join on a NULL bucket (ADVICE r5). NaN gets
    # +2^62: Spark sorts NaN GREATER than any double, so NaN rows rank
    # last — again matching the plain-window form this helper replaces.
    v = F.col("value")
    b = ev.select("event_type", "value", "event_id").withColumn(
        "_b",
        F.when(v.isNull(), F.lit(-(1 << 62)))
        .when(F.isnan(v), F.lit(1 << 62))
        .otherwise(F.floor(v / F.lit(10.0)).cast("bigint")),
    )
    w_in = Window.partitionBy("event_type", "_b").orderBy("value", "event_id")
    within = b.withColumn("_rn_in", F.row_number().over(w_in))
    counts = b.groupBy("event_type", "_b").agg(F.count(F.lit(1)).alias("_bn"))
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "event_type",
        "_b",
        F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off"),
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("_bn").cast("bigint").alias("n")
    )
    return (
        within.join(F.broadcast(offsets), ["event_type", "_b"])
        .join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "value",
            (F.col("_off") + F.col("_rn_in")).cast("bigint").alias("rn"),
            "n",
        )
    )


@query(
    "rfm_segmentation",
    category="analytics",
    oracle="""
        WITH u AS (
            SELECT o_custkey AS custkey,
                   CAST(date_diff('day', MAX(o_orderdate),
                        (SELECT MAX(o_orderdate) FROM orders)) AS BIGINT)
                       AS recency_days,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100
                        AS BIGINT) AS monetary_cents
            FROM orders GROUP BY o_custkey
        ),
        r AS (
            SELECT *,
                   row_number() OVER (ORDER BY recency_days, custkey) AS rn_r,
                   row_number() OVER (ORDER BY freq, custkey) AS rn_f,
                   row_number() OVER (ORDER BY monetary_cents, custkey) AS rn_m,
                   COUNT(*) OVER () AS n
            FROM u
        ),
        s AS (
            SELECT custkey, monetary_cents,
                   CAST(6 - ((5 * rn_r + n - 1) // n) AS BIGINT) AS r_score,
                   CAST((5 * rn_f + n - 1) // n AS BIGINT) AS f_score,
                   CAST((5 * rn_m + n - 1) // n AS BIGINT) AS m_score
            FROM r
        )
        SELECT r_score, f_score, m_score,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(monetary_cents) AS BIGINT) AS total_monetary_cents
        FROM s GROUP BY r_score, f_score, m_score
        ORDER BY r_score, f_score, m_score
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: every customer scores 1–5 on Recency
    (days since last order, 5 = most recent), Frequency, and Monetary
    value, and the output is the segment-cell summary (≤125 rows).
    Quintiles come from exact global ranks via the INTEGER formula
    q = ceil(5·rn/n) = (5·rn + n − 1) div n — no percentile
    interpolation, no float.

    Scale: each of the three ranks uses _bucketed_row_number — rows
    rank within value-range buckets in parallel and add broadcast
    bucket offsets, so no partition-less window ever touches the
    customer table (the quintile thresholds a naive ntile() would
    compute in one reducer). Monetary stays in exact integer cents."""
    orders = load_table(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    u = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            (F.sum(F.col("o_totalprice").cast("decimal(12,2)")) * 100)
            .cast("bigint")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "custkey",
            F.datediff(F.col("ref_date"), F.col("last_order"))
            .cast("bigint")
            .alias("recency_days"),
            "freq",
            "monetary_cents",
        )
    )
    ranked = _bucketed_row_number(
        u, "recency_days", "custkey", F.col("recency_days") / F.lit(64), "rn_r"
    )
    ranked = _bucketed_row_number(
        ranked, "freq", "custkey", F.col("freq") / F.lit(4), "rn_f"
    )
    ranked = _bucketed_row_number(
        ranked,
        "monetary_cents",
        "custkey",
        F.col("monetary_cents") / F.lit(4194304),
        "rn_m",
    )
    n_tbl = u.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    s = ranked.crossJoin(F.broadcast(n_tbl)).selectExpr(
        "custkey",
        "monetary_cents",
        "CAST(6 - ((5 * rn_r + n - 1) div n) AS BIGINT) AS r_score",
        "CAST((5 * rn_f + n - 1) div n AS BIGINT) AS f_score",
        "CAST((5 * rn_m + n - 1) div n AS BIGINT) AS m_score",
    )
    return (
        s.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("monetary_cents").cast("bigint").alias("total_monetary_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


#: Benford first-digit probabilities log10(1 + 1/d), pre-folded to
#: Python doubles once and embedded as literals in BOTH engines — the
#: nDCG-discount trick: no runtime log10 anywhere.
import math as _math  # noqa: E402

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
    "seasonal_naive_backtest",
    category="analytics",
    oracle=f"""
        WITH m AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100
                        AS BIGINT) AS rev_cents
            FROM orders GROUP BY month
        ),
        j AS (
            SELECT a.month, a.rev_cents AS actual_cents,
                   b.rev_cents AS forecast_cents
            FROM m a JOIN m b ON b.month = a.month - INTERVAL 12 MONTH
        )
        SELECT month, actual_cents, forecast_cents,
               {sql_round_half_up(
                   'abs(CAST(actual_cents - forecast_cents AS DOUBLE))'
                   ' / CAST(actual_cents AS DOUBLE)', 6)} AS ape
        FROM j ORDER BY month
    """,
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecast (next month = same month
    last year) on monthly revenue: per-month actual, forecast, and
    absolute percentage error — the baseline every fancier forecaster
    must beat, and the shape of a forecast-accuracy dashboard. Revenue
    stays in exact integer cents (DECIMAL sum × 100), so the only
    float op is the final error ratio; emitting per-month rows (MAPE
    reduced in the test) avoids any cross-row float sum.

    Scale: one month-level aggregate, then a self-join on the
    12-month-shifted key — month-level tables are tiny at any fact
    size."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(12,2)")) * 100)
        .cast("bigint")
        .alias("rev_cents")
    )
    a = m.alias("a")
    b = m.select(
        (F.col("month") + F.expr("INTERVAL 12 MONTHS")).alias("month"),
        F.col("rev_cents").alias("forecast_cents"),
    )
    j = a.join(F.broadcast(b), "month").select(
        "month",
        F.col("rev_cents").alias("actual_cents"),
        "forecast_cents",
    )
    return j.select(
        "month",
        "actual_cents",
        "forecast_cents",
        round_half_up(
            F.abs((F.col("actual_cents") - F.col("forecast_cents")).cast("double"))
            / F.col("actual_cents").cast("double"),
            6,
        ).alias("ape"),
    ).orderBy("month")


@query(
    "seasonal_baseline_outliers",
    category="analytics",
    oracle=f"""
        WITH e AS (
            SELECT ts, value,
                   CAST(epoch_us(date_trunc('day', ts)) / 86400000000
                        AS BIGINT) % 7 AS dowi,
                   CAST(hour(ts) AS BIGINT) AS hr,
                   date_trunc('day', ts) AS day
            FROM events
        ),
        base AS (
            SELECT dowi, hr,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))
                            * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ss
            FROM e GROUP BY dowi, hr
        ),
        z AS (
            SELECT e.day,
                   CASE WHEN (b.ss / b.n - (b.s / b.n) * (b.s / b.n)) > 0.0
                        AND abs((e.value - b.s / b.n)
                                / sqrt(b.ss / b.n - (b.s / b.n) * (b.s / b.n)))
                            > 3.0
                        THEN 1 ELSE 0 END AS is_outlier
            FROM e JOIN base b ON b.dowi = e.dowi AND b.hr = e.hr
        )
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(is_outlier) AS BIGINT) AS n_outliers,
               {sql_round_half_up(
                   'CAST(SUM(is_outlier) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)',
                   6)} AS outlier_rate
        FROM z GROUP BY day ORDER BY day
    """,
)
def seasonal_baseline_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily anomaly rate against a (day-of-week, hour) seasonal
    baseline: each event's value is z-scored against its weekly-hour
    cell's population moments (exact DECIMAL power sums, the
    zscore_outlier_events recipe) and days are summarized by their
    |z| > 3 rate — the seasonality-aware monitor that a flat global
    threshold gets wrong on weekends. The day-of-week index is a pure
    integer epoch-day mod 7, dodging the Spark-vs-DuckDB
    dayofweek-convention mismatch entirely.

    Scale: one 168-cell baseline aggregate broadcast back onto the
    scan, then a day-level count — two combinable aggregates, no
    window."""
    ev = load_table(spark, sf_dir, "events")
    dowi = (
        F.unix_micros(F.date_trunc("day", F.col("ts"))) / F.lit(86400000000)
    ).cast("bigint") % 7
    e = ev.select(
        F.col("value"),
        dowi.alias("dowi"),
        F.hour("ts").cast("bigint").alias("hr"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    )
    v = F.col("value").cast("decimal(18,2)")
    base = e.groupBy("dowi", "hr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(v).cast("double").alias("s"),
        F.sum(v * v).cast("double").alias("ss"),
    )
    j = e.join(F.broadcast(base), ["dowi", "hr"])
    mean = F.col("s") / F.col("n")
    var = F.col("ss") / F.col("n") - mean * mean
    is_out = F.when(
        (var > F.lit(0.0))
        & (F.abs((F.col("value") - mean) / F.sqrt(var)) > F.lit(3.0)),
        1,
    ).otherwise(0)
    return (
        j.select("day", is_out.alias("is_outlier"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("is_outlier").cast("bigint").alias("n_outliers"),
            round_half_up(
                F.sum("is_outlier").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("outlier_rate"),
        )
        .orderBy("day")
    )


@query(
    "inter_event_gap_histogram",
    category="analytics",
    oracle="""
        WITH g AS (
            SELECT event_type,
                   epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id)) AS gap_us
            FROM events
        ),
        b AS (
            SELECT event_type,
                   CAST(floor(ln(CAST(gap_us AS DOUBLE) / 1000000.0)
                              / ln(2.0)) AS BIGINT) AS log2_bucket
            FROM g WHERE gap_us IS NOT NULL AND gap_us > 0
        )
        SELECT event_type, log2_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_gaps
        FROM b GROUP BY event_type, log2_bucket
        ORDER BY event_type, log2_bucket
    """,
)
def inter_event_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of inter-event gaps per (user, event-type) stream in
    log2-second buckets — the burstiness profile that picks session
    timeouts and watermark delays (the time-axis companion to
    key_skew_profile's frequency histogram). Gaps are exact integer
    microseconds; the bucket is floor(log2(seconds)) on identical
    doubles (ln/ln(2), both operands exact), and zero gaps (same-µs
    events) are excluded as degenerate.

    Scale: one lag window per (user, type) partition, then a
    combinable count on ~60 bucket cells."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (
            F.unix_micros(F.col("ts"))
            - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    )
    b = g.filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0)).select(
        "event_type",
        F.floor(
            F.log(F.col("gap_us").cast("double") / F.lit(1000000.0))
            / F.log(F.lit(2.0))
        )
        .cast("bigint")
        .alias("log2_bucket"),
    )
    return (
        b.groupBy("event_type", "log2_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps"))
        .orderBy("event_type", "log2_bucket")
    )


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
    "ordered_funnel_conversion",
    category="analytics",
    oracle=f"""
        WITH t1 AS (
            SELECT user_id, MIN(ts) AS ts1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        t2 AS (
            SELECT e.user_id, MIN(e.ts) AS ts2
            FROM events e JOIN t1 ON t1.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts >= t1.ts1
            GROUP BY e.user_id
        ),
        t3 AS (
            SELECT e.user_id, MIN(e.ts) AS ts3
            FROM events e JOIN t2 ON t2.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= t2.ts2
            GROUP BY e.user_id
        ),
        counts AS (
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t1) AS n_view,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM t2) AS n_click,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM t3) AS n_purchase
        )
        SELECT n_view, n_click, n_purchase,
               {sql_round_half_up(
                   'CAST(n_click AS DOUBLE) / CAST(n_view AS DOUBLE)', 6)}
                   AS click_rate,
               {sql_round_half_up(
                   'CAST(n_purchase AS DOUBLE) / CAST(n_click AS DOUBLE)', 6)}
                   AS purchase_rate,
               {sql_round_half_up(
                   'CAST(n_purchase AS DOUBLE) / CAST(n_view AS DOUBLE)', 6)}
                   AS overall_rate
        FROM counts
    """,
)
def ordered_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly ORDERED funnel: view → first click AT OR AFTER the
    first view → first purchase AT OR AFTER that click, with per-step
    user counts and conversion rates. Order matters — a purchase before
    the first view does not convert — which is what separates a funnel
    from three independent EXISTS filters (signup_to_purchase_latency
    measures the unordered 2-step latency; this is the k-step ordered
    membership).

    Spark shape: two window passes over ONE user_id exchange (Catalyst
    reuses the hash partitioning across both): pass 1 pins ts1 =
    min(view ts) per user; rows failing click ∧ ts >= ts1 drop; pass 2
    pins ts2 and filters purchases the same way. The final counts are
    three tiny aggregates. The oracle builds the identical chain with
    per-step GROUP BY joins.

    Scale: no self-joins of the fact table and no driver-side counts —
    each pass is a window + filter on the already-partitioned stream,
    the per-user step flags reduce in the same exchange, and the final
    three counts are one combinable aggregate; at 100 TB this is the
    sessionization access pattern (one shuffle, linear passes)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    with_t1 = ev.withColumn(
        "ts1",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    ).filter(F.col("ts1").isNotNull())
    with_t2 = (
        with_t1.withColumn(
            "ts2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("ts1")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = with_t2.groupBy("user_id").agg(
        F.max(F.col("ts2").isNotNull()).alias("has_click"),
        F.max(
            F.col("ts2").isNotNull()
            & (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.col("ts2"))
        ).alias("has_purchase"),
    )
    counts = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_view"),
        F.sum(F.col("has_click").cast("long")).cast("bigint").alias("n_click"),
        F.sum(F.col("has_purchase").cast("long"))
        .cast("bigint")
        .alias("n_purchase"),
    )
    return counts.select(
        "n_view",
        "n_click",
        "n_purchase",
        round_half_up(
            F.col("n_click").cast("double") / F.col("n_view").cast("double"), 6
        ).alias("click_rate"),
        round_half_up(
            F.col("n_purchase").cast("double") / F.col("n_click").cast("double"),
            6,
        ).alias("purchase_rate"),
        round_half_up(
            F.col("n_purchase").cast("double") / F.col("n_view").cast("double"),
            6,
        ).alias("overall_rate"),
    )


@query(
    "sequential_pattern_support",
    category="analytics",
    oracle="""
        WITH r AS (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        spans AS (
            SELECT user_id, event_type,
                   MIN(rn) AS first_rn, MAX(rn) AS last_rn
            FROM r GROUP BY user_id, event_type
        ),
        tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
                FROM events),
        sup AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM spans a
            JOIN spans b ON b.user_id = a.user_id
                        AND a.first_rn < b.last_rn
            GROUP BY type_a, type_b
        )
        SELECT s.type_a, s.type_b, s.n_users,
               CASE WHEN isfinite(CAST(s.n_users AS DOUBLE) / tot.n)
                    THEN floor(CAST(s.n_users AS DOUBLE) / tot.n * 1000000.0
                               + 0.5) / 1000000.0 END AS support
        FROM sup s CROSS JOIN tot
        ORDER BY s.n_users DESC, s.type_a, s.type_b
    """,
)
def sequential_pattern_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support mining (the length-2 core of
    PrefixSpan): for every ordered pair of event types (a, b), the
    number and fraction of users whose stream contains some a BEFORE
    some b (any gap — subsequence, not bigram; contiguous hops are
    event_transition_matrix's job).

    The naive encoding enumerates all i<j event pairs per user —
    quadratic in stream length, ~10^10 pairs per million-event user at
    100 TB. The identity used instead: "∃ i<j with type_i=a, type_j=b"
    ⟺ first_rank(a) < last_rank(b), so one rank window + one per-user
    5-row span table + a 25-combination self-join per user replaces
    the quadratic blow-up — O(n) + O(|types|^2) per user, exactly.

    Scale: one hash exchange on user_id for the rank window; the span
    self-join joins 5-rows-per-user tables co-partitioned on user_id;
    the support aggregate is combinable over the 25-pair domain."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
    spans = r.groupBy("user_id", "event_type").agg(
        F.min("rn").alias("first_rn"), F.max("rn").alias("last_rn")
    )
    tot = ev.agg(F.count_distinct("user_id").cast("bigint").alias("n"))
    a = spans.select(
        "user_id", F.col("event_type").alias("type_a"), "first_rn"
    )
    b = spans.select(
        "user_id", F.col("event_type").alias("type_b"), "last_rn"
    )
    sup = (
        a.join(b, "user_id")
        .filter(F.col("first_rn") < F.col("last_rn"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )
    return (
        sup.join(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_users",
            round_half_up(
                F.col("n_users").cast("double") / F.col("n").cast("double"), 6
            ).alias("support"),
        )
        .orderBy(F.col("n_users").desc(), "type_a", "type_b")
    )


_ACF_MAX_LAG = 5
#: round9-then-DECIMAL day-total term, shared by the Spark builder's
#: SQL twin below.
_ACF_TERM = sql_round_half_up("value", 9)


@query(
    "acf_daily_event_values",
    category="analytics",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   SUM(CAST({_ACF_TERM} AS DECIMAL(28,12))) AS ds_dec
            FROM events GROUP BY 1, 2),
        st AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(ds_dec) AS DOUBLE) AS tot
            FROM daily GROUP BY 1),
        dev AS (
            SELECT d.event_type, d.day, st.n_days,
                   CAST(d.ds_dec AS DOUBLE) - st.tot / st.n_days AS dv
            FROM daily d JOIN st ON st.event_type = d.event_type),
        lagged AS (
            SELECT event_type, day, n_days, dv,
                   {", ".join(
                       f"lag(dv, {L}) OVER "
                       "(PARTITION BY event_type ORDER BY day) AS "
                       f"dv{L}" for L in range(1, _ACF_MAX_LAG + 1))}
            FROM dev),
        agg AS (
            SELECT event_type, MAX(n_days) AS n_days,
                   CAST(SUM(CAST({sql_round_half_up("dv * dv", 9)}
                       AS DECIMAL(28,12))) AS DOUBLE) AS denom,
                   {", ".join(
                       f"CAST(SUM(CAST({sql_round_half_up(f'dv * dv{L}', 9)}"
                       f" AS DECIMAL(28,12))) AS DOUBLE) AS num{L}"
                       for L in range(1, _ACF_MAX_LAG + 1))}
            FROM lagged GROUP BY event_type)
        SELECT event_type, CAST(lag AS INT) AS lag,
               CAST(n_days AS BIGINT) AS n_days,
               {sql_round_half_up("num / denom", 6)} AS acf
        FROM agg,
             LATERAL (VALUES {", ".join(
                 f"({L}, num{L})" for L in range(1, _ACF_MAX_LAG + 1))})
                 AS t(lag, num)
        ORDER BY event_type, lag
    """,
)
def acf_daily_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation function (lags 1..5) of each event
    type's DAILY value total — the seasonality diagnostic that decides
    whether a forecast needs weekly terms (big lag-7 ACF) or is white
    noise. r_L = Σ (x_t - x̄)(x_{t-L} - x̄) / Σ (x_t - x̄)², the
    standard biased estimator with the full-series denominator.

    Determinism: day totals and all quadratic sums use the repo's
    order-independent recipe (round each term to 9 dp → DECIMAL(28,12)
    accumulate → one double cast); x̄ is one double division of an
    exact decimal total, so every dev product is the same IEEE value
    in both engines and the gate hash-compares acf raw.

    Scale: the ONLY corpus-sized stage is the (event_type, day)
    aggregation — fully combinable, shuffle carries one decimal per
    group. The lag windows then run over |types| × |days| rows
    (thousands at a century of days), so per-type sequential
    dependence never touches the event-level data. Window is
    partitioned by event_type (audit-clean)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum(round_half_up(F.col("value"), 9).cast("decimal(28,12)")).alias(
            "ds_dec"
        )
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("ds_dec").cast("double").alias("tot"),
    )
    dev = daily.join(F.broadcast(st), "event_type").select(
        "event_type",
        "day",
        "n_days",
        (F.col("ds_dec").cast("double") - F.col("tot") / F.col("n_days")).alias(
            "dv"
        ),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = dev.select(
        "event_type",
        "n_days",
        "dv",
        *[
            F.lag("dv", L).over(w).alias(f"dv{L}")
            for L in range(1, _ACF_MAX_LAG + 1)
        ],
    )

    def _dsum(col):
        return F.sum(round_half_up(col, 9).cast("decimal(28,12)")).cast("double")

    agg = lagged.groupBy("event_type").agg(
        F.max("n_days").alias("n_days"),
        _dsum(F.col("dv") * F.col("dv")).alias("denom"),
        *[
            _dsum(F.col("dv") * F.col(f"dv{L}")).alias(f"num{L}")
            for L in range(1, _ACF_MAX_LAG + 1)
        ],
    )
    stacked = agg.select(
        "event_type",
        "n_days",
        "denom",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).cast("int").alias("lag"),
                        F.col(f"num{L}").alias("num"),
                    )
                    for L in range(1, _ACF_MAX_LAG + 1)
                ]
            )
        ).alias("ln"),
    )
    return stacked.select(
        "event_type",
        F.col("ln.lag").alias("lag"),
        F.col("n_days").cast("bigint").alias("n_days"),
        round_half_up(F.col("ln.num") / F.col("denom"), 6).alias("acf"),
    ).orderBy("event_type", "lag")


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


@query(
    "stl_decompose_daily_values",
    category="analytics",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(epoch_us(date_trunc('day', ts)) / 86400000000
                        AS BIGINT) % 7 AS dowi,
                   SUM(CAST({sql_round_half_up("value", 9)}
                       AS DECIMAL(28,12))) AS ds_dec
            FROM events GROUP BY 1, 2, 3),
        tr AS (
            SELECT event_type, day, dowi,
                   CAST(ds_dec AS DOUBLE) AS x,
                   CASE WHEN COUNT(*) OVER w = 7
                        THEN CAST(SUM(ds_dec) OVER w AS DOUBLE) / 7.0
                   END AS trend
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        det AS (
            SELECT event_type, day, dowi, x, trend, x - trend AS d
            FROM tr),
        sraw AS (
            SELECT event_type, dowi,
                   CAST(SUM(CAST({sql_round_half_up("d", 9)}
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / COUNT(d) AS s_raw
            FROM det WHERE d IS NOT NULL GROUP BY 1, 2),
        smean AS (
            SELECT event_type,
                   CAST(SUM(CAST({sql_round_half_up("s_raw", 9)}
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / COUNT(*) AS sbar
            FROM sraw GROUP BY 1),
        seas AS (
            SELECT s.event_type, s.dowi, s.s_raw - m.sbar AS seasonal
            FROM sraw s JOIN smean m ON m.event_type = s.event_type)
        SELECT d.event_type, d.day,
               {sql_round_half_up("d.x", 6)} AS observed,
               {sql_round_half_up("d.trend", 6)} AS trend,
               {sql_round_half_up("se.seasonal", 6)} AS seasonal,
               {sql_round_half_up("d.x - d.trend - se.seasonal", 6)}
                   AS remainder
        FROM det d JOIN seas se
          ON se.event_type = d.event_type AND se.dowi = d.dowi
        ORDER BY d.event_type, d.day
    """,
)
def stl_decompose_daily_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style additive decomposition of each event type's daily
    value series: trend = centered 7-day moving average (NULL at the
    edges where the window is short), seasonal = mean-centered
    day-of-week effect of the detrended series, remainder = what's
    left — the classic decomposition that turns "traffic dipped" into
    "trend fell" vs "it's just Sunday" (Cleveland et al.'s STL, here
    with a single moving-average pass instead of loess, which keeps it
    a pure windowed-aggregate plan).

    Determinism: day totals are exact decimals; the 7-day trend is an
    exact decimal window sum with ONE division; day-of-week means use
    the round9 → DECIMAL recipe; every remaining op is the same IEEE
    expression on both engines. Day-of-week = epoch-day mod 7
    (engine-neutral integer).

    Scale: the corpus-sized stage is the combinable daily aggregate;
    windows and seasonal means then run over |types|·|days| rows. A
    longer season (monthly/yearly) changes constants, not shape."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    daily = events.groupBy(
        "event_type",
        day.alias("day"),
        (
            F.pmod(
                (F.unix_micros(day) / F.lit(86400000000)).cast("bigint"),
                F.lit(7),
            )
        ).alias("dowi"),
    ).agg(
        F.sum(round_half_up(F.col("value"), 9).cast("decimal(28,12)")).alias(
            "ds_dec"
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "day",
        "dowi",
        F.col("ds_dec").cast("double").alias("x"),
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.sum("ds_dec").over(w).cast("double") / F.lit(7.0),
        ).alias("trend"),
    )
    det = tr.withColumn("d", F.col("x") - F.col("trend"))

    def _dsum(col):
        return F.sum(round_half_up(col, 9).cast("decimal(28,12)")).cast("double")

    sraw = (
        det.filter(F.col("d").isNotNull())
        .groupBy("event_type", "dowi")
        .agg((_dsum(F.col("d")) / F.count("d")).alias("s_raw"))
    )
    smean = sraw.groupBy("event_type").agg(
        (_dsum(F.col("s_raw")) / F.count(F.lit(1))).alias("sbar")
    )
    seas = sraw.join(F.broadcast(smean), "event_type").select(
        "event_type", "dowi", (F.col("s_raw") - F.col("sbar")).alias("seasonal")
    )
    return (
        det.join(F.broadcast(seas), ["event_type", "dowi"])
        .select(
            "event_type",
            "day",
            round_half_up(F.col("x"), 6).alias("observed"),
            round_half_up(F.col("trend"), 6).alias("trend"),
            round_half_up(F.col("seasonal"), 6).alias("seasonal"),
            round_half_up(
                F.col("x") - F.col("trend") - F.col("seasonal"), 6
            ).alias("remainder"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "theil_sen_daily_trend",
    category="analytics",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(epoch_us(date_trunc('day', ts)) / 86400000000
                        AS BIGINT) AS t,
                   SUM(CAST({sql_round_half_up("value", 9)}
                       AS DECIMAL(28,12))) AS ds_dec
            FROM events GROUP BY 1, 2),
        pairs AS (
            SELECT a.event_type,
                   (CAST(b.ds_dec AS DOUBLE) - CAST(a.ds_dec AS DOUBLE))
                       / CAST(b.t - a.t AS DOUBLE) AS slope,
                   a.t AS ta, b.t AS tb
            FROM daily a JOIN daily b
              ON b.event_type = a.event_type AND b.t > a.t),
        r AS (
            SELECT event_type, slope,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY slope, ta, tb) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM pairs),
        med AS (
            SELECT event_type, MAX(n) AS n_pairs,
                   SUM(slope) / COUNT(*) AS m
            FROM r
            WHERE 2 * rn IN (n, n + 1, n + 2)
            GROUP BY event_type),
        nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
               FROM daily GROUP BY 1)
        SELECT m.event_type, nd.n_days,
               CAST(m.n_pairs AS BIGINT) AS n_pairs,
               {sql_round_half_up("m.m", 6)} AS ts_slope
        FROM med m JOIN nd ON nd.event_type = m.event_type
        ORDER BY m.event_type
    """,
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator per event type: the MEDIAN of
    all pairwise day-to-day slopes of the daily value series — the
    breakdown-resistant alternative to the OLS slope
    (stats_linear_regression family): one wild outlier day drags OLS
    arbitrarily but moves a median of ~O(days²) slopes one rank.

    Determinism: day totals are exact decimals, each pairwise slope is
    one IEEE subtraction+division of identical operands, and the
    median uses the exact midrank trick (2·rn ∈ {{n, n+1, n+2}} with a
    (ta, tb) tiebreak) — the 1-or-2 selected values average exactly
    the same on both engines.

    Scale: the pair join is DAYS², not corpus² — the corpus-sized
    stage is the combinable daily aggregate; a years-long series at
    100 TB is still only ~10⁵ pairs per type, and the rank window is
    bounded by that pair count, never the fact table."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    daily = events.groupBy(
        "event_type",
        (F.unix_micros(day) / F.lit(86400000000)).cast("bigint").alias("t"),
    ).agg(
        F.sum(round_half_up(F.col("value"), 9).cast("decimal(28,12)")).alias(
            "ds_dec"
        )
    )
    a = daily.select(
        "event_type",
        F.col("t").alias("ta"),
        F.col("ds_dec").cast("double").alias("xa"),
    )
    b = daily.select(
        "event_type",
        F.col("t").alias("tb"),
        F.col("ds_dec").cast("double").alias("xb"),
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("tb") > F.col("ta"))
        .select(
            "event_type",
            (
                (F.col("xb") - F.col("xa"))
                / (F.col("tb") - F.col("ta")).cast("double")
            ).alias("slope"),
            "ta",
            "tb",
        )
    )
    wr = Window.partitionBy("event_type").orderBy("slope", "ta", "tb")
    wn = Window.partitionBy("event_type")
    r = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = (
        r.filter(
            (2 * F.col("rn") >= F.col("n")) & (2 * F.col("rn") <= F.col("n") + 2)
        )
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n_pairs"),
            (F.sum("slope") / F.count(F.lit(1))).alias("m"),
        )
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return (
        med.join(nd, "event_type")
        .select(
            "event_type",
            "n_days",
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            round_half_up(F.col("m"), 6).alias("ts_slope"),
        )
        .orderBy("event_type")
    )


_HILBERT_ORDER = 8  # 256 x 256 grid


def _hilbert_stage_exprs(s: int, idiv: str) -> dict[str, str]:
    """One unrolled level of the standard xy2d Hilbert walk (level
    side ``s``), as engine-neutral SQL snippets; ``idiv`` is the
    engine's integer-division operator ('div' for Spark, '//' for
    DuckDB). Invariant: x, y enter the stage in [0, 2s), so the
    quadrant bits are plain divisions — and the stage REDUCES into the
    sub-square (x − rx·s) before the reflect-then-swap rotation, so
    coordinates stay non-negative throughout (the canonical pseudocode
    lets reflections go negative, where SQL's truncating division and
    sign-of-dividend %% silently diverge from the two's-complement bit
    tricks the canonical loop relies on). The d increment is
    s²·((3·rx) XOR ry) written arithmetically (3·rx + ry·(1−2·rx), an
    identity on {0,1}² — avoids engine-specific XOR spellings)."""
    rx = f"(x {idiv} {s})"
    ry = f"(y {idiv} {s})"
    xr = f"(x - {rx} * {s})"
    yr = f"(y - {ry} * {s})"
    return {
        "d": f"d + {s * s} * (3 * {rx} + {ry} * (1 - 2 * {rx}))",
        "x": (
            f"CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1"
            f" THEN {s - 1} - {yr} ELSE {yr} END ELSE {xr} END"
        ),
        "y": (
            f"CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1"
            f" THEN {s - 1} - {xr} ELSE {xr} END ELSE {yr} END"
        ),
    }


def _hilbert_oracle_sql() -> str:
    ctes = [
        "g AS (SELECT event_id, user_id % 256 AS x0, "
        "CAST(extract(hour FROM ts) AS BIGINT) * 10 AS y0 FROM events)",
        "h0 AS (SELECT event_id, x0 AS x, y0 AS y, "
        "CAST(0 AS BIGINT) AS d FROM g)",
    ]
    for i in range(_HILBERT_ORDER):
        s = 1 << (_HILBERT_ORDER - 1 - i)
        e = _hilbert_stage_exprs(s, "//")
        ctes.append(
            f"h{i + 1} AS (SELECT event_id, {e['x']} AS x, {e['y']} AS y, "
            f"{e['d']} AS d FROM h{i})"
        )
    last = f"h{_HILBERT_ORDER}"
    return f"""
        WITH {", ".join(ctes)}
        SELECT g.event_id, g.x0 AS x, g.y0 AS y,
               CAST({last}.d AS BIGINT) AS hvalue
        FROM g JOIN {last} ON {last}.event_id = g.event_id
        ORDER BY g.event_id
    """


@query(
    "hilbert_curve_events",
    category="layout",
    oracle=_hilbert_oracle_sql(),
)
def hilbert_curve_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert curve over the same two query dimensions as
    zorder_curve_events (user bucket × scaled hour) — the
    locality-SUPERIOR multidimensional layout key: consecutive Hilbert
    positions are always grid-adjacent (|Δx|+|Δy| = 1, proven
    exhaustively in tests), where the Z curve takes long diagonal
    jumps at bit boundaries, so range scans touch fewer files under
    Hilbert ordering (the reason Delta Lake added HILBERT as an
    OPTIMIZE mode beside ZORDER). The 8-level xy2d walk unrolls into
    ONE whole-stage-codegen projection chain — pure map-side integer
    arithmetic, zero shuffles before the presentation sort — generated
    from the same per-level snippets the DuckDB oracle uses, with only
    the integer-division spelling differing.
    """
    ev = load_table(spark, sf_dir, "events")
    df = ev.selectExpr(
        "event_id",
        "user_id % 256 AS x0",
        "CAST(hour(ts) AS BIGINT) * 10 AS y0",
    ).selectExpr("event_id", "x0", "y0", "x0 AS x", "y0 AS y", "CAST(0 AS BIGINT) AS d")
    for i in range(_HILBERT_ORDER):
        s = 1 << (_HILBERT_ORDER - 1 - i)
        e = _hilbert_stage_exprs(s, "div")
        df = df.selectExpr(
            "event_id",
            "x0",
            "y0",
            f"{e['x']} AS x",
            f"{e['y']} AS y",
            f"{e['d']} AS d",
        )
    return df.selectExpr(
        "event_id", "x0 AS x", "y0 AS y", "CAST(d AS BIGINT) AS hvalue"
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# k-core decomposition (peel profile) — graph family
# --------------------------------------------------------------------------

#: Peel threshold: every node with current degree < _KCORE_K is removed
#: each round. 3 sits inside the thresholded co-purchase graph's degree
#: spread at the fixture SFs (median 3 at sf0.01), so the peel genuinely
#: cascades (11 rounds to fixpoint at sf0.01) instead of all-surviving
#: or collapsing in one sweep.
_KCORE_K = 3
#: Round budget. Covers the observed fixpoint at every fixture SF
#: (sf0.01 converges in 11 sweeps; sf0.1's sparser repeat-pair graph
#: empties in 2); semantics stay exact for ANY budget — row r is the
#: survivor count after r synchronous sweeps, trailing rows repeat at
#: fixpoint.
_KCORE_ROUNDS = 12


def _kcore_iter_sql(i: int) -> str:
    """One synchronous peel sweep as a DuckDB CTE (reads e{i-1}, defines
    e{i}): keep only edges whose BOTH endpoints currently have degree
    >= _KCORE_K — the same sweep operators.graph.kcore_peel runs as a
    degree groupBy plus two left-semi joins."""
    p = i - 1
    keep = f"(SELECT src FROM e{p} GROUP BY src HAVING COUNT(*) >= {_KCORE_K})"
    return f"""
        e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM e{p} e
                 JOIN {keep} ka ON e.src = ka.src
                 JOIN {keep} kb ON e.dst = kb.src)"""


@query(
    "kcore_peel_profile_copurchase",
    category="graph",
    oracle="""
        WITH d AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst
               FROM d a JOIN d b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey <> b.l_partkey
               GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    """
    + ",".join(_kcore_iter_sql(i) for i in range(1, _KCORE_ROUNDS + 1))
    + """
        SELECT * FROM (
    """
    + " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS peel_round, "
        f"CAST(COUNT(DISTINCT src) AS BIGINT) AS nodes_remaining, "
        f"CAST(COUNT(*) AS BIGINT) AS edges_remaining FROM e{r}"
        for r in range(_KCORE_ROUNDS + 1)
    )
    + """
        ) ORDER BY peel_round
    """,
)
def kcore_peel_profile_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition peel profile (Seidman 1983) of the REPEAT
    co-purchase graph — parts linked when they co-occur in >= 2 orders
    (the weight threshold keeps the graph sparse enough to have real
    core structure; the raw co-occurrence graph is a near-clique soup
    whose k-core is all-or-nothing). Each round removes every node of
    current degree < 3 with its edges; the output is the per-round
    (nodes, edges) survivor curve — the onion layering used to find the
    load-bearing core of a recommendation/link graph and the fourth
    member of the iterative-graph family (PageRank, BFS, Bellman-Ford,
    star-contraction components).

    All-integer output, so the unrolled-CTE oracle replays every sweep
    exactly; the planted-graph pytest (path + triangle at k=2) pins the
    hand-computed cascade independently of the mirrored SQL.

    Scale shape: the edge build is a per-order self-join (quadratic
    only in bounded basket size) followed by a combinable pair-count;
    each sweep is one map-side-combinable degree aggregate plus two
    node-keyed semi-joins over a monotonically SHRINKING edge list —
    nothing edge-sized is ever resident on one task, nothing reaches
    the driver, lineage is cut per round (operators/graph.py:175).
    """
    from pipeline_query_engine_demo_spark.operators.graph import kcore_peel

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )
    return kcore_peel(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS).orderBy(
        "peel_round"
    )


# --------------------------------------------------------------------------
# Label propagation communities — graph family
# --------------------------------------------------------------------------

#: Synchronous LPA rounds. Communities on the repeat co-purchase graph
#: stabilize within a few sweeps; the round count is part of the exact
#: semantics (both engines replay the same fixed number).
_LPA_ROUNDS = 4


def _lpa_iter_sql(i: int) -> str:
    """One synchronous label sweep as a DuckDB CTE: each node adopts
    its neighbors' most frequent label, smallest label on ties —
    the argmax spelled as a window over the grouped counts."""
    return f"""
        l{i} AS MATERIALIZED (
            SELECT src AS node, lbl FROM (
                SELECT e.src, l.lbl, COUNT(*) AS c,
                       ROW_NUMBER() OVER (PARTITION BY e.src
                                          ORDER BY COUNT(*) DESC, l.lbl)
                           AS rn
                FROM e0 e JOIN l{i - 1} l ON l.node = e.dst
                GROUP BY e.src, l.lbl) q
            WHERE rn = 1)"""


@query(
    "label_propagation_communities",
    category="graph",
    oracle="""
        WITH d AS MATERIALIZED (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.l_partkey AS src, b.l_partkey AS dst
            FROM d a JOIN d b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey <> b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        l0 AS MATERIALIZED (
            SELECT src AS node, src AS lbl FROM e0 GROUP BY src),
    """
    + ",".join(_lpa_iter_sql(i) for i in range(1, _LPA_ROUNDS + 1))
    + f"""
        SELECT CAST(lbl AS BIGINT) AS community,
               CAST(COUNT(*) AS BIGINT) AS n_members
        FROM l{_LPA_ROUNDS}
        GROUP BY lbl
        ORDER BY n_members DESC, community
    """,
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al., 2007; deterministic min-tie variant) on the repeat
    co-purchase graph — the COMMUNITY view of the same graph whose
    components, core layers, triangles, and shortest paths the
    neighboring queries expose: near-linear-time community structure
    for item/domain grouping without a modularity solver. Output is
    the community-size table after 4 sweeps.

    Determinism: labels are node ids (integers), the per-node argmax
    orders by (count DESC, label ASC) — a total order, so every sweep
    is exact in both engines; the pytest replays the sweeps in literal
    python dicts and also checks a planted two-clique graph splits
    into exactly its cliques.

    Scale shape: per sweep, one edge⋈label join + combinable label
    count + a node-partitioned argmax window bounded by node degree
    (operators/graph.py:219). Label state is node-sized; the sweep
    count is a fixed constant.
    """
    from pipeline_query_engine_demo_spark.operators.graph import (
        label_propagation,
    )

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )
    labels = label_propagation(edges, iterations=_LPA_ROUNDS)
    return (
        labels.groupBy(F.col("lbl").cast("bigint").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
    )


@query(
    "mann_kendall_trend",
    category="aggregation",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   SUM(CAST({sql_round_half_up('value', 9)}
                       AS DECIMAL(28,12))) AS ds
            FROM events GROUP BY 1, 2),
        pairs AS (
            SELECT a.event_type,
                   CAST(SUM(CAST(sign(b.ds - a.ds) AS BIGINT)) AS BIGINT)
                       AS s_stat
            FROM daily a JOIN daily b
              ON b.event_type = a.event_type AND a.day < b.day
            GROUP BY 1),
        tg AS (
            SELECT event_type, ds, CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY 1, 2),
        ties AS (
            SELECT event_type,
                   CAST(SUM(t) AS BIGINT) AS n_days,
                   CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie
            FROM tg GROUP BY 1),
        j AS (
            SELECT t.event_type, t.n_days, p.s_stat,
                   CAST(t.n_days * (t.n_days - 1) * (2 * t.n_days + 5)
                        - t.tie AS DOUBLE) / 18.0 AS var_s
            FROM ties t JOIN pairs p ON p.event_type = t.event_type)
        SELECT event_type, n_days, s_stat,
               {sql_round_half_up('var_s', 6)} AS var_s,
               CASE WHEN s_stat > 0
                    THEN {sql_round_half_up(
                        'CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)', 6)}
                    WHEN s_stat < 0
                    THEN {sql_round_half_up(
                        'CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)', 6)}
                    ELSE CAST(0.0 AS DOUBLE) END AS z_stat
        FROM j
        ORDER BY event_type
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event type over the DAILY value
    series: S = Σ_{i<j} sign(x_j − x_i) with the tie-corrected
    variance Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18 and the
    continuity-corrected z — the standard non-parametric "is this
    metric drifting?" monitor (the reference has no statistics surface;
    a 100 TB pipeline needs drift gates on every daily roll-up).

    Determinism: day totals are 9-dp-rounded DECIMAL(28,12) sums
    (order-independent), so every pairwise sign() compares exact
    decimals, S and the tie term are BIGINT-exact, and the only doubles
    are one identical final expression tree per engine.

    Scale: the only corpus-sized stage is the combinable (event_type,
    day) aggregation; the pairwise join is quadratic in DAYS PER TYPE
    (bounded by the calendar, ~hundreds of rows), partitioned by
    event_type — never corpus-quadratic."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.sum(
                round_half_up(F.col("value"), 9).cast("decimal(28,12)")
            ).alias("ds")
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(F.signum(F.col("b.ds") - F.col("a.ds")).cast("bigint"))
            .cast("bigint")
            .alias("s_stat")
        )
    )
    tg = daily.groupBy("event_type", "ds").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    t = F.col("t")
    ties = tg.groupBy("event_type").agg(
        F.sum(t).cast("bigint").alias("n_days"),
        F.sum(t * (t - 1) * (2 * t + 5)).cast("bigint").alias("tie"),
    )
    n = F.col("n_days")
    j = ties.join(s, "event_type").select(
        "event_type",
        "n_days",
        "s_stat",
        (
            (n * (n - 1) * (2 * n + 5) - F.col("tie")).cast("double")
            / F.lit(18.0)
        ).alias("var_s"),
    )
    sstat = F.col("s_stat")
    return j.select(
        "event_type",
        "n_days",
        "s_stat",
        round_half_up(F.col("var_s"), 6).alias("var_s"),
        F.when(
            sstat > 0,
            round_half_up(
                (sstat - 1).cast("double") / F.sqrt(F.col("var_s")), 6
            ),
        )
        .when(
            sstat < 0,
            round_half_up(
                (sstat + 1).cast("double") / F.sqrt(F.col("var_s")), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("z_stat"),
    ).orderBy("event_type")


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


def _hits_r9_sql(x: str) -> str:
    """floor(x*1e9+0.5)/1e9 — operators.graph._r9 in SQL."""
    return f"floor({x} * 1e9 + 0.5) / 1e9"


def _hits_half_sql(i: int, score_tbl: str, join_key: str, group_key: str) -> str:
    """One HITS half-sweep as two MATERIALIZED CTEs: raw{i} sums the
    9-dp-rounded partner scores as DECIMAL(28,12); nrm{i} max-normalizes.
    MATERIALIZED is load-bearing: DuckDB inlines plain CTEs and a
    2-iteration unroll re-expands each level multiply (see the k-core /
    LPA oracles)."""
    return f"""
        raw{i} AS MATERIALIZED (
            SELECT e.{group_key} AS node,
                   SUM(CAST({_hits_r9_sql('s.score')} AS DECIMAL(28,12)))
                       AS raw
            FROM e JOIN {score_tbl} s ON s.node = e.{join_key}
            GROUP BY e.{group_key}),
        nrm{i} AS MATERIALIZED (
            SELECT node,
                   {_hits_r9_sql(
                       'CAST(raw AS DOUBLE) / CAST(mx AS DOUBLE)')} AS score
            FROM raw{i} CROSS JOIN
                 (SELECT MAX(raw) AS mx FROM raw{i}) m)"""


@query(
    "hits_hubs_authorities",
    category="graph",
    oracle="""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT o.o_custkey AS src, l.l_partkey AS dst
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        h0 AS MATERIALIZED (
            SELECT DISTINCT src AS node, CAST(1.0 AS DOUBLE) AS score
            FROM e),
    """
    + _hits_half_sql(1, "h0", "src", "dst")
    + ","
    + _hits_half_sql(2, "nrm1", "dst", "src")
    + ","
    + _hits_half_sql(3, "nrm2", "src", "dst")
    + ","
    + _hits_half_sql(4, "nrm3", "dst", "src")
    + """,
        th AS (SELECT 'hub' AS role, CAST(node AS BIGINT) AS node, score
               FROM nrm4 ORDER BY score DESC, node LIMIT 25),
        ta AS (SELECT 'authority' AS role, CAST(node AS BIGINT) AS node,
                      score
               FROM nrm3 ORDER BY score DESC, node LIMIT 25)
        SELECT * FROM (SELECT * FROM ta UNION ALL SELECT * FROM th)
        ORDER BY role, score DESC, node
    """,
)
def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) over the bipartite customer→part purchase
    graph: hub customers are those who buy authoritative parts,
    authoritative parts are those bought by hub customers — the
    mutual-reinforcement ranking used for curating seed lists (good
    crawl sources ↔ good documents) that PageRank's single-score view
    can't express. Two full sweeps, max-norm variant; top 25 of each
    role.

    Determinism: every accumulation is a DECIMAL(28,12) sum of
    9-dp-rounded terms and each normalization is one shared IEEE
    division then a 9-dp round, so the oracle's unrolled MATERIALIZED
    CTE chain replays the iteration bit-for-bit (operators.graph
    docstring; the same recipe as pagerank_copurchase).

    Scale shape: per half-sweep one edge⋈score shuffle join + one
    combinable groupBy; score state is node-sized, the normalizing max
    is a broadcast 1-row cross join, lineage is localCheckpoint-cut per
    round. Top-k is per-branch TakeOrderedAndProject — no global
    sort."""
    from pipeline_query_engine_demo_spark.operators.graph import hits_bipartite

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst")
        )
        .distinct()
    )
    hubs, auths = hits_bipartite(edges, iterations=2)
    top_h = (
        hubs.select(
            F.lit("hub").alias("role"),
            F.col("node").cast("bigint").alias("node"),
            "score",
        )
        .orderBy(F.desc("score"), "node")
        .limit(25)
    )
    top_a = (
        auths.select(
            F.lit("authority").alias("role"),
            F.col("node").cast("bigint").alias("node"),
            "score",
        )
        .orderBy(F.desc("score"), "node")
        .limit(25)
    )
    return top_a.unionAll(top_h).orderBy("role", F.desc("score"), "node")


@query(
    "kaplan_meier_retention",
    category="aggregation",
    oracle=f"""
        WITH h AS (SELECT max(o_orderdate) AS hmax FROM orders),
        life AS (
            SELECT c.c_mktsegment AS seg,
                   CAST(date_diff('day', min(o.o_orderdate),
                                  max(o.o_orderdate)) AS BIGINT) AS t,
                   CASE WHEN date_diff('day', max(o.o_orderdate),
                                       h.hmax) > 90
                        THEN 1 ELSE 0 END AS churn
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            CROSS JOIN h
            GROUP BY c.c_mktsegment, o.o_custkey, h.hmax),
        grp AS (
            SELECT seg, t, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(churn) AS BIGINT) AS d
            FROM life GROUP BY 1, 2),
        tot AS (
            SELECT seg, CAST(SUM(cnt) AS BIGINT) AS n
            FROM grp GROUP BY 1),
        risk AS (
            SELECT g.seg, g.t, g.d,
                   CAST(tt.n - COALESCE(CAST(SUM(g.cnt) OVER (
                       PARTITION BY g.seg ORDER BY g.t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS BIGINT), 0) AS BIGINT) AS at_risk
            FROM grp g JOIN tot tt ON tt.seg = g.seg),
        ev AS (
            SELECT seg, t, at_risk, d,
                   CASE WHEN at_risk > d THEN CAST({sql_round_half_up(
                       "ln(CAST(at_risk - d AS DOUBLE)"
                       " / CAST(at_risk AS DOUBLE))", 9)}
                       AS DECIMAL(28,12))
                   ELSE CAST(0 AS DECIMAL(28,12)) END AS lnf,
                   CASE WHEN at_risk = d THEN 1 ELSE 0 END AS zf
            FROM risk WHERE d > 0),
        cum AS (
            SELECT seg, t, at_risk, d,
                   SUM(lnf) OVER w AS lsum,
                   SUM(zf) OVER w AS zsum
            FROM ev
            WINDOW w AS (PARTITION BY seg ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT seg AS mktsegment, t AS t_days, at_risk, d AS deaths,
               CASE WHEN zsum > 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE {sql_round_half_up("exp(CAST(lsum AS DOUBLE))", 6)}
               END AS survival
        FROM cum ORDER BY mktsegment, t_days
    """,
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer "lifetime" (days between
    first and last order) per market segment, right-censoring customers
    still active within 90 days of the dataset horizon — the standard
    retention/churn estimator (Kaplan & Meier 1958) that no plain
    GROUP BY can produce because later death times condition on the
    at-risk set of earlier ones (the reference has no survival surface;
    its executor stops at hash aggregation, src/executor/mod.rs:250-466).

    Determinism: death counts and at-risk counts are BIGINT-exact; each
    KM factor ln((n-d)/n) is one IEEE division + ln, 9-dp-rounded into
    DECIMAL(28,12), accumulated by an exact decimal window sum ordered
    by event time, and exponentiated once at the end — the established
    order-independent product recipe. A saturated event time
    (at_risk == d, survival hits exactly zero) is carried as an integer
    flag rather than ln(0) = -inf.

    Scale: one corpus-sized aggregation (per-customer min/max order
    date, combinable), then everything runs on the (segment, lifetime)
    aggregate — calendar-bounded, ~thousands of rows; the cumulative
    windows are partitioned by segment over that aggregate, never over
    fact rows; the horizon is a broadcast 1-row scalar."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    hmax = orders.agg(F.max("o_orderdate").alias("hmax"))
    life = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(
            F.min("o_orderdate").alias("f"),
            F.max("o_orderdate").alias("l"),
        )
        .crossJoin(F.broadcast(hmax))
        .select(
            "seg",
            F.datediff(F.col("l"), F.col("f")).cast("bigint").alias("t"),
            F.when(F.datediff(F.col("hmax"), F.col("l")) > 90, F.lit(1))
            .otherwise(F.lit(0))
            .alias("churn"),
        )
    )
    grp = life.groupBy("seg", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("churn").cast("bigint").alias("d"),
    )
    tot = grp.groupBy("seg").agg(F.sum("cnt").cast("bigint").alias("n"))
    w_prev = (
        Window.partitionBy("seg")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = (
        grp.withColumn(
            "cum_prev",
            F.coalesce(F.sum("cnt").over(w_prev).cast("bigint"), F.lit(0)),
        )
        .join(F.broadcast(tot), "seg")
        .select(
            "seg",
            "t",
            "d",
            (F.col("n") - F.col("cum_prev")).cast("bigint").alias("at_risk"),
        )
        .filter(F.col("d") > 0)
    )
    ar, d = F.col("at_risk"), F.col("d")
    ev = risk.select(
        "seg",
        "t",
        "at_risk",
        "d",
        F.when(
            ar > d,
            round_half_up(
                F.log((ar - d).cast("double") / ar.cast("double")), 9
            ).cast(_DEC),
        )
        .otherwise(F.lit(0).cast(_DEC))
        .alias("lnf"),
        F.when(ar == d, F.lit(1)).otherwise(F.lit(0)).alias("zf"),
    )
    w_cum = (
        Window.partitionBy("seg")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = ev.select(
        "seg",
        "t",
        "at_risk",
        "d",
        F.sum("lnf").over(w_cum).alias("lsum"),
        F.sum("zf").over(w_cum).alias("zsum"),
    )
    return cum.select(
        F.col("seg").alias("mktsegment"),
        F.col("t").alias("t_days"),
        "at_risk",
        F.col("d").alias("deaths"),
        F.when(F.col("zsum") > 0, F.lit(0.0))
        .otherwise(round_half_up(F.exp(F.col("lsum").cast("double")), 6))
        .alias("survival"),
    ).orderBy("mktsegment", "t_days")


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


@query(
    "page_hinkley_drift",
    category="aggregation",
    oracle=f"""
        WITH daily AS (
            SELECT event_type AS et, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                       AS BIGINT) AS cents
            FROM events WHERE isfinite(value) GROUP BY 1, 2),
        seq AS (
            SELECT et, day, cents,
                   CAST(row_number() OVER w AS BIGINT) AS i,
                   CAST(SUM(cents) OVER (PARTITION BY et ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS p
            FROM daily
            WINDOW w AS (PARTITION BY et ORDER BY day)),
        term AS (
            SELECT et, day, i,
                   CAST({sql_round_half_up(
                       "CAST(cents AS DOUBLE) / 100.0"
                       " - CAST(p AS DOUBLE) / (CAST(i AS DOUBLE) * 100.0)"
                       " - 25.0", 9)} AS DECIMAL(28,12)) AS tm
            FROM seq),
        walk AS (
            SELECT et, day,
                   SUM(tm) OVER w AS g
            FROM term
            WINDOW w AS (PARTITION BY et ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        ph AS (
            SELECT et, day,
                   g - LEAST(CAST(0 AS DECIMAL(38,12)),
                             MIN(g) OVER (PARTITION BY et ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)) AS ph_t
            FROM walk)
        SELECT et AS event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               {sql_round_half_up("CAST(MAX(ph_t) AS DOUBLE)", 6)}
                   AS max_ph,
               CAST(SUM(CASE WHEN ph_t > CAST(1500 AS DECIMAL(28,12))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
               MIN(CASE WHEN ph_t > CAST(1500 AS DECIMAL(28,12))
                   THEN day END) AS first_alarm_day
        FROM ph GROUP BY 1 ORDER BY 1
    """,
)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-shift detector per event type over the daily
    value series: g_t = sum_(i<=t)(x_i - mean_i - delta) with mean_i
    the RUNNING mean, PH_t = g_t - min(0, min_(j<=t) g_j), alarm when
    PH_t > lambda (delta=25 dollars drift allowance, lambda=1500
    dollars) — the classic sequential change detector whose reference
    statistic adapts with the running mean, complementing CUSUM's
    fixed-k form (Page 1954; Hinkley 1971).

    Determinism: daily cents and prefix sums are BIGINT; each term
    x_t - mean_t - delta is one identical IEEE expression, 9-dp-rounded
    into DECIMAL(28,12); the walk g, its running min, and PH are exact
    decimal arithmetic; alarms compare exact decimals against an exact
    decimal threshold. Same Lindley-style running-min identity the
    CUSUM rewrite proved out (NOTES_r6).

    Scale: the only corpus-sized stage is the combinable daily roll-up;
    all windows are partitioned by event_type over calendar-bounded
    rows."""
    from pyspark.sql import Window

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
            .alias("cents")
        )
    )
    w_ord = Window.partitionBy("et").orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    seq = daily.select(
        "et",
        "day",
        "cents",
        F.row_number().over(w_ord).cast("bigint").alias("i"),
        F.sum("cents").over(w_cum).cast("bigint").alias("p"),
    )
    tm = round_half_up(
        F.col("cents").cast("double") / F.lit(100.0)
        - F.col("p").cast("double") / (F.col("i").cast("double") * F.lit(100.0))
        - F.lit(25.0),
        9,
    ).cast(_DEC)
    walk = seq.select("et", "day", tm.alias("tm")).select(
        "et", "day", F.sum("tm").over(w_cum).alias("g")
    )
    ph_t = F.col("g") - F.least(
        F.lit(0).cast("decimal(38,12)"), F.min("g").over(w_cum)
    )
    lam = F.lit(1500).cast(_DEC)
    ph = walk.select("et", "day", ph_t.alias("ph_t"))
    return (
        ph.groupBy(F.col("et").alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            round_half_up(F.max("ph_t").cast("double"), 6).alias("max_ph"),
            F.sum(F.when(F.col("ph_t") > lam, 1).otherwise(0))
            .cast("bigint")
            .alias("n_alarms"),
            F.min(F.when(F.col("ph_t") > lam, F.col("day"))).alias(
                "first_alarm_day"
            ),
        )
        .orderBy("event_type")
    )


#: Cumulative Poisson(1) CDF thresholds P(X <= k), k = 0..6 — exact
#: double partial sums of e^-1/k!, embedded as repr() literals so both
#: engines parse the identical IEEE-754 value (weights beyond 7 have
#: probability < 1e-4 and clamp to 7).
_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
)


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
    "markov_entropy_rate",
    category="aggregation",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
            FROM events),
        trans AS (
            SELECT event_type AS src, nxt AS dst,
                   CAST(COUNT(*) AS BIGINT) AS n_ij
            FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
        outs AS (
            SELECT src, CAST(SUM(n_ij) AS BIGINT) AS n_i
            FROM trans GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_ij) AS BIGINT) AS n FROM trans),
        terms AS (
            SELECT t.src, o.n_i,
                   CAST({sql_round_half_up(
                       "-(CAST(t.n_ij AS DOUBLE) / CAST(o.n_i AS DOUBLE))"
                       " * log2(CAST(t.n_ij AS DOUBLE)"
                       " / CAST(o.n_i AS DOUBLE))", 9)}
                       AS DECIMAL(28,12)) AS h_term
            FROM trans t JOIN outs o ON o.src = t.src)
        SELECT tm.src AS event_type, tm.n_i AS n_transitions,
               {sql_round_half_up(
                   "CAST(tm.n_i AS DOUBLE) / CAST(tt.n AS DOUBLE)", 6)}
                   AS pi_share,
               {sql_round_half_up(
                   "CAST(SUM(tm.h_term) AS DOUBLE)", 6)} AS h_cond_bits,
               {sql_round_half_up(
                   "CAST(SUM(tm.h_term) AS DOUBLE)"
                   " * (CAST(tm.n_i AS DOUBLE) / CAST(tt.n AS DOUBLE))",
                   6)} AS rate_contrib_bits
        FROM terms tm CROSS JOIN tot tt
        GROUP BY tm.src, tm.n_i, tt.n
        ORDER BY event_type
    """,
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain: empirical
    transition counts n_ij from consecutive events, conditional entropy
    H_i = -sum_j p_ij log2 p_ij per source state, stationary share
    pi_i = n_i/N, and the per-state contribution pi_i * H_i whose total
    is the chain's entropy rate — "how predictable is the next event
    given this one", the sequence-level complement to the existing
    unconditional transition matrix and char-entropy queries (the
    reference has no sequence-statistics surface).

    Determinism: counts are BIGINT; each -p log2 p term is one
    identical IEEE expression 9-dp-rounded into DECIMAL(28,12) and
    summed exactly (order-independent, ~|types| terms per state); the
    final shares are single divisions.

    Scale: the lead() window is partitioned by user_id over fact rows
    (the sessionization shape already audited); everything after is
    |types|^2-sized. The 1-row grand-total crossJoin broadcasts."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    )
    trans = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ij"))
    )
    outs = trans.groupBy("src").agg(
        F.sum("n_ij").cast("bigint").alias("n_i")
    )
    tot = trans.agg(F.sum("n_ij").cast("bigint").alias("n"))
    p = F.col("n_ij").cast("double") / F.col("n_i").cast("double")
    terms = trans.join(F.broadcast(outs), "src").select(
        "src",
        "n_i",
        round_half_up(-p * F.log2(p), 9).cast(_DEC).alias("h_term"),
    )
    share = F.col("n_i").cast("double") / F.col("n").cast("double")
    return (
        terms.crossJoin(F.broadcast(tot))
        .groupBy(F.col("src").alias("event_type"), "n_i", "n")
        .agg(F.sum("h_term").alias("h_sum"))
        .select(
            "event_type",
            F.col("n_i").alias("n_transitions"),
            round_half_up(share, 6).alias("pi_share"),
            round_half_up(F.col("h_sum").cast("double"), 6).alias(
                "h_cond_bits"
            ),
            round_half_up(
                F.col("h_sum").cast("double") * share, 6
            ).alias("rate_contrib_bits"),
        )
        .orderBy("event_type")
    )


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
    cust = load_table(spark, sf_dir, "customer")
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
    m1 = pairs.join(base, F.col("seg") == F.col("s1")).select(
        "s1", "s2", "c_custkey", "cents"
    )
    m2 = pairs.join(base, F.col("seg") == F.col("s2")).select(
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
    "holt_linear_forecast",
    category="aggregation",
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT event_type AS et, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                       AS DOUBLE) / 100.0 AS x
            FROM events WHERE isfinite(value) GROUP BY 1, 2),
        seq AS (
            SELECT et, x,
                   CAST(row_number() OVER (PARTITION BY et ORDER BY day)
                       AS BIGINT) AS rn
            FROM daily),
        nn AS (SELECT et, CAST(MAX(rn) AS BIGINT) AS n FROM seq GROUP BY 1),
        init AS (
            SELECT et,
                   MAX(CASE WHEN rn = 1 THEN x END) AS x1,
                   MAX(CASE WHEN rn = 2 THEN x END) AS x2
            FROM seq WHERE rn <= 2 GROUP BY 1),
        hw AS (
            SELECT et, CAST(2 AS BIGINT) AS t, x2 AS l, x2 - x1 AS b,
                   CAST(0.0 AS DOUBLE) AS sse
            FROM init
            UNION ALL
            SELECT h.et, h.t + 1,
                   CAST(0.3 AS DOUBLE) * s.x
                       + CAST(0.7 AS DOUBLE) * (h.l + h.b),
                   CAST(0.1 AS DOUBLE)
                       * (CAST(0.3 AS DOUBLE) * s.x
                          + CAST(0.7 AS DOUBLE) * (h.l + h.b) - h.l)
                       + CAST(0.9 AS DOUBLE) * h.b,
                   h.sse + (s.x - (h.l + h.b)) * (s.x - (h.l + h.b))
            FROM hw h JOIN seq s ON s.et = h.et AND s.rn = h.t + 1)
        SELECT h.et AS event_type, n.n AS n_days,
               {sql_round_half_up("h.l", 6)} AS level,
               {sql_round_half_up("h.b", 6)} AS trend,
               {sql_round_half_up(
                   "h.l + CAST(7.0 AS DOUBLE) * h.b", 6)} AS forecast_7d,
               {sql_round_half_up(
                   "sqrt(h.sse / CAST(n.n - 2 AS DOUBLE))", 6)} AS rmse
        FROM hw h JOIN nn n ON n.et = h.et AND h.t = n.n
        ORDER BY event_type
    """,
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential (level+trend) smoothing of each event
    type's daily value series (alpha=0.3, beta=0.1, init l_2 = x_2,
    b_2 = x_2 - x_1), reporting the final state, the 7-day-ahead
    forecast l + 7b, and the one-step-ahead RMSE — the trend-aware
    forecaster the seasonal-naive backtest can't provide (the
    reference has no forecasting surface).

    Determinism: the recursion is ORDER-DEPENDENT, so both engines run
    it in the same literal order: Spark folds the calendar-sorted
    per-type array with F.aggregate (sequential JVM expression,
    left-to-right), DuckDB replays the identical expression tree one
    recursion level per day via a recursive CTE. Smoothing constants
    appear as the SAME parsed literals on both sides (never 1-alpha
    computed vs 0.7 parsed — those differ in the last ulp), inputs are
    exact cent sums, so every intermediate double is bit-identical.

    Scale: the corpus-sized stage is the combinable daily roll-up; the
    fold runs over a calendar-bounded array per event type (collect
    after aggregation, never raw rows). Horizon-long folds at 100 TB
    stay |days|-sized regardless of corpus growth."""
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
            (
                F.sum(F.floor(v * F.lit(100.0) + F.lit(0.5)).cast("bigint"))
                .cast("double")
                / F.lit(100.0)
            ).alias("x")
        )
    )
    arrs = daily.groupBy("et").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("arr")
    )
    alpha, one_m_a = F.lit(0.3), F.lit(0.7)
    beta, one_m_b = F.lit(0.1), F.lit(0.9)

    def step(acc, e):
        l_new = alpha * e["x"] + one_m_a * (acc["l"] + acc["b"])
        return F.struct(
            (acc["i"] + F.lit(1)).alias("i"),
            F.when(acc["i"] == 0, e["x"]).otherwise(acc["x1"]).alias("x1"),
            F.when(acc["i"] == 0, acc["l"])
            .when(acc["i"] == 1, e["x"])
            .otherwise(l_new)
            .alias("l"),
            F.when(acc["i"] == 0, acc["b"])
            .when(acc["i"] == 1, e["x"] - acc["x1"])
            .otherwise(beta * (l_new - acc["l"]) + one_m_b * acc["b"])
            .alias("b"),
            F.when(
                acc["i"] >= 2,
                acc["sse"]
                + (e["x"] - (acc["l"] + acc["b"]))
                * (e["x"] - (acc["l"] + acc["b"])),
            )
            .otherwise(acc["sse"])
            .alias("sse"),
        )

    init = F.struct(
        F.lit(0).alias("i"),
        F.lit(0.0).alias("x1"),
        F.lit(0.0).alias("l"),
        F.lit(0.0).alias("b"),
        F.lit(0.0).alias("sse"),
    )
    st = arrs.select(
        "et",
        F.size("arr").cast("bigint").alias("n_days"),
        F.aggregate(F.col("arr"), init, step).alias("st"),
    )
    l, b, sse = F.col("st.l"), F.col("st.b"), F.col("st.sse")
    return st.select(
        F.col("et").alias("event_type"),
        "n_days",
        round_half_up(l, 6).alias("level"),
        round_half_up(b, 6).alias("trend"),
        round_half_up(l + F.lit(7.0) * b, 6).alias("forecast_7d"),
        round_half_up(
            F.sqrt(sse / (F.col("n_days") - 2).cast("double")), 6
        ).alias("rmse"),
    ).orderBy("event_type")


@query(
    "conformal_interval_daily",
    category="aggregation",
    oracle=f"""
        WITH daily AS (
            SELECT event_type AS et, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                       AS BIGINT) AS cents
            FROM events WHERE isfinite(value) GROUP BY 1, 2),
        seq AS (
            SELECT et, cents,
                   CAST(row_number() OVER (PARTITION BY et ORDER BY day)
                       AS BIGINT) AS rn,
                   lag(cents) OVER (PARTITION BY et ORDER BY day) AS prev
            FROM daily),
        resid AS (
            SELECT et, rn, abs(cents - prev) AS r,
                   CASE WHEN rn <= 16 THEN 1 ELSE 0 END AS is_cal
            FROM seq WHERE prev IS NOT NULL),
        cal AS (
            SELECT et, r,
                   CAST(row_number() OVER (PARTITION BY et
                       ORDER BY r, rn) AS BIGINT) AS k,
                   CAST(COUNT(*) OVER (PARTITION BY et) AS BIGINT)
                       AS n_cal
            FROM resid WHERE is_cal = 1),
        q AS (
            SELECT et, n_cal, r AS q_cents
            FROM cal
            WHERE k = LEAST((9 * (n_cal + 1) + 9) // 10, n_cal)),
        test AS (
            SELECT et, CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(CASE WHEN r <= q.q_cents THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_cov
            FROM resid JOIN q USING (et)
            WHERE is_cal = 0 GROUP BY 1, q.q_cents)
        SELECT q.et AS event_type, q.n_cal, t.n_test,
               {sql_round_half_up(
                   "CAST(q.q_cents AS DOUBLE) / 100.0", 6)} AS q_dollars,
               {sql_round_half_up(
                   "CAST(t.n_cov AS DOUBLE)"
                   " / CAST(t.n_test AS DOUBLE)", 6)} AS coverage
        FROM q JOIN test t ON t.et = q.et
        ORDER BY event_type
    """,
)
def conformal_interval_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for the one-step-naive daily
    forecast per event type: calibration residuals |x_t - x_(t-1)| from
    the first 15 transitions set the 90% quantile radius q at the
    conformal rank ceil(0.9 * (n+1)) (Vovk; Lei et al. 2018 — the
    finite-sample-valid rank, not the plug-in percentile), then the
    held-out transitions report empirical coverage — distribution-free
    uncertainty for ANY point forecaster, the companion the
    seasonal-naive backtest and Holt queries lack.

    Determinism: residuals are exact BIGINT cents, the conformal rank
    is the all-integer (9*(n+1)+9)//10 (never ceil of an IEEE product
    — the Nearest-rank trap from the quantile sketch), coverage is an
    integer ratio divided once.

    Scale: one combinable daily roll-up; ranking windows run per
    event type over calendar-bounded residual rows."""
    from pyspark.sql import Window

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
            .alias("cents")
        )
    )
    w_ord = Window.partitionBy("et").orderBy("day")
    seq = daily.select(
        "et",
        "cents",
        F.row_number().over(w_ord).cast("bigint").alias("rn"),
        F.lag("cents").over(w_ord).alias("prev"),
    )
    resid = seq.filter(F.col("prev").isNotNull()).select(
        "et",
        "rn",
        F.abs(F.col("cents") - F.col("prev")).alias("r"),
        F.when(F.col("rn") <= 16, F.lit(1)).otherwise(F.lit(0)).alias(
            "is_cal"
        ),
    )
    w_rank = Window.partitionBy("et").orderBy("r", "rn")
    w_all = Window.partitionBy("et")
    cal = resid.filter(F.col("is_cal") == 1).select(
        "et",
        "r",
        F.row_number().over(w_rank).cast("bigint").alias("k"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n_cal"),
    )
    q = cal.filter(
        F.col("k")
        == F.least(
            F.floor((F.lit(9) * (F.col("n_cal") + 1) + 9) / F.lit(10))
            .cast("bigint"),
            F.col("n_cal"),
        )
    ).select("et", "n_cal", F.col("r").alias("q_cents"))
    test = (
        resid.filter(F.col("is_cal") == 0)
        .join(F.broadcast(q), "et")
        .groupBy("et", "q_cents")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(F.when(F.col("r") <= F.col("q_cents"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_cov"),
        )
    )
    return (
        q.join(test.select("et", "n_test", "n_cov"), "et")
        .select(
            F.col("et").alias("event_type"),
            "n_cal",
            "n_test",
            round_half_up(F.col("q_cents").cast("double") / F.lit(100.0), 6)
            .alias("q_dollars"),
            round_half_up(
                F.col("n_cov").cast("double") / F.col("n_test").cast("double"),
                6,
            ).alias("coverage"),
        )
        .orderBy("event_type")
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
    li = load_table(spark, sf_dir, "lineitem")
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


#: SPRT constants for H0: p=0.18 vs H1: p=0.22, alpha=beta=0.05 —
#: pre-folded log-likelihood increments and Wald thresholds in exact
#: integer NANO units (1e-9), so the whole evidence walk is BIGINT
#: arithmetic on both engines (no runtime ln, no DECIMAL->double casts
#: — those conversions can differ by 1 ulp between engines near
#: half-way points, observed on this very query).
_SPRT_C1_N = 200670695  # ln(p1/p0) @9dp in nanos: success increment
_SPRT_C0_N = -50010421  # ln((1-p1)/(1-p0)) @9dp in nanos: failure
_SPRT_A_N = 2944438979  # ln((1-beta)/alpha) in nanos: accept H1 at/above
_SPRT_B_N = -2944438979  # ln(beta/(1-alpha)) in nanos: accept H0 at/below


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


# BH wraps the permutation oracle verbatim as a CTE so the two stay in
# lockstep; registered post-hoc because the decorator runs before the
# wrapped oracle string is addressable.
from pipeline_query_engine_demo_spark.plans.registry import (  # noqa: E402
    REGISTRY as _REG,
)
import dataclasses as _dc  # noqa: E402

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


#: Gaussian quartile breakpoint for the 4-symbol SAX alphabet —
#: Phi^-1(0.75), embedded as the same parsed literal on both engines.
_SAX_BP = "0.6744897501960817"


@query(
    "sax_symbolic_daily",
    category="aggregation",
    oracle=f"""
        WITH daily AS (
            SELECT event_type AS et, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                       AS BIGINT) AS c
            FROM events WHERE isfinite(value) GROUP BY 1, 2),
        stats AS (
            SELECT et, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS s,
                   CAST(SUM(c * c) AS BIGINT) AS ss
            FROM daily GROUP BY 1),
        z AS (
            SELECT d.et, d.day,
                   CASE WHEN st.n * st.ss - st.s * st.s <= 0 THEN 'b'
                        WHEN (CAST(d.c AS DOUBLE)
                              - CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
                             / sqrt(CAST(st.n * st.ss - st.s * st.s
                                    AS DOUBLE) / CAST(st.n * st.n
                                    AS DOUBLE))
                             < -CAST({_SAX_BP} AS DOUBLE) THEN 'a'
                        WHEN (CAST(d.c AS DOUBLE)
                              - CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
                             / sqrt(CAST(st.n * st.ss - st.s * st.s
                                    AS DOUBLE) / CAST(st.n * st.n
                                    AS DOUBLE))
                             < CAST(0.0 AS DOUBLE) THEN 'b'
                        WHEN (CAST(d.c AS DOUBLE)
                              - CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
                             / sqrt(CAST(st.n * st.ss - st.s * st.s
                                    AS DOUBLE) / CAST(st.n * st.n
                                    AS DOUBLE))
                             < CAST({_SAX_BP} AS DOUBLE) THEN 'c'
                        ELSE 'd' END AS sym
            FROM daily d JOIN stats st ON st.et = d.et),
        sax AS (
            SELECT et, string_agg(sym, '' ORDER BY day) AS sax_string
            FROM z GROUP BY 1),
        bi AS (
            SELECT et, sym || lead(sym) OVER (PARTITION BY et
                       ORDER BY day) AS motif
            FROM z),
        mc AS (
            SELECT et, motif, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM bi WHERE motif IS NOT NULL GROUP BY 1, 2),
        topm AS (
            SELECT et, motif, cnt,
                   row_number() OVER (PARTITION BY et
                       ORDER BY cnt DESC, motif) AS rn
            FROM mc)
        SELECT s.et AS event_type,
               CAST(length(s.sax_string) AS BIGINT) AS n_days,
               s.sax_string,
               t.motif AS top_motif, t.cnt AS motif_count
        FROM sax s JOIN topm t ON t.et = s.et AND t.rn = 1
        ORDER BY event_type
    """,
)
def sax_symbolic_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic aggregate approximation of each event type's daily
    value series: z-normalize per series, map each day into the
    4-symbol alphabet by the Gaussian quartile breakpoints
    (+-0.6745, 0), and report the symbol string plus the most frequent
    adjacent bigram motif — the discretization that turns numeric time
    series into text so motif mining, grep-style pattern search, and
    sequence models apply (Lin et al. 2003).

    Determinism: means/variances come from exact BIGINT cent sums; the
    z-score and both breakpoints are identical IEEE expressions
    (breakpoint embedded as the same parsed literal both sides); a
    zero-variance series degenerates to all-'b' by an integer guard,
    never a NaN comparison.

    Scale: the corpus-sized stage is the combinable daily roll-up;
    symbolization is a broadcast stats join; the string assembly and
    motif count run per event type over calendar-bounded rows."""
    from pyspark.sql import Window

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
            .alias("c")
        )
    )
    stats = daily.groupBy("et").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
    )
    bp = F.lit(float(_SAX_BP))
    nvar = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    zexpr = (
        F.col("c").cast("double")
        - F.col("s").cast("double") / F.col("n").cast("double")
    ) / F.sqrt(nvar.cast("double") / (F.col("n") * F.col("n")).cast("double"))
    sym = (
        F.when(nvar <= 0, F.lit("b"))
        .when(zexpr < -bp, F.lit("a"))
        .when(zexpr < F.lit(0.0), F.lit("b"))
        .when(zexpr < bp, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    z = daily.join(F.broadcast(stats), "et").select(
        "et", "day", sym.alias("sym")
    )
    sax = z.groupBy("et").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("day", "sym"))),
                lambda e: e["sym"],
            ),
            "",
        ).alias("sax_string")
    )
    w_ord = Window.partitionBy("et").orderBy("day")
    bi = z.select(
        "et",
        F.concat(F.col("sym"), F.lead("sym").over(w_ord)).alias("motif"),
    ).filter(F.col("motif").isNotNull())
    mc = bi.groupBy("et", "motif").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_top = Window.partitionBy("et").orderBy(F.col("cnt").desc(), "motif")
    topm = mc.select(
        "et", "motif", "cnt", F.row_number().over(w_top).alias("rn")
    ).filter(F.col("rn") == 1)
    return (
        sax.join(topm, "et")
        .select(
            F.col("et").alias("event_type"),
            F.length("sax_string").cast("bigint").alias("n_days"),
            "sax_string",
            F.col("motif").alias("top_motif"),
            F.col("cnt").alias("motif_count"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Ridge regression by closed-form normal equations (one combinable pass)
# ---------------------------------------------------------------------------

#: Ridge penalty, an INTEGER so the regularized moment matrix stays an
#: exact BIGINT before the one cast to double. Applied to every
#: coefficient including the intercept (documented simplification — the
#: point is the distributed moment assembly + in-plan solve).
_RIDGE_LAMBDA = 1000


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


#: Shared AR(1) solve fragments — executed verbatim by BOTH engines
#: (Spark F.expr / selectExpr and the DuckDB oracle) over the exact
#: BIGINT lag-pair moments, so every double op is the identical IEEE
#: expression tree and the outputs hash-match without rounding.
_AR1_PHI = "CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS phi"
_AR1_INTERCEPT = (
    "(CAST(sy AS DOUBLE) - phi * CAST(sx AS DOUBLE)) / CAST(m AS DOUBLE)"
    " AS intercept"
)
_AR1_FORECAST = "intercept + phi * CAST(x_n AS DOUBLE) AS forecast_cents"


@query(
    "ar1_forecast_daily",
    category="aggregation",
    oracle=f"""
        WITH daily AS (
            SELECT event_type AS et, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS cents
            FROM events WHERE isfinite(value) GROUP BY 1, 2),
        lagged AS (
            SELECT et, cents,
                   lag(cents) OVER (PARTITION BY et ORDER BY day) AS prev
            FROM daily),
        moments AS (
            SELECT et,
                   CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(prev) AS BIGINT) AS sx,
                   CAST(SUM(cents) AS BIGINT) AS sy,
                   CAST(SUM(prev * prev) AS BIGINT) AS sxx,
                   CAST(SUM(prev * cents) AS BIGINT) AS sxy
            FROM lagged WHERE prev IS NOT NULL GROUP BY 1),
        lasts AS (
            SELECT et, CAST(arg_max(cents, day) AS BIGINT) AS x_n
            FROM daily GROUP BY 1),
        nd AS (
            SELECT mo.et, mo.m, mo.sx, mo.sy, la.x_n,
                   CAST(mo.m * mo.sxy - mo.sx * mo.sy AS BIGINT) AS num,
                   CAST(mo.m * mo.sxx - mo.sx * mo.sx AS BIGINT) AS den
            FROM moments mo JOIN lasts la ON mo.et = la.et),
        p AS (SELECT et, m, sx, sy, x_n, {_AR1_PHI} FROM nd),
        i AS (SELECT et, m, x_n, phi, {_AR1_INTERCEPT} FROM p)
        SELECT et AS event_type, m AS n_pairs, phi, intercept,
               {_AR1_FORECAST}
        FROM i ORDER BY event_type
    """,
)
def ar1_forecast_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) one-step forecast per event type over the daily cent
    series: OLS of x_t on x_{{t-1}} in closed form — phi and intercept
    from five exact-integer lag-pair moments (the cross-multiplied
    slope (m·Σxy − Σx·Σy)/(m·Σxx − Σx²) stays BIGINT until one double
    division), then forecast = intercept + phi·x_n. Completes the
    forecasting family (seasonal-naive, Holt, Theil-Sen) with the
    autoregressive member; acf_daily_event_values measures the
    correlation this model fits.

    Scale: the fact table reduces to day-grain per type (combinable),
    the lag window is partitioned by event_type over day-grain rows,
    and the moments reduce to one constant-width row per type — no
    corpus-sized shuffle after the first aggregate."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").cast("double").isNotNull()
        & ~F.isnan(F.col("value"))
        & ~F.col("value").isin(float("inf"), float("-inf"))
    )
    daily = ev.groupBy(
        F.col("event_type").alias("et"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("et").orderBy("day")
    lagged = daily.withColumn("prev", F.lag("cents").over(w)).filter(
        F.col("prev").isNotNull()
    )
    moments = lagged.groupBy("et").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("prev").cast("bigint").alias("sx"),
        F.sum("cents").cast("bigint").alias("sy"),
        F.sum(F.col("prev") * F.col("prev")).cast("bigint").alias("sxx"),
        F.sum(F.col("prev") * F.col("cents")).cast("bigint").alias("sxy"),
    )
    lasts = daily.groupBy("et").agg(
        F.max_by("cents", "day").cast("bigint").alias("x_n")
    )
    nd = moments.join(lasts, "et").select(
        "et",
        "m",
        "sx",
        "sy",
        "x_n",
        (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("bigint")
        .alias("num"),
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("bigint")
        .alias("den"),
    )
    p = nd.selectExpr("et", "m", "sx", "sy", "x_n", _AR1_PHI)
    i = p.selectExpr("et", "m", "x_n", "phi", _AR1_INTERCEPT)
    return i.selectExpr(
        "et AS event_type", "m AS n_pairs", "phi", "intercept", _AR1_FORECAST
    ).orderBy("event_type")


#: Hub cap for Adamic-Adar wedge enumeration: common neighbors of
#: degree > 30 carry ~no signal (1/ln(d) is flat and tiny) but dominate
#: wedge cost quadratically — the standard production cut, owned like
#: the LSH hot-bucket cap.
_AA_HUB_CAP = 30
_AA_TERM = sql_round_half_up("1.0 / ln(CAST(dw AS DOUBLE))", 9)


@query(
    "link_prediction_adamic_adar",
    category="graph",
    oracle=f"""
        WITH edges AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        sym AS (SELECT u AS a, v AS b FROM edges
                UNION ALL SELECT v, u FROM edges),
        deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS d
                FROM sym GROUP BY 1),
        wedge AS (
            SELECT e1.b AS u, e2.b AS v, e1.a AS w, dg.d AS dw
            FROM sym e1
            JOIN sym e2 ON e2.a = e1.a AND e1.b < e2.b
            JOIN deg dg ON dg.node = e1.a
            WHERE dg.d <= {_AA_HUB_CAP}),
        cand AS (
            SELECT w.u, w.v,
                   CAST(COUNT(*) AS BIGINT) AS common_neighbors,
                   SUM(CAST({_AA_TERM} AS DECIMAL(28,12))) AS aa_dec
            FROM wedge w
            WHERE NOT EXISTS (SELECT 1 FROM edges e
                              WHERE e.u = w.u AND e.v = w.v)
            GROUP BY 1, 2)
        SELECT u, v, common_neighbors,
               {sql_round_half_up("CAST(aa_dec AS DOUBLE)", 6)} AS aa_score
        FROM cand
        ORDER BY aa_score DESC, u, v LIMIT 50
    """,
)
def link_prediction_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the part co-purchase graph: for part pairs
    NOT yet co-purchased, the common-neighbor count and Adamic-Adar
    score Σ_w 1/ln(deg w) over shared neighbors — the classic
    recommender/graph-completion scorer beside the structural suite
    (PageRank, triangles, communities). Top 50 candidate edges.

    Determinism: each 1/ln(deg) term is 9-dp-rounded into
    DECIMAL(28,12) before the order-independent sum (deg ≥ 2 for any
    wedge center, so ln > 0); the final cast is round6 display. The
    candidate set is bounded by the _AA_HUB_CAP wedge cut (fan-out
    ≤ cap² per center; hubs add negligible score by construction) —
    the same owned-recall trade as the LSH hot-bucket cap. Global
    top-50 is orderBy+limit = TakeOrderedAndProject, no single-reducer
    sort."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).select(F.col("u").alias("a"), F.col("v").alias("b"))
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    e1 = sym.select(F.col("a").alias("w"), F.col("b").alias("u"))
    e2 = sym.select(F.col("a").alias("w"), F.col("b").alias("v"))
    wedge = (
        e1.join(e2, "w")
        .filter(F.col("u") < F.col("v"))
        .join(
            deg.filter(F.col("d") <= _AA_HUB_CAP).withColumnRenamed("node", "w"),
            "w",
        )
    )
    cand = (
        wedge.join(edges, ["u", "v"], "left_anti")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
            F.sum(
                round_half_up(1.0 / F.log(F.col("d").cast("double")), 9).cast(
                    "decimal(28,12)"
                )
            ).alias("aa_dec"),
        )
    )
    return (
        cand.select(
            "u",
            "v",
            "common_neighbors",
            round_half_up(F.col("aa_dec").cast("double"), 6).alias("aa_score"),
        )
        .orderBy(F.col("aa_score").desc(), "u", "v")
        .limit(50)
    )


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
    "nelson_aalen_hazard",
    category="aggregation",
    oracle=f"""
        WITH h AS (SELECT max(o_orderdate) AS hmax FROM orders),
        life AS (
            SELECT c.c_mktsegment AS seg,
                   CAST(date_diff('day', min(o.o_orderdate),
                                  max(o.o_orderdate)) AS BIGINT) AS t,
                   CASE WHEN date_diff('day', max(o.o_orderdate),
                                       h.hmax) > 90
                        THEN 1 ELSE 0 END AS churn
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            CROSS JOIN h
            GROUP BY c.c_mktsegment, o.o_custkey, h.hmax),
        grp AS (
            SELECT seg, t, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(churn) AS BIGINT) AS d
            FROM life GROUP BY 1, 2),
        tot AS (
            SELECT seg, CAST(SUM(cnt) AS BIGINT) AS n
            FROM grp GROUP BY 1),
        risk AS (
            SELECT g.seg, g.t, g.d,
                   CAST(tt.n - COALESCE(CAST(SUM(g.cnt) OVER (
                       PARTITION BY g.seg ORDER BY g.t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS BIGINT), 0) AS BIGINT) AS at_risk
            FROM grp g JOIN tot tt ON tt.seg = g.seg),
        ev AS (
            SELECT seg, t, at_risk, d,
                   CAST({sql_round_half_up(
                       "CAST(d AS DOUBLE) / CAST(at_risk AS DOUBLE)", 9)}
                       AS DECIMAL(28,12)) AS hz
            FROM risk WHERE d > 0),
        cum AS (
            SELECT seg, t, at_risk, d,
                   SUM(hz) OVER (PARTITION BY seg ORDER BY t
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS hsum
            FROM ev)
        SELECT seg AS mktsegment, t AS t_days, at_risk, d AS deaths,
               {sql_round_half_up("CAST(hsum AS DOUBLE)", 6)} AS cum_hazard
        FROM cum ORDER BY mktsegment, t_days
    """,
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard H(t) = Σ d_i/n_i over the same
    churn lifetimes as kaplan_meier_retention — the estimator
    survival analysis reaches for when the HAZARD (instantaneous churn
    pressure) is the question rather than the survival probability
    (and the one that needs no exp/ln at all: each step is a single
    IEEE division, 9-dp-rounded into DECIMAL, summed exactly in event-
    time order). KM's survival ≈ exp(−H) ties the two rows together.

    Scale: identical shape to KM — one combinable per-customer
    aggregate, then segment-partitioned windows over the bounded
    (segment, lifetime) table."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    hmax = orders.agg(F.max("o_orderdate").alias("hmax"))
    life = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(F.min("o_orderdate").alias("f"), F.max("o_orderdate").alias("l"))
        .crossJoin(F.broadcast(hmax))
        .select(
            "seg",
            F.datediff(F.col("l"), F.col("f")).cast("bigint").alias("t"),
            F.when(F.datediff(F.col("hmax"), F.col("l")) > 90, F.lit(1))
            .otherwise(F.lit(0))
            .alias("churn"),
        )
    )
    grp = life.groupBy("seg", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("churn").cast("bigint").alias("d"),
    )
    tot = grp.groupBy("seg").agg(F.sum("cnt").cast("bigint").alias("n"))
    w_prev = (
        Window.partitionBy("seg")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = (
        grp.withColumn(
            "cum_prev",
            F.coalesce(F.sum("cnt").over(w_prev).cast("bigint"), F.lit(0)),
        )
        .join(F.broadcast(tot), "seg")
        .select(
            "seg",
            "t",
            "d",
            (F.col("n") - F.col("cum_prev")).cast("bigint").alias("at_risk"),
        )
        .filter(F.col("d") > 0)
    )
    ev = risk.select(
        "seg",
        "t",
        "at_risk",
        "d",
        round_half_up(
            F.col("d").cast("double") / F.col("at_risk").cast("double"), 9
        )
        .cast(_DEC)
        .alias("hz"),
    )
    w_cum = (
        Window.partitionBy("seg")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        F.col("seg").alias("mktsegment"),
        F.col("t").alias("t_days"),
        "at_risk",
        F.col("d").alias("deaths"),
        round_half_up(F.sum("hz").over(w_cum).cast("double"), 6).alias(
            "cum_hazard"
        ),
    ).orderBy("mktsegment", "t_days")


#: Number of seed parts for the two-step walk (smallest part ids with
#: any co-purchase edge — deterministic, data-derived).
_WALK_SEEDS = 5


@query(
    "two_step_transition_probs",
    category="graph",
    oracle=f"""
        WITH edges AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        sym AS (SELECT u AS a, v AS b FROM edges
                UNION ALL SELECT v, u FROM edges),
        deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS d
                FROM sym GROUP BY 1),
        seeds AS (SELECT node AS s FROM deg ORDER BY node
                  LIMIT {_WALK_SEEDS}),
        hop AS (
            SELECT se.s, e1.b AS w, e2.b AS v, du.d AS d_u, dw.d AS d_w
            FROM seeds se
            JOIN sym e1 ON e1.a = se.s
            JOIN sym e2 ON e2.a = e1.b
            JOIN deg du ON du.node = se.s
            JOIN deg dw ON dw.node = e1.b),
        terms AS (
            SELECT s, v,
                   CAST({sql_round_half_up(
                       "1.0 / (CAST(d_u AS DOUBLE) * CAST(d_w AS DOUBLE))",
                       9)} AS DECIMAL(28,12)) AS t
            FROM hop)
        SELECT s AS seed, v AS target,
               CAST(COUNT(*) AS BIGINT) AS n_paths,
               {sql_round_half_up("CAST(SUM(t) AS DOUBLE)", 6)} AS p2
        FROM terms GROUP BY 1, 2
        ORDER BY seed, p2 DESC, target
    """,
)
def two_step_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step random-walk transition probabilities P²(seed→target) on
    the part co-purchase graph — one matrix-power step of the walk that
    underlies PageRank/node2vec-style neighborhoods, computed as joins:
    P²(u,v) = Σ_w 1/(d_u·d_w) over paths u→w→v. Each path term is one
    IEEE reciprocal 9-dp-rounded into DECIMAL(28,12), so the sum is
    order-independent; per seed the probabilities total ≤ 1 exactly
    when every w's successors are counted (they are — self-returns
    included, as the walk defines).

    Scale: the seed set bounds the first hop (the full P² is never
    materialized); hop fan-out is Σ_{{w∼seed}} d_w, the frontier shape
    every distributed walk/BFS here uses. Degrees join broadcast-small
    tables."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).select(F.col("u").alias("a"), F.col("v").alias("b"))
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    seeds = deg.select(F.col("node").alias("s")).orderBy("s").limit(_WALK_SEEDS)
    e1 = sym.select(F.col("a").alias("s"), F.col("b").alias("w"))
    e2 = sym.select(F.col("a").alias("w"), F.col("b").alias("v"))
    hop = (
        F.broadcast(seeds)
        .join(e1, "s")
        .join(e2, "w")
        .join(F.broadcast(deg.withColumnsRenamed({"node": "s", "d": "d_u"})), "s")
        .join(F.broadcast(deg.withColumnsRenamed({"node": "w", "d": "d_w"})), "w")
    )
    terms = hop.select(
        "s",
        "v",
        round_half_up(
            1.0 / (F.col("d_u").cast("double") * F.col("d_w").cast("double")), 9
        )
        .cast(_DEC)
        .alias("t"),
    )
    return (
        terms.groupBy("s", "v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_paths"),
            round_half_up(F.sum("t").cast("double"), 6).alias("p2"),
        )
        .select(
            F.col("s").alias("seed"),
            F.col("v").alias("target"),
            "n_paths",
            "p2",
        )
        .orderBy("seed", F.col("p2").desc(), "target")
    )


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


#: One-pass K-fold ridge CV shared fragments — executed VERBATIM by both
#: engines (Spark selectExpr/F.expr and the DuckDB oracle). The held-out
#: fold's training moments are the TOTALS minus the fold's own moments —
#: pure BIGINT subtraction — so the 3x3 Cramer solve reuses _RIDGE_DET*
#: over the same a11..b3 aliases and every double op is the identical
#: IEEE tree in both engines.
_RIDGE_CV_FOLDS = 4
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
