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


#: CUSUM parameters in integer cents: drift allowance k and alarm
#: threshold h. Integer state keeps the whole recursion exact — no
#: float ever enters the loop.
_CUSUM_K = 15000
_CUSUM_H = 50000


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
# Label propagation communities — graph family
# --------------------------------------------------------------------------

#: Synchronous LPA rounds. Communities on the repeat co-purchase graph
#: stabilize within a few sweeps; the round count is part of the exact
#: semantics (both engines replay the same fixed number).
_LPA_ROUNDS = 4


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



# ---------------------------------------------------------------------------
# Ridge regression by closed-form normal equations (one combinable pass)
# ---------------------------------------------------------------------------

#: Ridge penalty, an INTEGER so the regularized moment matrix stays an
#: exact BIGINT before the one cast to double. Applied to every
#: coefficient including the intercept (documented simplification — the
#: point is the distributed moment assembly + in-plan solve).
_RIDGE_LAMBDA = 1000


#: Hub cap for Adamic-Adar wedge enumeration: common neighbors of
#: degree > 30 carry ~no signal (1/ln(d) is flat and tiny) but dominate
#: wedge cost quadratically — the standard production cut, owned like
#: the LSH hot-bucket cap.
_AA_HUB_CAP = 30


#: One-pass K-fold ridge CV shared fragments — executed VERBATIM by both
#: engines (Spark selectExpr/F.expr and the DuckDB oracle). The held-out
#: fold's training moments are the TOTALS minus the fold's own moments —
#: pure BIGINT subtraction — so the 3x3 Cramer solve reuses _RIDGE_DET*
#: over the same a11..b3 aliases and every double op is the identical
#: IEEE tree in both engines.
_RIDGE_CV_FOLDS = 4
