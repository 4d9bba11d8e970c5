"""Extended TPC-H-shaped decision-support pack (SURVEY.md §2.1 depth).

The reference executes one hand-wired filter-join-limit pipeline
(``src/main.rs:29-48``); q1/q3/q5/q6 in plans/relational.py already map
its operator surface onto the classic TPC-H shapes. This module widens
that to the rest of the TPC-H suite expressible over the fixture schema
(TESTDATA.md: no ``partsupp``; lineitem lacks commit/receipt dates and
ship modes), adapting the handful of predicates that reference missing
columns while keeping each query's *plan shape* — correlated EXISTS,
decorrelated correlated-aggregate subqueries, disjunctive join predicates,
group-by-having semi-joins, null-aware NOT IN, scalar subqueries against
a derived view — which is what exercises the optimizer.

Scale notes (100 TB lens) carried in each docstring: dims broadcast,
facts shuffle once on their join key, correlated subqueries are written
in their decorrelated join form so Catalyst never re-executes a subquery
per row.

Determinism contract (plans.registry): DECIMAL casts before money sums,
identical aliases both sides, orderBy before every limit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pipeline_query_engine_demo_spark.plans.registry import query
from pipeline_query_engine_demo_spark.sources.catalog import load_table


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def _disc_price() -> F.Column:
    """extendedprice * (1 - discount) as exact DECIMAL (sum-order-proof)."""
    return _dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)")


_DISC_PRICE_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4))"


@query(
    "q4_order_priority",
    category="join",
    oracle="""
        SELECT o.o_orderpriority AS priority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY priority
        ORDER BY priority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking). The fixture lacks
    l_commitdate/l_receiptdate, so "late" is adapted to *shipped more
    than 60 days after ordering* — same correlated-EXISTS shape.

    Spark-first: the EXISTS is a LEFT SEMI join with a mixed equi +
    non-equi condition; Catalyst hashes on the equi part (orderkey) and
    evaluates the date inequality as a residual filter, so the plan is
    one shuffle on orderkey, never a per-row subquery."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    ).alias("o")
    l = lineitem.alias("l")
    late = (F.col("o.o_orderkey") == F.col("l.l_orderkey")) & (
        F.col("l.l_shipdate") > F.col("o.o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("priority")
    )


@query(
    "q7_volume_shipping",
    category="join",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(vol) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   EXTRACT(year FROM l.l_shipdate) AS l_year,
                   {_DISC_PRICE_SQL} AS vol
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations). Six-way join
    where every non-fact table (supplier, customer, nation x2) is a
    broadcast dim; lineitem-orders is the only shuffled edge. The
    disjunctive nation-pair predicate lands *after* the nation joins so
    it prunes early on broadcast lookups, not on the fact shuffle."""
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _disc_price().alias("vol"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("vol").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    category="join",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(vol) FILTER (WHERE supp_nation = 'NATION_3') AS DOUBLE)
                 / CAST(SUM(vol) AS DOUBLE) AS mkt_share
        FROM (
            SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
                   {_DISC_PRICE_SQL} AS vol,
                   n1.n_name AS supp_nation
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            JOIN region r ON n2.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        )
        GROUP BY o_year
        ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the share of ASIA-region PROMO
    part revenue supplied by NATION_3, per year. Numerator is a
    conditional sum over the same rows as the denominator — one pass,
    no self-join. All dims broadcast; division happens after both
    DECIMAL sums are cast to double (identical bits both engines)."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey"))
    return (
        lineitem.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")), F.col("n2_rkey") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("vol"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol"))).cast("double")
                / F.sum("vol").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    category="join",
    oracle=f"""
        SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        FROM (
            SELECT n.n_name AS nation,
                   EXTRACT(year FROM o.o_orderdate) AS o_year,
                   {_DISC_PRICE_SQL} AS amount
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE p.p_name LIKE '%red%'
        )
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit) adapted: the fixture has no
    partsupp/ps_supplycost, so profit reduces to discounted revenue of
    parts whose name contains 'red', by supplier nation and order year.
    Keeps Q9's shape: substring-LIKE dim filter, 5-way join, two-level
    group. The LIKE prunes the broadcast part dim before the fact join,
    so only matching partkeys enter the hash table."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "q10_returned_items",
    category="join",
    oracle=f"""
        SELECT c.c_custkey AS custkey, c.c_name AS name,
               CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
               c.c_acctbal AS acctbal, n.n_name AS nation
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY custkey, name, acctbal, nation
        ORDER BY revenue DESC, custkey
        LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): top-20 customers by revenue
    lost to returns in one quarter. The returnflag filter is pushed into
    the lineitem scan; customer/nation broadcast; the top-20 runs as
    TakeOrderedAndProject over the aggregate (no global sort)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("custkey", "name", "revenue", "acctbal", "nation")
        .orderBy(F.col("revenue").desc(), F.col("custkey"))
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    category="join",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution), with the
    o_comment NOT LIKE filter (no o_comment column) adapted to an
    order-priority exclusion *inside the join condition* — the part Q13
    actually tests: a filtered LEFT JOIN must keep order-less customers
    with count 0, so the filter cannot be pushed below the join as a
    WHERE. Second-level aggregation is over ~|distinct counts| rows."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            customer.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy(customer.c_custkey)
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q14_promo_revenue",
    category="aggregation",
    oracle=f"""
        SELECT CAST(SUM({_DISC_PRICE_SQL}) FILTER (WHERE p_type = 'PROMO') AS DOUBLE)
                 AS promo_revenue,
               CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue,
               100.0 * CAST(SUM({_DISC_PRICE_SQL}) FILTER (WHERE p_type = 'PROMO') AS DOUBLE)
                 / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS promo_pct
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO-typed share of one month's
    revenue. Single broadcast join + conditional aggregation — the
    CASE/FILTER split avoids scanning lineitem twice."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _disc_price())).cast("double")
    total = F.sum(_disc_price()).cast("double")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            promo.alias("promo_revenue"),
            total.alias("total_revenue"),
            (F.lit(100.0) * promo / total).alias("promo_pct"),
        )
    )


@query(
    "q15_top_supplier",
    category="join",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_revenue AS total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) whose quarterly revenue
    equals the global max — a scalar subquery against a derived view.
    Spark-first decorrelation: compute the revenue view once, take its
    1-row max aggregate, broadcast-cross-join it back, and filter on
    equality. Revenues are exact DECIMAL sums cast to double, so the
    max-equality compares identical bit patterns in both engines."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).cast("double").alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        supplier.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            "total_revenue",
        )
        .orderBy("suppkey")
    )


@query(
    "q16_supplier_part_counts",
    category="join",
    oracle="""
        SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        GROUP BY brand, type, size
        ORDER BY supplier_cnt DESC, brand, type, size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) adapted: the fixture has
    no partsupp, so the part-supplier relation is derived from lineitem;
    the "complaints" comment filter becomes a negative-balance supplier
    exclusion. Keeps Q16's two tested shapes: COUNT(DISTINCT) over a
    joined relation and a NOT IN anti-join (s_suppkey is non-null, so
    NOT IN == left_anti). The excluded-supplier set is tiny →
    broadcast anti-join, no extra shuffle."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    bad = supplier.filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    sizes = [1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50]
    return (
        lineitem.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(
                part.filter((F.col("p_brand") != "Brand#1") & F.col("p_size").isin(sizes))
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "brand", "type", "size")
    )


@query(
    "q17_small_qty_revenue",
    category="join",
    oracle="""
        WITH t AS (
            SELECT l_partkey AS t_partkey,
                   0.2 * (CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*)) AS qty_threshold
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                 AS avg_yearly,
               COUNT(*) AS n_lines
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN t ON t.t_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.qty_threshold
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines whose quantity is
    below 20% of the part's average. The correlated AVG subquery is
    decorrelated into a per-part aggregate joined back on partkey — at
    100 TB this is one extra partial-agg shuffle instead of a per-row
    subquery. Quantities are integer-valued doubles, so SUM/COUNT is
    exact in any order and the 0.2*avg threshold is bit-identical in
    both engines."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    thresholds = lineitem.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum("l_quantity").cast("double") / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#1")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(thresholds, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q18_large_volume_customers",
    category="join",
    oracle="""
        SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
               o.o_orderdate AS orderdate, o.o_totalprice AS totalprice,
               CAST(SUM(l.l_quantity) AS DOUBLE) AS sum_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        GROUP BY name, custkey, orderkey, orderdate, totalprice
        ORDER BY totalprice DESC, orderkey
        LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 250 (the 99th percentile of this fixture). The IN subquery
    is a groupBy-HAVING producing a key set, applied as a LEFT SEMI
    join — at scale the qualifying set is small and AQE converts the
    semi join to broadcast at runtime."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .orderBy(F.col("totalprice").desc(), F.col("orderkey"))
        .limit(100)
    )


@query(
    "q19_disjunctive_revenue",
    category="join",
    oracle=f"""
        SELECT CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 21)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates) adapted to
    fixture columns (brand/size/quantity instead of container/shipmode).
    The OR-of-ANDs spans both join sides, so it can only be evaluated
    after the join — but Catalyst still derives and pushes the
    per-side implied filters (brand IN (...), quantity BETWEEN 1 AND 40)
    below the join; the part side stays a pruned broadcast."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q21_suppliers_kept_waiting",
    category="join",
    oracle="""
        SELECT s.s_name AS name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY name
        ORDER BY numwait DESC, name
        LIMIT 25
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) adapted: "late"
    means shipped >90 days after the order date (no receipt/commit
    dates in fixture). Keeps the signature EXISTS + NOT EXISTS pair
    against the same fact table: the supplier must be late on a
    multi-supplier finalized order, and no co-supplier shipped after
    it. Both subqueries become one-shuffle semi/anti joins hashed on
    orderkey with the suppkey/date inequalities as residuals."""
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    l1 = lineitem.alias("l1")
    l2 = lineitem.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    late = (
        l1.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l1.l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l1.l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l1.l_orderkey", "l1.l_suppkey", "l1.l_shipdate")
        .alias("l1")
    )
    multi = late.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    ).alias("l1")
    last = multi.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        last.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("name"))
        .limit(25)
    )


@query(
    "q22_dormant_customers",
    category="join",
    oracle="""
        WITH avg_bal AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                     AS threshold
            FROM customer
            WHERE c_acctbal > 0.0 AND c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
        )
        SELECT c.c_nationkey AS nationkey, COUNT(*) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer c, avg_bal
        WHERE c.c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
          AND c.c_acctbal > avg_bal.threshold
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY nationkey
        ORDER BY nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity) adapted: country-code
    substrings of c_phone become nationkey membership, and "never
    ordered" becomes "no order since 2000-01-01" (every fixture
    customer has some order). Keeps Q22's plan shapes: scalar AVG
    subquery broadcast to every row + NOT EXISTS anti-join. The anti
    join hashes on custkey with the date filter pushed into the orders
    scan."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nations = [0, 1, 2, 3, 4, 5, 6]
    pool = customer.filter(F.col("c_nationkey").isin(nations))
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("threshold")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        pool.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


@query(
    "q2_min_cost_supplier",
    category="join",
    oracle="""
        WITH pcost AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        best AS (
            SELECT l_partkey, MIN(unit_cost) AS min_cost
            FROM pcost GROUP BY l_partkey
        )
        SELECT p.p_partkey AS partkey, p.p_name AS part_name,
               s.s_name AS supplier_name, pc.unit_cost AS min_cost
        FROM part p
        JOIN pcost pc ON pc.l_partkey = p.p_partkey
        JOIN best b ON b.l_partkey = pc.l_partkey AND pc.unit_cost = b.min_cost
        JOIN supplier s ON s.s_suppkey = pc.l_suppkey
        WHERE p.p_size <= 10 AND p.p_type = 'PROMO'
        ORDER BY min_cost DESC, partkey, supplier_name
        LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) adapted: with no partsupp,
    "supply cost" is the minimum observed unit price
    (extendedprice/quantity) per (part, supplier) derived from
    lineitem. Keeps Q2's signature correlated-MIN subquery, decorrelated
    the scale-correct way: per-part minimum as a second aggregate joined
    back on (partkey, cost) equality — costs are min() over identical
    division results, so equality is bit-exact in both engines."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    pcost = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = pcost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        pcost.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(
            F.broadcast(part.filter((F.col("p_size") <= 10) & (F.col("p_type") == "PROMO"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supplier_name"),
            F.col("unit_cost").alias("min_cost"),
        )
        .orderBy(F.col("min_cost").desc(), "partkey", "supplier_name")
        .limit(100)
    )


@query(
    "q11_important_parts",
    category="aggregation",
    oracle="""
        WITH pv AS (
            SELECT l_partkey AS partkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
            FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
            WHERE s.s_nationkey IN (0, 1, 2, 3, 4)
            GROUP BY l_partkey
        )
        SELECT partkey, CAST(value_dec AS DOUBLE) AS part_value
        FROM pv
        WHERE CAST(value_dec AS DOUBLE) >
              (SELECT CAST(SUM(value_dec) AS DOUBLE) * 0.001 FROM pv)
        ORDER BY part_value DESC, partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock) adapted: part "value" is revenue
    through suppliers of a nation group (no partsupp), filtered to
    parts exceeding 0.1% of the group total — Q11's HAVING-against-
    scalar-subquery shape. The total is a 1-row aggregate of the SAME
    grouped table, broadcast back; Spark computes the CTE once per
    branch (both branches partial-agg before their shuffle). Exact
    DECIMAL sums make the threshold comparison engine-identical."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    pv = (
        lineitem.join(
            F.broadcast(supplier.filter(F.col("s_nationkey").isin([0, 1, 2, 3, 4]))),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_dec("l_extendedprice")).alias("value_dec"))
    )
    total = pv.agg((F.sum("value_dec").cast("double") * F.lit(0.001)).alias("threshold"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("threshold"))
        .select("partkey", F.col("value_dec").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "partkey")
    )


@query(
    "q20_dominant_suppliers",
    category="join",
    oracle="""
        WITH spq AS (
            SELECT l_suppkey, l_partkey, SUM(l_quantity) AS sq
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey, l_partkey
        ),
        ptot AS (SELECT l_partkey, SUM(sq) AS tq FROM spq GROUP BY l_partkey),
        qual AS (
            SELECT DISTINCT spq.l_suppkey
            FROM spq
            JOIN ptot ON spq.l_partkey = ptot.l_partkey
            JOIN part p ON p.p_partkey = spq.l_partkey
            WHERE p.p_name LIKE 'red%'
              AND CAST(sq AS DOUBLE) > 0.3 * CAST(tq AS DOUBLE)
        )
        SELECT s.s_suppkey AS suppkey, s.s_name AS name
        FROM supplier s
        WHERE s.s_nationkey < 13
          AND s.s_suppkey IN (SELECT l_suppkey FROM qual)
        ORDER BY suppkey
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) adapted: suppliers in a
    nation slice who shipped >30% of some 'red' part's 1996 volume
    (availability from partsupp becomes observed share-of-volume).
    Keeps Q20's nested semi-join chain: an aggregate-derived qualifying
    set applied with IN — planned as a left-semi join onto the tiny
    supplier dim, the aggregates partial before their shuffles."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    spq = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sq"))
    )
    ptot = spq.groupBy(F.col("l_partkey").alias("t_partkey")).agg(F.sum("sq").alias("tq"))
    qual = (
        spq.join(ptot, F.col("t_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(part.filter(F.col("p_name").like("red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(F.col("sq").cast("double") > F.lit(0.3) * F.col("tq").cast("double"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.filter(F.col("s_nationkey") < 13)
        .join(qual, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select(F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("name"))
        .orderBy("suppkey")
    )


@query(
    "q12_shipping_delay",
    category="aggregation",
    oracle="""
        SELECT CASE WHEN datediff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)) < 45
                    THEN 'fast' ELSE 'slow' END AS delay_class,
               COUNT(*) FILTER (o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
                   AS high_line_count,
               COUNT(*) FILTER (o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                   AS low_line_count
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY delay_class
        ORDER BY delay_class
    """,
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority) adapted: lineitem
    has no ship mode or commit/receipt dates, so the mode split becomes
    a ship-delay split (days from order date to ship date, <45 = fast)
    — preserving Q12's shape: fact-fact join + CASE-bucketed key +
    conditional counts per priority class.

    Scale: the 1995 shipdate predicate pushes to the lineitem scan;
    the join shuffles both sides on orderkey once (orders is a fact,
    not broadcastable at 100 TB); the two-row aggregate partial-aggs
    map-side after the join."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin(["1-URGENT", "2-HIGH"])
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.when(
                F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")) < 45,
                F.lit("fast"),
            )
            .otherwise(F.lit("slow"))
            .alias("delay_class"),
            high.alias("_high"),
        )
        .groupBy("delay_class")
        .agg(
            F.count(F.when(F.col("_high"), F.lit(1))).alias("high_line_count"),
            F.count(F.when(~F.col("_high"), F.lit(1))).alias("low_line_count"),
        )
        .orderBy("delay_class")
    )
