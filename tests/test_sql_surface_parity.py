"""Independent DataFrame-API recomputation for the SQL-surface queries
whose builder IS the same SQL text as the DuckDB oracle (the
spark.sql(...) API-coverage family). For those, the oracle gate is
tautological — both engines run one author's SQL — so tools/
audit_oracles.py requires each to carry an independent semantic test.
These tests re-derive every result through the DataFrame API (different
parser, different construction path) and assert row-for-row equality.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from pipeline_query_engine_demo_spark.plans.relational import (
    agg_filter_clause,
    group_by_all_ordinal,
    lateral_topk_per_group,
    parameterized_sql_query,
    recursive_cte_hierarchy,
    sql_scripting_block,
)
from pipeline_query_engine_demo_spark.sources.catalog import load_table


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_agg_filter_clause_matches_dataframe_api(spark, sf_dir):
    got = agg_filter_clause(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    exp = (
        li.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_all"),
            F.count(F.when(F.col("l_quantity") > 25, F.lit(1)))
            .cast("bigint")
            .alias("n_big"),
            F.sum(
                F.when(
                    F.col("l_discount") > 0.05,
                    F.col("l_extendedprice").cast("decimal(18,2)"),
                )
            )
            .cast("double")
            .alias("rev_discounted"),
        )
        .orderBy("returnflag")
    )
    assert _rows(got) == _rows(exp)


def test_group_by_all_ordinal_matches_dataframe_api(spark, sf_dir):
    got = group_by_all_ordinal(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    exp = (
        li.groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("returnflag", "linestatus")
    )
    assert _rows(got) == _rows(exp)


def test_lateral_topk_per_group_matches_window_topk(spark, sf_dir):
    got = lateral_topk_per_group(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    exp = (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .orderBy("nation", F.col("acctbal").desc(), "custkey")
    )
    assert _rows(got) == _rows(exp)


def test_parameterized_sql_matches_dataframe_filter(spark, sf_dir):
    got = parameterized_sql_query(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    exp = (
        part.filter((F.col("p_size") <= 25) & (F.col("p_type") == "PROMO"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.max("p_retailprice").cast("double").alias("max_price"),
        )
        .orderBy("brand")
    )
    assert _rows(got) == _rows(exp)


def test_recursive_cte_matches_python_fixed_point(spark, sf_dir):
    got = {r.nationkey: (r.depth, r.path) for r in
           recursive_cte_hierarchy(spark, sf_dir).collect()}
    keys = sorted(
        r.n_nationkey
        for r in load_table(spark, sf_dir, "nation").select("n_nationkey").collect()
    )
    exp: dict[int, tuple[int, str]] = {}
    if 0 in keys:
        exp[0] = (0, "0")
        frontier = {0}
        while frontier:
            nxt = {}
            for k in keys:
                if k > 0 and (k - 1) // 5 in frontier:
                    d, p = exp[(k - 1) // 5]
                    nxt[k] = (d + 1, f"{p}>{k}")
            exp.update(nxt)
            frontier = set(nxt)
    assert got == exp
    assert max(d for d, _ in exp.values()) >= 2  # recursion actually recursed


def test_sql_scripting_block_matches_dataframe_api(spark, sf_dir):
    got = sql_scripting_block(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cutoff = orders.agg((F.max("o_totalprice") * 0.5).alias("c")).collect()[0]["c"]
    exp = (
        orders.filter(F.col("o_totalprice") > cutoff)
        .groupBy(F.col("o_orderstatus").alias("orderstatus"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_big"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("orderstatus")
    )
    assert _rows(got) == _rows(exp)


def test_mirrored_oracle_audit_is_clean():
    """The auditor itself: every mirrored-oracle query must have an
    independent test (this file) or a whitelist justification."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "audit_oracles",
        os.path.join(os.path.dirname(__file__), "..", "tools", "audit_oracles.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mirrored, violations = mod.find_violations()
    assert violations == []
    # the detector itself keeps working: the six known SQL-text queries
    # must still be RECOGNIZED as mirrored (guards against the rule
    # silently rotting into a no-op)
    assert {"agg_filter_clause", "recursive_cte_hierarchy"} <= set(mirrored)


def test_group_order_by_all_matches_explicit_grouping(spark, sf_dir):
    """Independent semantic check for sql_group_order_by_all (its
    oracle deliberately runs the SAME shorthand text on both engines):
    the GROUP BY ALL result must equal the DataFrame API's explicit
    groupBy on the same columns, row for row and in ORDER BY ALL's
    lexicographic-by-output-position order."""
    import pyspark.sql.functions as F

    from pipeline_query_engine_demo_spark.plans.relational import (
        sql_group_order_by_all,
    )
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    got = [tuple(r) for r in sql_group_order_by_all(spark, sf_dir).collect()]
    li = load_table(spark, sf_dir, "lineitem")
    exp = [
        tuple(r)
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
        )
        .orderBy("l_returnflag", "l_linestatus", "n", "qty")
        .collect()
    ]
    assert got == exp


def test_exists_subquery_customers_matches_dataframe_api(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.relational import (
        exists_subquery_customers,
    )

    got = exists_subquery_customers(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    exp = (
        cust.join(open_keys, cust.c_custkey == open_keys.o_custkey, "left_semi")
        .join(fin_keys, cust.c_custkey == fin_keys.o_custkey, "left_anti")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("segment"),
        )
        .orderBy("custkey")
    )
    assert _rows(got) == _rows(exp)


def test_sql_identifier_clause_matches_dataframe_api(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.relational import (
        sql_identifier_clause,
    )

    got = sql_identifier_clause(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    exp = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("priority")
    )
    assert _rows(got) == _rows(exp)


def test_not_in_null_semantics_matches_dataframe_api(spark, sf_dir):
    """DataFrame-API recompute of all three counts: NOT EXISTS and the
    null-filtered NOT IN are a left-anti join; the nullable NOT IN must
    be exactly zero by three-valued logic (and Spark's null-aware anti
    join must agree)."""
    from pipeline_query_engine_demo_spark.plans.relational import (
        not_in_null_semantics,
    )

    got = not_in_null_semantics(spark, sf_dir).collect()[0]
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    fin_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    n_anti = cust.join(
        fin_keys, cust.c_custkey == fin_keys.o_custkey, "left_anti"
    ).count()
    assert got.n_not_in == 0  # NULL in the IN-list poisons every row
    assert got.n_not_exists == n_anti
    assert got.n_not_in_null_filtered == n_anti
    assert n_anti > 0  # the demo is only meaningful with dormant customers
