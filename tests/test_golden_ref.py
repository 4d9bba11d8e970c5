"""The reference's one and only correctness assertion, reproduced:
200 rows x 2 columns, first id 2660 (``/root/reference/src/main.rs:71-73``)."""

from __future__ import annotations

from pipeline_query_engine_demo_spark.plans.relational import ref_demo_pipeline


def test_golden_demo_result(spark, sf_dir):
    rows = ref_demo_pipeline(spark, sf_dir).collect()
    assert len(rows) == 200
    assert len(rows[0].asDict()) == 2
    assert rows[0].build_id == 2660
    assert rows[0].probe_id == 2660
    # offset 100 + limit 200 over filter >= 2560 → ids 2660..2859
    assert rows[-1].build_id == 2859


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 60
