"""Semantic tests for the round-4 extension queries: higher-moment
statistics, Spearman rank correlation, preference-pair construction,
and shingle novelty.

The registry gate already proves DuckDB parity on the fixtures; these
tests pin the *math* against numpy / constructed corpora so a
parity-preserving-but-wrong formula can't slip through on both engines
at once.
"""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from pipeline_query_engine_demo_spark.plans.stats import (
    spearman_rank_corr,
    stats_higher_moments,
)
from pipeline_query_engine_demo_spark.plans.dedup import shingle_novelty_docs
from pipeline_query_engine_demo_spark.plans.training import preference_pairs_rlhf


def test_higher_moments_match_numpy(spark, sf_dir):
    rows = stats_higher_moments(spark, sf_dir).collect()
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    by_flag = {
        r["l_returnflag"]: np.array(r["qs"], dtype=np.float64)
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.collect_list("l_quantity").alias("qs"))
        .collect()
    }
    assert rows, "no groups"
    for r in rows:
        x = by_flag[r["returnflag"]]
        m1 = x.mean()
        var_pop = ((x - m1) ** 2).mean()
        skew = ((x - m1) ** 3).mean() / var_pop**1.5
        kurt = ((x - m1) ** 4).mean() / var_pop**2 - 3.0
        assert r["n"] == len(x)
        assert math.isclose(r["mean_qty"], m1, rel_tol=0, abs_tol=5e-6)
        assert math.isclose(r["stddev_pop_qty"], math.sqrt(var_pop), abs_tol=5e-6)
        # centered-vs-raw-moment formulas agree to float error + rounding
        assert math.isclose(r["skewness_qty"], skew, abs_tol=1e-4)
        assert math.isclose(r["kurtosis_excess_qty"], kurt, abs_tol=1e-4)


def test_spearman_is_one_for_monotone_and_bounded(spark, sf_dir):
    out = {r["returnflag"]: r for r in spearman_rank_corr(spark, sf_dir).collect()}
    assert out
    for r in out.values():
        assert -1.0 <= r["spearman_qty_price"] <= 1.0
    # planted check: a strictly monotone pair has Spearman exactly 1
    df = spark.createDataFrame(
        [("Z", float(i), float(i * i)) for i in range(1, 50)],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    from pyspark.sql import Window

    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = df.select(
        F.rank().over(wq).cast("bigint").alias("rx"),
        F.rank().over(wp).cast("bigint").alias("ry"),
    )
    n = ranked.count()
    s = ranked.agg(
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    ).first()
    num = n * s["sxy"] - s["sx"] * s["sy"]
    den = math.sqrt(n * s["sxx"] - s["sx"] ** 2) * math.sqrt(
        n * s["syy"] - s["sy"] ** 2
    )
    assert math.isclose(num / den, 1.0, abs_tol=1e-12)


def test_preference_pairs_margin_and_extremes(spark, sf_dir):
    pairs = preference_pairs_rlhf(spark, sf_dir).collect()
    assert pairs, "fixture sources all have >= 2 docs"
    seen = set()
    for p in pairs:
        assert p["source"] not in seen, "one pair per group"
        seen.add(p["source"])
        assert p["chosen_doc_id"] != p["rejected_doc_id"]
        assert p["quality_margin"] >= 0.0
        assert math.isclose(
            p["quality_margin"], p["chosen_quality"] - p["rejected_quality"], abs_tol=0
        )


def test_novelty_zero_for_exact_clone_and_bounded(spark, sf_dir):
    out = shingle_novelty_docs(spark, sf_dir)
    rows = out.collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_unique"] <= r["n_shingles"]
        assert 0.0 <= r["novelty_frac"] <= 1.0
    # planted: duplicate one fixture doc under a new id via a temp dir —
    # every shingle of the clone (and its source) now has df >= 2, so
    # both get novelty 0, while a fabricated-unique doc scores 1.
    import os
    import tempfile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    first = docs.orderBy("doc_id").limit(1)
    clone = first.withColumn("doc_id", F.lit(10**9).cast("long"))
    unique = spark.createDataFrame(
        [(10**9 + 1, "qq ww ee rr tt yy uu ii oo pp", "en", "srcX", 29)],
        docs.schema,
    )
    with tempfile.TemporaryDirectory() as td:
        sf_like = os.path.join(td, "sf")
        os.makedirs(sf_like)
        docs.unionByName(clone).unionByName(unique).write.parquet(
            os.path.join(sf_like, "documents.parquet")
        )
        planted = {
            r["doc_id"]: r for r in shingle_novelty_docs(spark, sf_like).collect()
        }
    src_id = first.first()["doc_id"]
    assert planted[10**9]["novelty_frac"] == 0.0
    assert planted[src_id]["novelty_frac"] == 0.0
    assert planted[10**9 + 1]["novelty_frac"] == 1.0


def test_rouge2_identical_docs_score_one(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.training import rouge2_eval_pairs

    rows = rouge2_eval_pairs(spark, sf_dir).collect()
    assert rows, "LSH candidates exist in the fixture"
    for r in rows:
        assert 0.0 < r["rouge2_precision"] <= 1.0
        assert 0.0 < r["rouge2_recall"] <= 1.0
        p, rc = r["rouge2_precision"], r["rouge2_recall"]
        assert math.isclose(r["rouge2_f1"], 2 * p * rc / (p + rc), rel_tol=1e-12)
        # F1 is the harmonic mean: never above either component
        assert r["rouge2_f1"] <= max(p, rc) + 1e-12


def test_char_entropy_bounds_and_uniform_case(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.training import char_entropy_docs

    rows = char_entropy_docs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 0 <= H <= ln(alphabet size)
        assert -1e-9 <= r["char_entropy_nats"] <= math.log(r["n_distinct_chars"]) + 1e-9
    # planted: 'aaaa' has H=0; 'abab' has H=ln(2)
    import os
    import tempfile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = spark.createDataFrame(
        [
            (10**9, "aaaa", "en", "srcX", 4),
            (10**9 + 1, "abababab", "en", "srcX", 8),
        ],
        docs.schema,
    )
    with tempfile.TemporaryDirectory() as td:
        sf_like = os.path.join(td, "sf")
        os.makedirs(sf_like)
        planted.write.parquet(os.path.join(sf_like, "documents.parquet"))
        out = {r["doc_id"]: r for r in char_entropy_docs(spark, sf_like).collect()}
    assert math.isclose(out[10**9]["char_entropy_nats"], 0.0, abs_tol=1e-9)
    assert math.isclose(out[10**9 + 1]["char_entropy_nats"], math.log(2), abs_tol=1e-6)


def test_mad_matches_numpy_median(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.stats import mad_robust_outliers_events

    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    rows = mad_robust_outliers_events(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    by_type = {
        r["event_type"]: np.array(r["vs"], dtype=np.float64)
        for r in ev.groupBy("event_type")
        .agg(F.collect_list("value").alias("vs"))
        .collect()
    }
    assert rows
    for r in rows:
        x = by_type[r["event_type"]]
        med = np.median(x)
        mad = np.median(np.abs(x - med))
        assert r["n"] == len(x)
        assert math.isclose(r["median_value"], med, rel_tol=1e-12)
        assert math.isclose(r["mad_value"], mad, rel_tol=1e-12)
        assert r["n_outliers"] == int(np.sum(np.abs(x - med) > 3.0 * 1.4826 * mad))


def test_dsir_selection_matches_python_replay(spark, sf_dir):
    """Literal hashlib/Counter replay of the DSIR scorer: same md5
    buckets, same add-1 smoothed integer-product log ratios, same
    round9-then-sum weights — the top-20 selection and every reported
    importance must match exactly."""
    import hashlib
    import math
    from collections import Counter

    from pipeline_query_engine_demo_spark.plans.curation import (
        _DSIR_B,
        _DSIR_TARGET,
        _DSIR_TOP,
        dsir_importance_selection,
    )
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    got = dsir_importance_selection(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % _DSIR_B

    tcnt: Counter = Counter()
    rcnt: Counter = Counter()
    per_doc: dict = {}
    src_of = {}
    for r in docs:
        bs = [bucket(t) for t in r["text"].split(" ")]
        src_of[r["doc_id"]] = r["source"]
        if r["source"] == _DSIR_TARGET:
            tcnt.update(bs)
        else:
            rcnt.update(bs)
            per_doc[r["doc_id"]] = Counter(bs)
    nt, nr = sum(tcnt.values()), sum(rcnt.values())
    lr = {
        b: math.log(
            ((tcnt.get(b, 0) + 1) * (nr + _DSIR_B))
            / ((rcnt.get(b, 0) + 1) * (nt + _DSIR_B))
        )
        for b in set(tcnt) | set(rcnt)
    }

    def r9(x):
        return math.floor(x * 1e9 + 0.5) / 1e9

    weights = {
        d: sum(r9(c * lr[b]) for b, c in cnt.items())
        for d, cnt in per_doc.items()
    }
    expect = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))[:_DSIR_TOP]
    assert len(got) == _DSIR_TOP
    for row, (d, wv) in zip(got, expect):
        assert row["doc_id"] == d
        assert row["source"] == src_of[d]
        assert row["importance"] == math.floor(wv * 1e6 + 0.5) / 1e6
